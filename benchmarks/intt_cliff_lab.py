#!/usr/bin/env python
"""Diagnose the INTT per-batch cliff (ROADMAP #3 / round-4 VERDICT #2).

Measured round 4: ntt_inv_u costs 0.64 ms at [512, 83, 256] but 8.7 ms at
[2048, 83, 256] — 3.4x worse PER ELEMENT for 4x the batch.  Hypothesis: the
radix-4 stage sweeps fuse into few kernels whose intermediates stay on-chip
at the small shape, but spill to HBM round trips above some working-set
threshold.  If true, running the big batch as lax.map over sub-batches at the
sweet spot should restore linear scaling WITHOUT extra launches.

Usage: python benchmarks/intt_cliff_lab.py
"""
import sys
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

cache_dir = Path(__file__).resolve().parents[1] / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, str(Path(__file__).resolve().parent))
from truebench import rate
from fusion_cryptography_tpu.ops.ntt import make_plan, ntt_inv_u, ntt_fwd_u

RANK, D = 83, 256


def main():
    plan = make_plan()
    rng = np.random.default_rng(7)

    def mk(B):
        return (jnp.asarray(
            rng.integers(0, plan.modulus, (B, RANK, D), dtype=np.uint32)
        ),)

    def inv(args):
        return (ntt_inv_u(plan, args[0]),)

    def fwd(args):
        return (ntt_fwd_u(plan, args[0]),)

    def inv_mapped(sub, args):
        (x,) = args
        B = x.shape[0]
        xr = x.reshape(B // sub, sub, RANK, D)
        y = jax.lax.map(lambda c: ntt_inv_u(plan, c), xr)
        return (y.reshape(B, RANK, D),)

    print(f"device={jax.devices()[0]}", flush=True)
    for B in (256, 512, 1024, 2048, 4096):
        per = rate(inv, mk(B), label=f"ntt_inv_u           [{B:5d},{RANK},{D}]")
        print(f"    -> {per / B * 1e6:8.3f} us/group", flush=True)
    for B, sub in ((2048, 512), (2048, 256), (4096, 512), (8192, 512), (8192, 1024)):
        per = rate(partial(inv_mapped, sub), mk(B),
                   label=f"ntt_inv_u lax.map/{sub:<4d} [{B:5d},{RANK},{D}]")
        print(f"    -> {per / B * 1e6:8.3f} us/group", flush=True)
    for B in (512, 2048):
        per = rate(fwd, mk(B), label=f"ntt_fwd_u           [{B:5d},{RANK},{D}]")
        print(f"    -> {per / B * 1e6:8.3f} us/group", flush=True)


if __name__ == "__main__" and "--mxu" not in sys.argv:
    main()


def mxu_main():
    from fusion_cryptography_tpu.ops.ntt_mxu_pallas import (
        ntt_inv_u_mxu_pallas, ntt_fwd_u_mxu_pallas)
    plan = make_plan()
    rng = np.random.default_rng(7)
    print(f"device={jax.devices()[0]}", flush=True)

    def mk(B):
        return (jnp.asarray(
            rng.integers(0, plan.modulus, (B, RANK, D), dtype=np.uint32)
        ),)

    for tile in (256, 512, 1024):
        def inv_mxu(args, tile=tile):
            return (ntt_inv_u_mxu_pallas(plan, args[0], tile=tile),)
        for B in (512, 2048, 8192):
            per = rate(inv_mxu, mk(B),
                       label=f"ntt_inv_u_mxu_pallas t={tile:<4d} [{B:5d},{RANK},{D}]")
            print(f"    -> {per / B * 1e6:8.3f} us/group", flush=True)


if __name__ == "__main__" and "--mxu" in sys.argv:
    mxu_main()
