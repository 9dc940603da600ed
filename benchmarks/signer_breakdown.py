#!/usr/bin/env python
"""Sub-stage breakdown of the signer hash stage on TPU with real host-pull
syncs: challenge assembly, absorb, squeeze, decode, NTT, triple assembly.

Usage: python benchmarks/signer_breakdown.py [--batch B] [--secpar S]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--secpar", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    cache = Path(__file__).resolve().parents[1] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    import fusion_cryptography_tpu as ftpu
    from fusion_cryptography_tpu.interop import device_serial as ds
    from fusion_cryptography_tpu.ops import xof_decode
    from fusion_cryptography_tpu.ops.keccak import (
        shake256_absorb_lanes_lm,
        shake256_squeeze_lanes_lm,
    )
    from fusion_cryptography_tpu.ops.ntt import ntt_fwd_u
    from fusion_cryptography_tpu.scheme.device_pipeline import (
        _geometries,
        _pad_rate,
        prehash_digits,
    )

    B = args.batch
    params = ftpu.fusion_setup(args.secpar, 42)
    g = _geometries(params)
    d = params.degree
    F = params.plan.field
    ch_spec, tri_spec = g["ch_spec"], g["tri_spec"]
    print(
        f"B={B} ch_out_max={ch_spec.out_max} tri_out_max={tri_spec.out_max} "
        f"n_xof_used={g['n_xof_ch_used']} "
        f"absorb_blocks={_pad_rate(ch_spec.out_max)//136} "
        f"squeeze_blocks={-(-g['n_xof_ch_used']//136)}",
        file=sys.stderr, flush=True,
    )

    rng = np.random.default_rng(0)
    q = params.modulus
    vk2d_t = jnp.asarray(
        rng.integers(-(q // 2), q // 2 + 1, size=(2 * d, B)).astype(np.int32)
    )
    msgs = [f"bench:{k}" for k in range(B)]
    pb, pl_ = prehash_digits(params, msgs)
    pre_buf = jnp.asarray(pb.T)
    pre_len = jnp.asarray(pl_)

    def pull(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    def timed(name, fn, *a):
        out = fn(*a)
        pull(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            out = fn(*a)
            pull(out)
            ts.append(time.time() - t0)
        dt = min(ts)
        print(f"{name:44s} {dt*1e3:9.2f} ms  ({dt/B*1e6:7.2f} us/signer)",
              file=sys.stderr, flush=True)
        return out

    bounds = [(1, ds.PREHASH_W)]

    asm = jax.jit(
        lambda v, eb, el: ds.assemble_chunks_lm(
            ch_spec, values=v, extras=[(eb.astype(jnp.uint8), el)], extra_bounds=bounds
        )
    )
    buf, total = timed("ch assembly (lm)", asm, vk2d_t, pre_buf, pre_len)

    pad = _pad_rate(ch_spec.out_max) - buf.shape[0]

    @jax.jit
    def absorb(b, t):
        bp = jnp.pad(b, ((0, pad), (0, 0)))
        st = shake256_absorb_lanes_lm(bp, t)
        return [x for p in st for x in p]

    st = timed("ch absorb", absorb, buf, total)

    @jax.jit
    def squeeze(flat):
        lanes = tuple((flat[2 * l], flat[2 * l + 1]) for l in range(25))
        return shake256_squeeze_lanes_lm(lanes, g["n_xof_ch_used"])

    xof = timed("ch squeeze", squeeze, st)

    dec = jax.jit(lambda x: xof_decode.decode_coeffs_lm(x, g["geom_ch"]))
    cc_t = timed("ch decode", dec, xof)

    nttf = jax.jit(
        lambda c: F.to_centered(ntt_fwd_u(params.plan, F.to_unsigned(c.T))).T
    )
    ch_t = timed("ch NTT (+transposes)", nttf, cc_t)

    tasm = jax.jit(
        lambda v, eb, el: ds.assemble_chunks_lm(
            tri_spec, values=v, extras=[(eb.astype(jnp.uint8), el)], extra_bounds=bounds
        )
    )
    tvals = jnp.concatenate([vk2d_t, ch_t], axis=0)
    timed("triple assembly (lm)", tasm, tvals, pre_buf, pre_len)


if __name__ == "__main__":
    main()
