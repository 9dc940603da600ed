#!/usr/bin/env python
"""Time the three production jits (j_signer / j_group / j_lattice) separately
and composed, on real fleet-shaped inputs, to expose glue overhead.

Usage: python benchmarks/pipe_jits.py [--groups G] [--signers N] [--secpar S]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=2048)
    ap.add_argument("--signers", type=int, default=4)
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
    from fusion_cryptography_tpu.scheme import device_pipeline as dp

    G, N = args.groups, args.signers
    B = G * N
    params = ftpu.fusion_setup(args.secpar, 42)
    d = params.degree
    q = params.modulus
    rng = np.random.default_rng(0)

    vks = jnp.asarray(rng.integers(-(q // 2), q // 2 + 1, size=(G, N, 2, d)).astype(np.int32))
    aggs = jnp.asarray(rng.integers(-(q // 2), q // 2 + 1, size=(G, params.rank, d)).astype(np.int32))
    msgs = [f"group{g}:msg{i}" for g in range(G) for i in range(N)]

    # reach inside the pipeline builder for the three jits
    import fusion_cryptography_tpu.scheme.device_pipeline as dpm

    fn3, fn5 = dpm._pipeline(params, N)
    print(f"device_prehash={fn3.device_prehash}", file=sys.stderr, flush=True)
    if fn3.device_prehash:
        pre_buf, pre_len = dp.msg_preimage_words(params, msgs)
    else:
        pre_buf, pre_len = dp.prehash_digits(params, msgs)
    pre_buf = jnp.asarray(pre_buf.reshape(G, N, -1))
    pre_len = jnp.asarray(pre_len.reshape(G, N))

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
        print(f"{name:34s} {dt*1e3:9.2f} ms  ({dt/G*1e6:7.2f} us/group)",
              file=sys.stderr, flush=True)
        return out

    # grouped_verify internals: emulate by calling the closures via fn5 parts
    # (fn5 returns 5 outputs; we time the composed first, then approximate the
    # stage split by re-deriving from the module-level builder)
    def composed(vks_, pb, pl, aggs_):
        eq, *_ = fn3(vks_, pb, pl, aggs_)
        return eq

    timed("composed (one chunk)", composed, vks, pre_buf, pre_len, aggs)

    # host-prep overhead of a verify_batch_device call (prehash/msg prep)
    t0 = time.time()
    for _ in range(args.reps):
        if fn3.device_prehash:
            dp.msg_preimage_words(params, msgs)
        else:
            dp.prehash_digits(params, msgs)
    print(f"{'host msg prep per call':34s} {(time.time()-t0)/args.reps*1e3:9.2f} ms",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
