#!/usr/bin/env python
"""Time the fused-pipeline pieces in isolation (round-5 launch collapse).

Usage: python benchmarks/fused_lab.py [--groups G] [--chunk C]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

cache_dir = Path(__file__).resolve().parents[1] / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import fusion_cryptography_tpu as ftpu
from fusion_cryptography_tpu.scheme import device_pipeline as dp


def log(m):
    print(f"[fused] {m}", flush=True)


def timeit(tag, fn, reps=3):
    outs = fn()
    leaf = jax.tree_util.tree_leaves(outs)[0]
    np.asarray(leaf.ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        leaf = jax.tree_util.tree_leaves(fn())[0]
        np.asarray(leaf.ravel()[:1])
        ts.append(time.time() - t0)
    log(f"{tag:44s} {min(ts)*1e3:9.1f} ms")
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=2048)
    ap.add_argument("--signers", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=512)
    args = ap.parse_args()
    G, N, chunk = args.groups, args.signers, args.chunk

    params = ftpu.fusion_setup(256, 42)
    P = dp.get_pipeline(params, N)
    rng = np.random.default_rng(5)
    q = params.modulus
    vks = jnp.asarray(rng.integers(-(q // 2), q // 2 + 1, (G, N, 2, 256),
                                   dtype=np.int64).astype(np.int32))
    aggs = jnp.asarray(rng.integers(-(q // 2), q // 2 + 1, (G, 83, 256),
                                    dtype=np.int64).astype(np.int32))
    msgs = [f"group{g}:msg{i}" for g in range(G) for i in range(N)]
    packed = jnp.asarray(P.prep_packed(msgs).reshape(G, N, -1))
    np.asarray(packed[:1, :1, :1])
    log(f"G={G} N={N} chunk={chunk} device={jax.devices()[0]}")

    t0 = time.time()
    host_packed = P.prep_packed(msgs)
    log(f"host prep_packed: {(time.time()-t0)*1e3:.1f} ms")

    timeit("fused_hash (signer map + group)",
           lambda: P.fused_hash(vks, packed, chunk))
    c_hat_full, al = P.fused_hash(vks, packed, chunk)
    timeit("lattice_at_full x nc",
           lambda: [P.lattice_at_full(vks, c_hat_full, al, aggs, lo, chunk)
                    for lo in range(0, G, chunk)])
    timeit("fused_all (one launch)",
           lambda: P.fused_all(vks, packed, aggs, chunk,
                               dp._lattice_chunk(G, chunk)))
    # old path for reference
    import os
    os.environ["FUSION_FUSED_MODE"] = "off"
    try:
        timeit("round-4 path (verify_batch_device off)",
               lambda: dp.verify_batch_device(params, vks, msgs, aggs,
                                              group_chunk=chunk))
    finally:
        os.environ.pop("FUSION_FUSED_MODE", None)


if __name__ == "__main__":
    main()
