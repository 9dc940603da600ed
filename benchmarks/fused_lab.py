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


if __name__ == "__main__" and "--parts" not in sys.argv:
    main()


def parts_main():
    """Split fused_hash: signer map alone vs group alone; map vs unroll vs
    single-fat-chunk; sponge flavor check."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=8192)
    ap.add_argument("--signers", type=int, default=4)
    ap.add_argument("--parts", action="store_true")
    args, _ = ap.parse_known_args()
    G, N = args.groups, args.signers
    d = 256

    import jax
    from functools import partial
    import fusion_cryptography_tpu as ftpu
    from fusion_cryptography_tpu.scheme import device_pipeline as dp

    params = ftpu.fusion_setup(256, 42)
    flags = dp._env_flags()
    log(f"env flags (pallas, words, dev_prehash, sponge, asm, fused_prep, mxu): {flags}")
    P = dp.get_pipeline(params, N)
    rng = np.random.default_rng(5)
    q = params.modulus
    vks = jnp.asarray(rng.integers(-(q // 2), q // 2 + 1, (G, N, 2, d),
                                   dtype=np.int64).astype(np.int32))
    msgs = [f"group{g}:msg{i}" for g in range(G) for i in range(N)]
    packed = jnp.asarray(P.prep_packed(msgs).reshape(G, N, -1))
    np.asarray(packed[:1, :1, :1])

    use_pallas, use_words, device_prehash, pallas_sponge, pallas_asm, _fp, _mx = flags
    signer_stage, group_stage = dp.make_stages(
        params, N, use_pallas, use_words=use_words, pallas_sponge=pallas_sponge,
        pallas_assembly=pallas_asm)

    def signer_body(vkc, pkc):
        ml = pkc[:, :, -1].astype(jnp.int32)
        mw = pkc[:, :, :-1]
        pre_w, pre_len = signer_stage.prehash(
            dp._dl(mw.reshape(ml.size, -1).T), ml.reshape(-1))
        vk2d_t = dp._dl(vkc.reshape(-1, 2 * d).T)
        _cc, c_hat_u, tbuf, tlen = signer_stage(vk2d_t, dp._dl(pre_w), pre_len)
        return c_hat_u, tbuf, tlen

    @partial(jax.jit, static_argnums=(2, 3))
    def signer_all(vks, packed, chunk, unroll):
        nc = G // chunk
        vkr = vks.reshape(nc, chunk, N, 2, d)
        pkr = packed.reshape(nc, chunk, N, packed.shape[-1])
        if nc == 1:
            return jax.tree_util.tree_map(
                lambda x: x[None], signer_body(vkr[0], pkr[0]))
        if unroll:
            outs = [signer_body(vkr[i], pkr[i]) for i in range(nc)]
            return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)
        return jax.lax.map(lambda c: signer_body(*c), (vkr, pkr))

    @jax.jit
    def group_all(tbuf, tlen):
        tb = jnp.moveaxis(tbuf, 0, 1).reshape(tbuf.shape[1], G, N)
        tl = tlen.reshape(G, N)
        return group_stage.parts(
            [dp._dl(tb[:, :, k]) for k in range(N)],
            [tl[:, k] for k in range(N)])

    for chunk, unroll in ((512, False), (1024, False), (2048, False),
                          (512, True), (8192, False)):
        if G % chunk:
            continue
        try:
            t = timeit(f"signer_all chunk={chunk} unroll={unroll}",
                       lambda: signer_all(vks, packed, chunk, unroll))
        except Exception as e:
            log(f"signer_all chunk={chunk} unroll={unroll} FAILED: {type(e).__name__} {e}")
            continue
    c_hat_u, tbuf, tlen = signer_all(vks, packed, 512, False)
    timeit("group_all (full window)", lambda: group_all(tbuf, tlen))


if __name__ == "__main__" and "--parts" in sys.argv:
    parts_main()
