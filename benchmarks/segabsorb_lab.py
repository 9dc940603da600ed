#!/usr/bin/env python
"""Segmented sponge absorb vs triple-fold + agg assembly (the group stage).

A) current: per-signer str((vk, i, ch)) triple folds (fold_triple_w), then
   assemble_chunks_words over the agg spec, then the contiguous absorb.
B) segmented: shake256_absorb_segments_words over the SAME chunks — each
   segment shifted only by the carry fill mod 136 (ROADMAP idea #1), no
   triple buffers and no agg merge tree at all.

Both paths squeeze 16 words and are asserted bit-identical first.
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=2048)
    ap.add_argument("--signers", type=int, default=4)
    args = ap.parse_args()
    G, N = args.groups, args.signers

    import jax

    cache = Path(__file__).resolve().parents[1] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    import fusion_cryptography_tpu as ftpu
    from fusion_cryptography_tpu.interop import device_serial as ds
    from fusion_cryptography_tpu.ops import keccak as kc
    from fusion_cryptography_tpu.ops import ragged_words as rw
    from truebench import rate

    params = ftpu.fusion_setup(256, 42)
    d = params.degree
    q = params.modulus
    rng = np.random.default_rng(3)

    vk_spec = ds.vk_body_spec(params)
    chb_spec = ds.challenge_body_spec(params)
    tri_spec = ds.triple_spec(params)
    agg_spec = ds.agg_preimage_spec(params, N, tri_spec.out_max)
    vk_min = ds.spec_min_total(vk_spec, [])
    chb_min = ds.spec_min_total(chb_spec, [])
    tri_min = ds.spec_min_total(tri_spec, [1])

    def build_chunks(seed):
        r = np.random.default_rng(seed)
        vk_t = jnp.asarray(r.integers(-(q // 2), q // 2 + 1, (2 * d, G),
                                      dtype=np.int64).astype(np.int32))
        ch_t = jnp.asarray(r.integers(-(q // 2), q // 2 + 1, (d, G),
                                      dtype=np.int64).astype(np.int32))
        plens = r.integers(1, ds.PREHASH_W + 1, G).astype(np.int32)
        by = np.zeros((ds.PREHASH_W + 2, G), np.uint8)
        for b in range(G):
            by[: plens[b], b] = r.integers(ord("1"), ord("9"), plens[b])
        pre_w = rw.pack_bytes_to_words(jnp.asarray(by))
        vk_chunk = ds.vk_chunk_w(params, vk_t)
        ch_chunk = rw.fold_chunks_w(
            ds._spec_word_nodes(chb_spec, ch_t, (), None, G)
        )
        return (vk_chunk.buf, vk_chunk.length, pre_w, jnp.asarray(plens),
                ch_chunk.buf, ch_chunk.length)

    print("building signer chunks (untimed)...", flush=True)
    signers = []
    for s in range(N):
        flat = jax.jit(lambda s=s: build_chunks(101 + s))()
        flat = [jnp.asarray(np.asarray(x)) for x in flat]
        signers.append(
            (
                rw.WChunk(flat[0], flat[1], vk_spec.out_max, vk_min),
                rw.WChunk(flat[2], flat[3], ds.PREHASH_W, 1),
                rw.WChunk(flat[4], flat[5], chb_spec.out_max, chb_min),
            )
        )

    def const_chunk(data: bytes):
        return ds._const_chunk_w(data, G)

    n_sq = 16

    def path_a(chunks):
        tris = []
        for (vk_c, pre_c, ch_c) in chunks:
            tri = rw.fold_chunks_w(
                [const_chunk(b"("), vk_c, const_chunk(b", "), pre_c,
                 const_chunk(b", "), ch_c, const_chunk(b")")]
            )
            tris.append(ds._finish_chunk_w(tri, tri_spec.out_max))
        wbuf, total = ds.assemble_chunks_words(
            agg_spec, values=None, extras=tris,
            extra_bounds=[(tri_min, tri_spec.out_max)] * N,
            pad_words=-(-(agg_spec.out_max + 1) // kc.RATE) * kc.RATE_WORDS,
        )
        state = kc.shake256_absorb_words(wbuf, total, assume_clean=True)
        return kc.shake256_squeeze_words(state, n_sq)

    def path_b(chunks):
        """9 segments: dst+",[(", then per signer (vk+", "+i+", ") and
        (ch+")., (" / ")]") — the tiny consts fold into the ragged chunks
        with the cheap scatter merges (slack/width >= 8), so the segmented
        absorb sees few, fat segments."""
        segs = []
        dstc = const_chunk(bytes(params.agg_xof_dst) + b",[(")
        segs.append((dstc.buf, dstc.length, dstc.min_len, dstc.max_len))
        sep = const_chunk(b", ")
        for k, (vk_c, pre_c, ch_c) in enumerate(chunks):
            head = rw.fold_chunks_w([vk_c, sep, pre_c, sep])
            segs.append((head.buf, head.length, head.min_len, head.max_len))
            tailc = const_chunk(b"), (" if k + 1 < N else b")]")
            tail = rw.merge_w(ch_c, tailc)
            segs.append((tail.buf, tail.length, tail.min_len, tail.max_len))
        state = kc.shake256_absorb_segments_words(segs)
        return kc.shake256_squeeze_words(state, n_sq)

    print(f"device={jax.devices()[0]}  G={G} N={N}", flush=True)
    import time

    t0 = time.time()
    wa = np.asarray(jax.jit(lambda: path_a(signers))())
    print(f"A compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    wb = np.asarray(jax.jit(lambda: path_b(signers))())
    print(f"B compile+run {time.time()-t0:.1f}s", flush=True)
    ok = np.array_equal(wa, wb)
    print(f"parity A vs B: {'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        bad = np.nonzero((wa != wb).any(axis=0))[0]
        print(f"  mismatching lanes: {bad[:8]} / {len(bad)}", flush=True)
        return

    dummy = jnp.asarray(rng.integers(0, 97, (64, G), dtype=np.int64
                                     ).astype(np.int32))

    def mk(fn):
        def f(c):
            (x,) = c
            out = fn(signers)
            dep = (out[:1].astype(jnp.int32)) % np.int32(97)
            return ((x + dep) % np.int32(97),)

        return f

    pa = rate(mk(path_a), (dummy,), label=f"A fold+assemble+absorb [G={G}]")
    print(f"    -> {pa / G * 1e6:8.3f} us/group", flush=True)
    pb = rate(mk(path_b), (dummy,), label=f"B segmented absorb     [G={G}]")
    print(f"    -> {pb / G * 1e6:8.3f} us/group", flush=True)

    import os

    if os.environ.get("FUSION_SEGLAB_PALLAS"):
        from fusion_cryptography_tpu.ops.keccak_pallas import (
            shake256_words_pallas_w,
        )

        def path_c(chunks):
            tris = []
            for (vk_c, pre_c, ch_c) in chunks:
                tri = rw.fold_chunks_w(
                    [const_chunk(b"("), vk_c, const_chunk(b", "), pre_c,
                     const_chunk(b", "), ch_c, const_chunk(b")")]
                )
                tris.append(ds._finish_chunk_w(tri, tri_spec.out_max))
            wbuf, total = ds.assemble_chunks_words(
                agg_spec, values=None, extras=tris,
                extra_bounds=[(tri_min, tri_spec.out_max)] * N,
                pad_words=-(-(agg_spec.out_max + 1) // kc.RATE) * kc.RATE_WORDS,
            )
            return shake256_words_pallas_w(wbuf, total, n_sq)

        wc = np.asarray(jax.jit(lambda: path_c(signers))())
        print(f"parity A vs C: {'OK' if np.array_equal(wa, wc) else 'MISMATCH'}",
              flush=True)
        pc = rate(mk(path_c), (dummy,),
                  label=f"C fold+assemble+PALLAS sponge [G={G}]")
        print(f"    -> {pc / G * 1e6:8.3f} us/group", flush=True)


if __name__ == "__main__":
    main()
