#!/usr/bin/env python
"""Assembly micro-lab: dependency-chained device timings of the packed-word
preimage assembly stages and their primitives (the dominant verify cost).

Usage: python benchmarks/asm_lab.py [--batch B] [--secpar S] [--what all|stages|prims]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--secpar", type=int, default=256)
    ap.add_argument("--what", default="all")
    args = ap.parse_args()

    import jax

    cache = Path(__file__).resolve().parents[1] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    import fusion_cryptography_tpu as ftpu
    from fusion_cryptography_tpu.interop import device_serial as ds
    from fusion_cryptography_tpu.ops import ragged_words as rw
    sys.path.insert(0, str(Path(__file__).resolve().parent));
    from truebench import rate

    B = args.batch
    params = ftpu.fusion_setup(args.secpar, 42)
    d = params.degree
    rng = np.random.default_rng(7)
    q = params.modulus

    vk2d = jnp.asarray(
        rng.integers(-(q // 2), q // 2 + 1, size=(2 * d, B), dtype=np.int64
                     ).astype(np.int32))
    ch2d = jnp.asarray(
        rng.integers(-(q // 2), q // 2 + 1, size=(d, B), dtype=np.int64
                     ).astype(np.int32))
    pre_w = jnp.asarray(rng.integers(0, 2**32, size=(20, B), dtype=np.uint64
                                     ).astype(np.uint32))
    pre_len = jnp.full((B,), 78, jnp.int32)
    pre_chunk_proto = (pre_w, pre_len)

    def mk_pre():
        return rw.WChunk(buf=pre_chunk_proto[0], length=pre_chunk_proto[1],
                         max_len=ds.PREHASH_W, min_len=1)

    def perturb(x, buf):
        return x + (buf[:1, : x.shape[-1]] & 1).astype(jnp.int32)

    ch_spec = ds.challenge_preimage_spec(params)
    tri_spec = ds.triple_spec(params)

    if args.what in ("all", "stages"):
        def f_vk(c):
            (x,) = c
            ck = ds.vk_chunk_w(params, x)
            return (perturb(x, ck.buf),)

        rate(f_vk, (vk2d,), label=f"vk_chunk_w fold (512 nums, B={B})")

        def f_chpre(c):
            (x,) = c
            ck = ds.vk_chunk_w(params, x)
            buf, tot = ds.fold_challenge_preimage_w(
                params, ck, mk_pre(), pad_words=-(-(ch_spec.out_max + 1) // 136) * 34)
            return (perturb(x, buf),)

        rate(f_chpre, (vk2d,), label="vk fold + challenge preimage")

        def f_tri(c):
            x, y = c
            ck = ds.vk_chunk_w(params, x)
            buf, tot = ds.fold_triple_w(params, ck, mk_pre(), y)
            return (perturb(x, buf), perturb(y, buf))

        rate(f_tri, (vk2d, ch2d), label="vk fold + triple fold")

        def f_signer_asm(c):
            x, y = c
            ck = ds.vk_chunk_w(params, x)
            buf1, t1 = ds.fold_challenge_preimage_w(
                params, ck, mk_pre(), pad_words=-(-(ch_spec.out_max + 1) // 136) * 34)
            buf2, t2 = ds.fold_triple_w(params, ck, mk_pre(), y)
            return (perturb(x, buf1), perturb(y, buf2))

        rate(f_signer_asm, (vk2d, ch2d), label="signer assembly total (ch+tri)")

        # agg assembly at G lanes with N=4 extras
        N = 4
        G = B // N
        tri_w = rw.words_for(tri_spec.out_max)
        tbuf = jnp.asarray(rng.integers(0, 2**32, size=(N, tri_w, G),
                                        dtype=np.uint64).astype(np.uint32))
        tlen = jnp.full((N, G), int(tri_spec.out_max * 0.93), jnp.int32)
        agg_spec = ds.agg_preimage_spec(params, N, tri_spec.out_max)
        tri_min = ds.spec_min_total(tri_spec, [1])

        def f_agg(c):
            (tb,) = c
            extras = [(tb[k], tlen[k]) for k in range(N)]
            buf, tot = ds.assemble_chunks_words(
                agg_spec, values=None, extras=extras,
                extra_bounds=[(tri_min, tri_spec.out_max)] * N,
                pad_words=-(-(agg_spec.out_max + 1) // 136) * 34)
            return (tb + (buf[None, :1, :] & 1).astype(jnp.uint32),)

        per = rate(f_agg, (tbuf,), label=f"agg assembly (N=4, G={G})")
        print(f"  -> agg {per/G*1e6:.2f} us/group")

    if args.what in ("all", "prims"):
        # primitives
        def f_cells(c):
            (x,) = c
            cells = rw.render_decimal_cells_w(x, b", ")
            return (perturb(x, cells.buf[0]),)

        rate(f_cells, (vk2d,), label="render_decimal_cells_w (512)")

        def f_merge(c):
            (x,) = c
            cells = rw.render_decimal_cells_w(x, b", ")
            out = rw.merge_cells_w(cells)
            return (perturb(x, out.buf),)

        rate(f_merge, (vk2d,), label="render + merge_cells_w (512)")

        W = 1800
        big = jnp.asarray(rng.integers(0, 2**32, size=(W, B), dtype=np.uint64
                                       ).astype(np.uint32))
        s = jnp.asarray(rng.integers(0, 5200, size=(B,), dtype=np.int64
                                     ).astype(np.int32))

        def f_shift(c):
            (x,) = c
            y = rw.shift_left_w(x, s, 5200)
            return (y,)

        rate(f_shift, (big,), label=f"shift_left_w [{W}w, B] max_s=5200")


if __name__ == "__main__":
    main()
