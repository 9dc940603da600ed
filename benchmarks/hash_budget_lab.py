#!/usr/bin/env python
"""Device-time budget of the hash half at production shapes (round 5).

Dependency-chained rates (truebench) for each signer/group sub-stage:
assembly folds, sponge, XOF decode, NTT — to direct the next kernel work.

Usage: python benchmarks/hash_budget_lab.py [--batch B] [--groups G]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

cache_dir = Path(__file__).resolve().parents[1] / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from truebench import rate

import fusion_cryptography_tpu as ftpu
from fusion_cryptography_tpu.interop import device_serial as ds
from fusion_cryptography_tpu.ops import ragged_words as rw
from fusion_cryptography_tpu.ops import xof_decode
from fusion_cryptography_tpu.ops.keccak import (
    shake256_absorb_words, shake256_squeeze_lanes_lm, shake256_squeeze_words,
)
from fusion_cryptography_tpu.scheme import device_pipeline as dp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)   # signers (B = G*N)
    ap.add_argument("--groups", type=int, default=2048)  # groups for agg stage
    args = ap.parse_args()
    B, G = args.batch, args.groups
    N = 4
    d = 256

    params = ftpu.fusion_setup(256, 42)
    g = dp._geometries(params)
    ch_spec, tri_spec = g["ch_spec"], g["tri_spec"]
    plan = params.plan
    F = plan.field
    rng = np.random.default_rng(5)
    q = params.modulus

    vk2d_t = jnp.asarray(rng.integers(-(q // 2), q // 2 + 1, (2 * d, B),
                                      dtype=np.int64).astype(np.int32))
    c_hat_t = jnp.asarray(rng.integers(-(q // 2), q // 2 + 1, (d, B),
                                       dtype=np.int64).astype(np.int32))
    pre_w = jnp.asarray(rng.integers(ord("0"), ord("9"), (20, B),
                                     dtype=np.int64).astype(np.uint32))
    pre_len = jnp.full((B,), 77, jnp.int32)
    pre_chunk = rw.WChunk(buf=pre_w, length=pre_len, max_len=ds.PREHASH_W, min_len=1)

    print(f"device={jax.devices()[0]}  B={B} G={G}", flush=True)

    # value-preserving wrappers: carry (vk2d_t-like) -> same shape
    def as_carry(y, like):
        """Fold y's value into a like-shaped int32 carry (dependency chain)."""
        flat = y.reshape(-1)
        n = int(np.prod(like.shape))
        if flat.size < n:
            flat = jnp.tile(flat, -(-n // flat.size))
        return (flat[:n].reshape(like.shape).astype(like.dtype) % np.int32(97),)

    def vk_fold(args):
        (v,) = args
        ch = ds.vk_chunk_w(params, v)
        return as_carry(ch.buf.astype(jnp.int32), v)

    def ch_preimage(args):
        (v,) = args
        vkc = ds.vk_chunk_w(params, v)
        wbuf, total = ds.fold_challenge_preimage_w(
            params, vkc, pre_chunk,
            pad_words=-(-(ch_spec.out_max + 1) // 136) * 34)
        return as_carry(wbuf.astype(jnp.int32) + total[None, :].astype(jnp.int32), v)

    def triple(args):
        (v,) = args
        vkc = ds.vk_chunk_w(params, v)
        tbuf, tlen = ds.fold_triple_w(params, vkc, pre_chunk, c_hat_t)
        return as_carry(tbuf.astype(jnp.int32), v)

    n_ch_words = -(-g["n_xof_ch_used"] // 4)
    ch_wbuf, ch_total = jax.jit(lambda v: ds.fold_challenge_preimage_w(
        params, ds.vk_chunk_w(params, v), pre_chunk,
        pad_words=-(-(ch_spec.out_max + 1) // 136) * 34))(vk2d_t)
    ch_wbuf = jnp.asarray(np.asarray(ch_wbuf))
    ch_total = jnp.asarray(np.asarray(ch_total))

    def sponge_xla(args):
        (v,) = args
        xw = shake256_squeeze_words(
            shake256_absorb_words(ch_wbuf, ch_total, min_len=g["ch_min"],
                                  assume_clean=True), n_ch_words)
        return as_carry(xw.astype(jnp.int32), v)

    def sponge_pallas(args):
        from fusion_cryptography_tpu.ops.keccak_pallas import shake256_words_pallas_w
        (v,) = args
        xw = shake256_words_pallas_w(ch_wbuf, ch_total, n_ch_words)
        return as_carry(xw.astype(jnp.int32), v)

    xw0 = jax.jit(lambda: shake256_squeeze_words(
        shake256_absorb_words(ch_wbuf, ch_total, min_len=g["ch_min"],
                              assume_clean=True), n_ch_words))()
    xw0 = jnp.asarray(np.asarray(xw0))

    def decode(args):
        (v,) = args
        cc_t = xof_decode.decode_coeffs_w(xw0, g["geom_ch"], g["n_xof_ch_used"])
        return as_carry(cc_t, v)

    def ntt_fwd_stage(args):
        from fusion_cryptography_tpu.ops.ntt import ntt_fwd_u
        (v,) = args
        cu = ntt_fwd_u(plan, F.to_unsigned(v[:d].T))
        return as_carry(cu.astype(jnp.int32), v)

    carry = (vk2d_t,)
    for label, fn in (
        ("vk_chunk_w fold", vk_fold),
        ("ch preimage (vk fold + ch fold)", ch_preimage),
        ("triple (vk fold + tri fold)", triple),
        ("challenge sponge XLA", sponge_xla),
        ("challenge sponge PALLAS", sponge_pallas),
        ("challenge decode", decode),
        ("challenge NTT fwd", ntt_fwd_stage),
    ):
        try:
            per = rate(fn, carry, label=f"{label} [B={B}]")
            print(f"    -> {per / B * 1e6 * N:8.3f} us/group(x{N})", flush=True)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)

    # ---- group half at G lanes -------------------------------------------
    tri_buf, tri_len = jax.jit(lambda v: ds.fold_triple_w(
        params, ds.vk_chunk_w(params, v), pre_chunk, c_hat_t))(vk2d_t)
    Lw = tri_buf.shape[0]
    tbs = [jnp.asarray(np.asarray(tri_buf[:, k * G:(k + 1) * G])) for k in range(N)]
    tls = [jnp.asarray(np.asarray(tri_len[k * G:(k + 1) * G])) for k in range(N)]
    agg_spec = ds.agg_preimage_spec(params, N, tri_spec.out_max)
    agg_min = ds.spec_min_total(agg_spec, [g["tri_min"]] * N)
    tri_bounds = [(g["tri_min"], tri_spec.out_max)] * N
    gcarry = (jnp.asarray(rng.integers(0, 97, (64, G), dtype=np.int64
                                       ).astype(np.int32)),)

    def agg_fold(args):
        (v,) = args
        wbuf, total = ds.assemble_chunks_words(
            agg_spec, values=None, extras=list(zip(tbs, tls)),
            extra_bounds=tri_bounds,
            pad_words=-(-(agg_spec.out_max + 1) // 136) * 34)
        return as_carry(wbuf.astype(jnp.int32), v)

    agg_wbuf, agg_total = jax.jit(lambda: ds.assemble_chunks_words(
        agg_spec, values=None, extras=list(zip(tbs, tls)),
        extra_bounds=tri_bounds,
        pad_words=-(-(agg_spec.out_max + 1) // 136) * 34))()
    agg_wbuf = jnp.asarray(np.asarray(agg_wbuf))
    agg_total = jnp.asarray(np.asarray(agg_total))
    n_ag_words = -(-(N * g["block_ag"]) // 4)

    def agg_sponge_pallas(args):
        from fusion_cryptography_tpu.ops.keccak_pallas import shake256_words_pallas_w
        (v,) = args
        blob = shake256_words_pallas_w(agg_wbuf, agg_total, n_ag_words)
        return as_carry(blob.astype(jnp.int32), v)

    def agg_sponge_xla(args):
        (v,) = args
        blob = shake256_squeeze_words(
            shake256_absorb_words(agg_wbuf, agg_total, min_len=agg_min,
                                  assume_clean=True), n_ag_words)
        return as_carry(blob.astype(jnp.int32), v)

    for label, fn in (
        ("agg preimage fold", agg_fold),
        ("agg sponge PALLAS", agg_sponge_pallas),
        ("agg sponge XLA", agg_sponge_xla),
    ):
        try:
            per = rate(fn, gcarry, label=f"{label} [G={G}]")
            print(f"    -> {per / G * 1e6:8.3f} us/group", flush=True)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__" and "--fold-pallas" not in sys.argv:
    main()


def fold_pallas_main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--groups", type=int, default=2048)
    ap.add_argument("--tile", type=int, default=128)
    args, _ = ap.parse_known_args()
    B, G, tile = args.batch, args.groups, args.tile
    N, d = 4, 256

    from fusion_cryptography_tpu.ops import fold_pallas as fp

    params = ftpu.fusion_setup(256, 42)
    g = dp._geometries(params)
    rng = np.random.default_rng(5)
    q = params.modulus
    vk2d_t = jnp.asarray(rng.integers(-(q // 2), q // 2 + 1, (2 * d, B),
                                      dtype=np.int64).astype(np.int32))
    c_hat_t = jnp.asarray(rng.integers(-(q // 2), q // 2 + 1, (d, B),
                                       dtype=np.int64).astype(np.int32))
    pre_w = jnp.asarray(rng.integers(ord("0"), ord("9"), (20, B),
                                     dtype=np.int64).astype(np.uint32))
    pre_len = jnp.full((B,), 77, jnp.int32)
    print(f"device={jax.devices()[0]}  B={B} tile={tile}", flush=True)

    def as_carry(y, like):
        flat = y.reshape(-1)
        n = int(np.prod(like.shape))
        if flat.size < n:
            flat = jnp.tile(flat, -(-n // flat.size))
        return (flat[:n].reshape(like.shape).astype(like.dtype) % np.int32(97),)

    def fold_a(args_):
        (v,) = args_
        chb, cht, vkb, vkl = fp.signer_fold_a(params, v, pre_w, pre_len, tile=tile)
        return as_carry(chb.astype(jnp.int32) + vkb[:1].astype(jnp.int32), v)

    per = rate(fold_a, (vk2d_t,), label=f"PALLAS fold_a (vk+ch) [B={B}]")
    print(f"    -> {per / B * 1e6 * N:8.3f} us/group(x{N})", flush=True)

    chb, cht, vkb, vkl = jax.jit(
        lambda v: fp.signer_fold_a(params, v, pre_w, pre_len, tile=tile))(vk2d_t)
    vkb = jnp.asarray(np.asarray(vkb)); vkl = jnp.asarray(np.asarray(vkl))

    def fold_b(args_):
        (v,) = args_
        trib, trit = fp.signer_fold_b(params, vkb, vkl, pre_w, pre_len,
                                      v[:d], tile=tile)
        return as_carry(trib.astype(jnp.int32), v)

    per = rate(fold_b, (vk2d_t,), label=f"PALLAS fold_b (triple) [B={B}]")
    print(f"    -> {per / B * 1e6 * N:8.3f} us/group(x{N})", flush=True)

    # parity on-TPU at scale (compiled, not interpret)
    from fusion_cryptography_tpu.interop import device_serial as ds
    from fusion_cryptography_tpu.ops import ragged_words as rw
    ch_spec = ds.challenge_preimage_spec(params)
    pre_chunk = rw.WChunk(buf=pre_w, length=pre_len, max_len=ds.PREHASH_W, min_len=1)
    pad_ch = -(-(ch_spec.out_max + 1) // 136) * 34
    want_chb, want_cht = jax.jit(lambda v: ds.fold_challenge_preimage_w(
        params, ds.vk_chunk_w(params, v), pre_chunk, pad_words=pad_ch))(vk2d_t)
    ok = np.array_equal(np.asarray(want_chb), np.asarray(chb)) and \
         np.array_equal(np.asarray(want_cht), np.asarray(cht))
    print(f"fold_a parity on TPU: {'OK' if ok else 'MISMATCH'}", flush=True)

    want_trib, want_trit = jax.jit(lambda v: ds.fold_triple_w(
        params, ds.vk_chunk_w(params, v), pre_chunk, v[:d]))(vk2d_t)
    got_trib, got_trit = jax.jit(lambda v: fp.signer_fold_b(
        params, vkb, vkl, pre_w, pre_len, v[:d], tile=tile))(vk2d_t)
    ok = np.array_equal(np.asarray(want_trib), np.asarray(got_trib)) and \
         np.array_equal(np.asarray(want_trit), np.asarray(got_trit))
    print(f"fold_b parity on TPU: {'OK' if ok else 'MISMATCH'}", flush=True)

    # agg fold at G lanes
    tbs = [jnp.asarray(np.asarray(want_trib[:, k * G:(k + 1) * G])) for k in range(N)]
    tls = [jnp.asarray(np.asarray(want_trit[k * G:(k + 1) * G])) for k in range(N)]

    def fold_g(args_):
        (v,) = args_
        ob, ot = fp.agg_fold(params, N, tbs, tls, tile=tile)
        return as_carry(ob.astype(jnp.int32), v)

    gcarry = (jnp.asarray(rng.integers(0, 97, (64, G), dtype=np.int64
                                       ).astype(np.int32)),)
    per = rate(fold_g, gcarry, label=f"PALLAS agg fold [G={G}]")
    print(f"    -> {per / G * 1e6:8.3f} us/group", flush=True)

    agg_spec = ds.agg_preimage_spec(params, N, ds.triple_spec(params).out_max)
    tri_min = ds.spec_min_total(ds.triple_spec(params), [1])
    pad_agg = -(-(agg_spec.out_max + 1) // 136) * 34
    want_b, want_t = jax.jit(lambda: ds.assemble_chunks_words(
        agg_spec, values=None, extras=list(zip(tbs, tls)),
        extra_bounds=[(tri_min, ds.triple_spec(params).out_max)] * N,
        pad_words=pad_agg))()
    got_b, got_t = jax.jit(lambda: fp.agg_fold(params, N, tbs, tls, tile=tile))()
    ok = np.array_equal(np.asarray(want_b), np.asarray(got_b)) and \
         np.array_equal(np.asarray(want_t), np.asarray(got_t))
    print(f"agg fold parity on TPU: {'OK' if ok else 'MISMATCH'}", flush=True)


if __name__ == "__main__" and "--fold-pallas" in sys.argv:
    fold_pallas_main()
