#!/usr/bin/env python
"""Stage breakdown of the packed-word hash pipeline (the production XLA path)
with real host-pull syncs: word assembly + word absorb + squeeze + decode for
the challenge, triple, and aggregation specs.

Compare against signer_breakdown.py / group_breakdown.py (byte-carrier stages).

Usage: python benchmarks/word_breakdown.py [--batch B] [--signers N] [--secpar S]
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
    from fusion_cryptography_tpu.interop import device_serial as ds
    from fusion_cryptography_tpu.ops import ragged_words as rw
    from fusion_cryptography_tpu.ops import xof_decode
    from fusion_cryptography_tpu.ops.keccak import (
        shake256_absorb_words,
        shake256_squeeze_lanes_lm,
    )
    from fusion_cryptography_tpu.ops.ntt import ntt_fwd_u
    from fusion_cryptography_tpu.scheme import device_pipeline as dp

    B, N = args.batch, args.signers
    G = B // N
    params = ftpu.fusion_setup(args.secpar, 42)
    g = dp._geometries(params)
    d = params.degree
    F = params.plan.field
    ch_spec, tri_spec = g["ch_spec"], g["tri_spec"]
    agg_spec = ds.agg_preimage_spec(params, N, tri_spec.out_max)
    print(
        f"B={B} G={G} ch_Ww={rw.words_for(ch_spec.out_max)} "
        f"tri_Ww={rw.words_for(tri_spec.out_max)} agg_Ww={rw.words_for(agg_spec.out_max)}",
        file=sys.stderr, flush=True,
    )

    rng = np.random.default_rng(0)
    q = params.modulus

    def pull(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    def timed(name, fn, *a, scale=B):
        out = fn(*a)
        pull(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            out = fn(*a)
            pull(out)
            ts.append(time.time() - t0)
        dt = min(ts)
        print(f"{name:44s} {dt*1e3:9.2f} ms  ({dt/scale*1e6:7.2f} us/unit)",
              file=sys.stderr, flush=True)
        return out

    vk2d_t = jnp.asarray(rng.integers(-(q // 2), q // 2 + 1, size=(2 * d, B)).astype(np.int32))
    msgs = [f"bench:{k}" for k in range(B)]
    pb, pl_ = dp.prehash_digits(params, msgs)
    pre_b = jnp.asarray(pb.T)
    pre_len = jnp.asarray(pl_)
    pre_w = rw.pack_bytes_to_words(pre_b)
    bounds = [(1, ds.PREHASH_W)]

    def pad_w(buf, n_bytes):
        padw = dp._pad_rate(n_bytes) // 4 - buf.shape[0]
        return jnp.pad(buf, ((0, padw), (0, 0))) if padw > 0 else buf

    # --- signer half ---------------------------------------------------------
    asm = jax.jit(lambda v, ew, el: ds.assemble_chunks_words(
        ch_spec, values=v, extras=[(ew, el)], extra_bounds=bounds))
    wbuf, total = timed("ch assembly (words)", asm, vk2d_t, pre_w, pre_len)

    @jax.jit
    def absorb(b, t):
        return [x for p in shake256_absorb_words(pad_w(b, ch_spec.out_max), t) for x in p]

    st = timed("ch absorb (words)", absorb, wbuf, total)

    @jax.jit
    def squeeze(flat):
        lanes = tuple((flat[2 * l], flat[2 * l + 1]) for l in range(25))
        return shake256_squeeze_lanes_lm(lanes, g["n_xof_ch_used"])

    xof = timed("ch squeeze (bytes out)", squeeze, st)

    dec = jax.jit(lambda x: xof_decode.decode_coeffs_lm(x, g["geom_ch"]))
    cc_t = timed("ch decode", dec, xof)

    nttf = jax.jit(lambda c: F.to_centered(ntt_fwd_u(params.plan, F.to_unsigned(c.T))).T)
    ch_t = timed("ch NTT (+transposes)", nttf, cc_t)

    tasm = jax.jit(lambda v, ew, el: ds.assemble_chunks_words(
        tri_spec, values=v, extras=[(ew, el)], extra_bounds=bounds))
    tvals = jnp.concatenate([vk2d_t, ch_t], axis=0)
    twbuf, tlen = timed("triple assembly (words)", tasm, tvals, pre_w, pre_len)

    # --- group half ----------------------------------------------------------
    tri_bounds = [(g["tri_min"], tri_spec.out_max)] * N
    tw3 = twbuf.reshape(-1, G, N)
    tl3 = tlen.reshape(G, N)

    gasm = jax.jit(lambda tb, tl: ds.assemble_chunks_words(
        agg_spec, extras=[(tb[:, :, k], tl[:, k]) for k in range(N)],
        extra_bounds=tri_bounds))
    gwbuf, gtot = timed("agg assembly (words)", gasm, tw3, tl3, scale=G)

    @jax.jit
    def gabsorb(b, t):
        return [x for p in shake256_absorb_words(pad_w(b, agg_spec.out_max), t) for x in p]

    gst = timed("agg absorb (words)", gabsorb, gwbuf, gtot, scale=G)

    n_blob = N * g["block_ag"]

    @jax.jit
    def gsqueeze(flat):
        lanes = tuple((flat[2 * l], flat[2 * l + 1]) for l in range(25))
        return shake256_squeeze_lanes_lm(lanes, n_blob)

    blob = timed("agg squeeze (bytes out)", gsqueeze, gst, scale=G)

    @jax.jit
    def gdec(blob_):
        per = jnp.moveaxis(blob_.reshape(N, g["block_ag"], G), 0, 2)
        al_t = xof_decode.decode_coeffs_lm(per.reshape(g["block_ag"], G * N), g["geom_ag"])
        return al_t.T.reshape(G, N, d)

    timed("alpha decode", gdec, blob, scale=G)


if __name__ == "__main__":
    main()
