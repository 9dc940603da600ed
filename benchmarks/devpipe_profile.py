#!/usr/bin/env python
"""Stage-level profile of the device verify pipeline: times preimage assembly,
SHAKE absorb/squeeze, decode, NTT, and lattice math as separate jits so the
bottleneck is visible.  Synthetic inputs (correctness is covered by tests).

Usage: python benchmarks/devpipe_profile.py [--signers-batch B] [--groups G] [--secpar S]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def bench(name, fn, *args, reps=3):
    out = fn(*args)
    for leaf in __import__("jax").tree_util.tree_leaves(out):
        leaf.block_until_ready()
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        for leaf in __import__("jax").tree_util.tree_leaves(out):
            leaf.block_until_ready()
        times.append(time.time() - t0)
    print(f"{name:42s} {min(times)*1e3:9.2f} ms", file=sys.stderr, flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--signers-batch", type=int, default=2048)
    ap.add_argument("--groups", type=int, default=512)
    ap.add_argument("--signers", type=int, default=4)
    ap.add_argument("--secpar", type=int, default=256)
    args = ap.parse_args()

    import jax

    cache = Path(__file__).resolve().parents[1] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    from functools import partial

    import fusion_cryptography_tpu as ftpu
    from fusion_cryptography_tpu.interop import device_serial as ds
    from fusion_cryptography_tpu.ops import xof_decode
    from fusion_cryptography_tpu.ops.keccak import (
        RATE, shake256_absorb_lanes, shake256_squeeze_lanes)
    from fusion_cryptography_tpu.ops.ntt import ntt_fwd_u
    from fusion_cryptography_tpu.scheme.device_pipeline import (
        _geometries, _pad_rate)

    params = ftpu.fusion_setup(args.secpar, 42)
    g = _geometries(params)
    d = params.degree
    B, G, N = args.signers_batch, args.groups, args.signers
    if B < G * N:
        raise SystemExit(f"--signers-batch {B} must be >= groups*signers = {G*N}")
    ch_spec, tri_spec = g["ch_spec"], g["tri_spec"]
    agg_spec = ds.agg_preimage_spec(params, N, tri_spec.out_max)
    print(f"ch_spec.out_max={ch_spec.out_max} tri_spec.out_max={tri_spec.out_max} "
          f"agg_spec.out_max={agg_spec.out_max} n_xof_ch={g['n_xof_ch']} "
          f"agg_blob={N*g['block_ag']}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    vk2d = jnp.asarray(rng.integers(-(2**30), 2**30, (B, 2 * d), dtype=np.int32))
    pre_buf = jnp.asarray(rng.integers(48, 58, (B, ds.PREHASH_W), dtype=np.uint8))
    pre_len = jnp.full((B,), 77, dtype=jnp.int32)

    # --- signer stage pieces -------------------------------------------------
    asm = jax.jit(lambda v, pb, pl: ds.assemble(ch_spec, values=v, extras=[(pb, pl)]))
    buf, total = bench("assemble challenge preimage", asm, vk2d, pre_buf, pre_len)

    padded = jnp.pad(buf, ((0, 0), (0, _pad_rate(ch_spec.out_max) - buf.shape[1])))
    absorb = jax.jit(lambda b, t: [x for p in shake256_absorb_lanes(b, t) for x in p])
    st = bench(f"absorb ch ({padded.shape[1]//RATE} blocks)", absorb, padded, total)

    sq = jax.jit(lambda s: shake256_squeeze_lanes(
        tuple((s[2 * l], s[2 * l + 1]) for l in range(25)), g["n_xof_ch"]))
    xof = bench(f"squeeze ch ({-(-g['n_xof_ch']//RATE)} blocks)", sq, st)

    dec = jax.jit(lambda x: xof_decode.decode_coeffs(x, g["geom_ch"]))
    cc = bench("decode challenge coeffs", dec, xof)

    F = params.plan.field
    nttf = jax.jit(lambda c: ntt_fwd_u(params.plan, F.to_unsigned(c)))
    bench("challenge NTT", nttf, cc)

    tvals = jnp.concatenate([vk2d, cc], axis=1)
    tasm = jax.jit(lambda v, pb, pl: ds.assemble(tri_spec, values=v, extras=[(pb, pl)]))
    tbuf, tlen = bench("assemble triple str", tasm, tvals, pre_buf, pre_len)

    # --- group stage pieces ---------------------------------------------------
    tb = jnp.asarray(np.tile(np.asarray(tbuf)[: G * N].reshape(G, N, -1), (1, 1, 1)))
    tl = jnp.asarray(np.asarray(tlen)[: G * N].reshape(G, N))

    def gasm(tbuf_, tlen_):
        extras = [(tbuf_[:, k], tlen_[:, k]) for k in range(N)]
        return ds.assemble(agg_spec, extras=extras)

    gbuf, gtotal = bench("assemble agg preimage", jax.jit(gasm), tb, tl)

    gp = jnp.pad(gbuf, ((0, 0), (0, _pad_rate(agg_spec.out_max) - gbuf.shape[1])))
    gst = bench(f"absorb agg ({gp.shape[1]//RATE} blocks)", absorb, gp, gtotal)
    gsq = jax.jit(lambda s: shake256_squeeze_lanes(
        tuple((s[2 * l], s[2 * l + 1]) for l in range(25)), N * g["block_ag"]))
    blob = bench(f"squeeze agg ({-(-N*g['block_ag']//RATE)} blocks)", gsq, gst)

    per = blob.reshape(G * N, g["block_ag"])
    deca = jax.jit(lambda x: xof_decode.decode_coeffs(x, g["geom_ag"]))
    bench("decode alpha coeffs", deca, per)


if __name__ == "__main__":
    main()
