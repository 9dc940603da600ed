#!/usr/bin/env python
"""Sub-stage breakdown of the GROUP half of the device verify pipeline plus
the composed j_signer / j_group / j_lattice jits, with real host-pull syncs.

The signer half is covered by signer_breakdown.py; this covers what happens
after the per-signer triple buffers exist: aggregation preimage assembly,
agg absorb/squeeze, alpha decode, and the lattice stage — i.e. the stages
whose cost scales with G rather than B = G*N.

Usage: python benchmarks/group_breakdown.py [--groups G] [--signers N] [--secpar S]
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
    from fusion_cryptography_tpu.interop import device_serial as ds
    from fusion_cryptography_tpu.ops import xof_decode
    from fusion_cryptography_tpu.ops.keccak import (
        shake256_absorb_lanes_lm,
        shake256_squeeze_lanes_lm,
    )
    from fusion_cryptography_tpu.ops.ntt import ntt_fwd_u, ntt_inv_u
    from fusion_cryptography_tpu.scheme import device_pipeline as dp

    G, N = args.groups, args.signers
    B = G * N
    params = ftpu.fusion_setup(args.secpar, 42)
    g = dp._geometries(params)
    d = params.degree
    F = params.plan.field
    tri_spec = g["tri_spec"]
    agg_spec = ds.agg_preimage_spec(params, N, tri_spec.out_max)
    n_blob = N * g["block_ag"]
    print(
        f"G={G} N={N} tri_out_max={tri_spec.out_max} agg_out_max={agg_spec.out_max} "
        f"agg_absorb_blocks={dp._pad_rate(agg_spec.out_max)//136} "
        f"agg_squeeze_blocks={-(-n_blob//136)}",
        file=sys.stderr, flush=True,
    )

    rng = np.random.default_rng(0)
    q = params.modulus

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
        print(f"{name:44s} {dt*1e3:9.2f} ms  ({dt/G*1e6:7.2f} us/group)",
              file=sys.stderr, flush=True)
        return out

    # Synthetic triple buffers shaped like the signer stage's output:
    # left-aligned ASCII with zeroed scratch, realistic lengths.
    Lt = tri_spec.out_max
    tlen_np = rng.integers(int(Lt * 0.95), Lt + 1, size=(G, N)).astype(np.int32)
    tbuf_np = rng.integers(48, 58, size=(Lt, G, N), dtype=np.uint8)
    mask = np.arange(Lt)[:, None, None] < tlen_np[None, :, :]
    tbuf_np = np.where(mask, tbuf_np, 0).astype(np.uint8)
    tbuf = jnp.asarray(tbuf_np)
    tlen = jnp.asarray(tlen_np)
    tri_bounds = [(g["tri_min"], Lt)] * N

    # --- group assembly ------------------------------------------------------
    def gasm(tb, tl):
        extras = [(tb[:, :, k], tl[:, k]) for k in range(N)]
        return ds.assemble_chunks_lm(agg_spec, extras=extras, extra_bounds=tri_bounds)

    gbuf, gtotal = timed("agg assembly (lm)", jax.jit(gasm), tbuf, tlen)

    pad = dp._pad_rate(agg_spec.out_max) - gbuf.shape[0]

    @jax.jit
    def absorb(b, t):
        bp = jnp.pad(b, ((0, pad), (0, 0)))
        st = shake256_absorb_lanes_lm(bp, t)
        return [x for p in st for x in p]

    st = timed("agg absorb", absorb, gbuf, gtotal)

    @jax.jit
    def squeeze(flat):
        lanes = tuple((flat[2 * l], flat[2 * l + 1]) for l in range(25))
        return shake256_squeeze_lanes_lm(lanes, n_blob)

    blob = timed("agg squeeze", squeeze, st)

    @jax.jit
    def dec(blob_):
        per = jnp.moveaxis(blob_.reshape(N, g["block_ag"], G), 0, 2)
        al_t = xof_decode.decode_coeffs_lm(
            per.reshape(g["block_ag"], G * N), g["geom_ag"]
        )
        return al_t.T.reshape(G, N, d)

    al = timed("alpha decode", dec, blob)

    # --- lattice stage -------------------------------------------------------
    vks = jnp.asarray(
        rng.integers(-(q // 2), q // 2 + 1, size=(G, N, 2, d)).astype(np.int32)
    )
    c_hat_u = jnp.asarray(
        rng.integers(0, q, size=(B, d)).astype(np.uint32)
    )
    aggs = jnp.asarray(
        rng.integers(-(q // 2), q // 2 + 1, size=(G, params.rank, d)).astype(np.int32)
    )
    a_mont = F.to_mont(F.to_unsigned(jnp.asarray(params.public_challenge)))

    @jax.jit
    def lattice(vks_, c_hat_u_, al_, aggs_):
        vk_u = F.to_unsigned(vks_)
        c_u = c_hat_u_.reshape(G, N, d)
        alpha_u = ntt_fwd_u(params.plan, F.to_unsigned(al_))
        t = F.add_mod(F.mont_mul(F.to_mont(c_u), vk_u[..., 0, :]), vk_u[..., 1, :])
        target = F.sum_mod(F.mont_mul(F.to_mont(alpha_u), t), axis=-2)
        agg_u = F.to_unsigned(aggs_)
        observed = F.dot_mod(a_mont, agg_u, axis=-2)
        eq = jnp.all(target == observed, axis=-1)
        coef = F.to_centered(ntt_inv_u(params.plan, agg_u))
        norm = jnp.max(jnp.abs(coef), axis=(-2, -1))
        norm_ok = norm <= np.int32(min(params.beta_vf, 2**31 - 1))
        weight = jnp.max(jnp.sum((coef % np.int32(params.modulus)) != 0, axis=-1), axis=-1)
        weight_ok = weight <= np.int32(params.omega_vf)
        return eq, norm_ok, weight_ok

    timed("lattice stage", lattice, vks, c_hat_u, al, aggs)

    # --- composed production jits (the real thing) ---------------------------
    msgs = [f"group{k}:msg{i}" for k in range(G) for i in range(N)]
    pre_buf, pre_len = dp.prehash_digits(params, msgs)
    fn3, _ = dp._pipeline(params, N)
    pre_buf_j = jnp.asarray(pre_buf.reshape(G, N, -1))
    pre_len_j = jnp.asarray(pre_len.reshape(G, N))

    def e2e(vks_, aggs_):
        eq, norm_ok, weight_ok = fn3(vks_, pre_buf_j, pre_len_j, aggs_)
        return eq

    timed("composed signer+group+lattice", e2e, vks, aggs)


if __name__ == "__main__":
    main()
