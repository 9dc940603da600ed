#!/usr/bin/env python
"""Dependency-chained timings of the three verify pipeline stages plus the
lattice sub-pieces, at the production chunk shape (G=2048, N=4, B=8192).

Usage: python benchmarks/stage_lab.py [--groups 2048] [--signers 4]
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
    ap.add_argument("--secpar", type=int, default=256)
    args = ap.parse_args()

    import jax

    cache = Path(__file__).resolve().parents[1] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    import fusion_cryptography_tpu as ftpu
    from fusion_cryptography_tpu.ops.ntt import ntt_fwd_u, ntt_inv_u
    from fusion_cryptography_tpu.ops.keccak import (
        shake256_absorb_words, shake256_squeeze_words,
    )
    from fusion_cryptography_tpu.scheme import device_pipeline as dp
    from truebench import rate

    G, N = args.groups, args.signers
    B = G * N
    params = ftpu.fusion_setup(args.secpar, 42)
    plan = params.plan
    F = plan.field
    d = params.degree
    rank = params.rank
    rng = np.random.default_rng(11)
    q = params.modulus

    P = dp.get_pipeline(params, N)
    vks = jnp.asarray(rng.integers(-(q // 2), q // 2 + 1, size=(G, N, 2, d),
                                   dtype=np.int64).astype(np.int32))
    aggs = jnp.asarray(rng.integers(-(q // 2), q // 2 + 1, size=(G, rank, d),
                                    dtype=np.int64).astype(np.int32))
    c_hat_u = jnp.asarray(rng.integers(0, q, size=(B, d), dtype=np.int64
                                       ).astype(np.uint32))
    al = jnp.asarray(rng.integers(-1, 2, size=(G, N, d)).astype(np.int32))
    msgs = [f"g{i//N}:m{i%N}" for i in range(B)]
    pb, pl = P.prep(msgs)
    pbd = jnp.asarray(pb.reshape(G, N, -1))
    pld = jnp.asarray(pl.reshape(G, N))

    # signer stage: perturb vks with one bit of cc
    def f_signer(c):
        (v,) = c
        cc, ch, tb, tl = P.signer(v, pbd, pld)
        bump = (cc[:1, :1] & 1).astype(jnp.int32)[None, None]  # [1,1,1,1]
        return (v + bump,)

    per = rate(f_signer, (vks,), label=f"signer stage total (B={B})")
    print(f"  -> {per/G*1e6:.2f} us/group")

    cc0, ch0, tb0, tl0 = P.signer(vks, pbd, pld)

    def f_group(c):
        (tb,) = c
        al_ = P.group(tb.reshape(-1, G, N), tl0.reshape(G, N))
        return (tb + (al_[0, 0, 0] & 1).astype(jnp.uint32),)

    per = rate(f_group, (tb0,), label="group stage total")
    print(f"  -> {per/G*1e6:.2f} us/group")

    def f_lattice(c):
        (a,) = c
        eq, nk, wk = P.lattice(vks, ch0, al, a)
        # consume ALL outputs so the INTT/norm path is not dead-code-eliminated
        bump = (eq[0] ^ nk[0] ^ wk[0]).astype(jnp.int32)
        return (a + bump,)

    per = rate(f_lattice, (aggs,), label="lattice stage total")
    print(f"  -> {per/G*1e6:.2f} us/group")

    # lattice sub-pieces
    agg_u = F.to_unsigned(aggs)

    def f_intt(c):
        (a,) = c
        coef = ntt_inv_u(plan, a)
        return (coef,)

    per = rate(f_intt, (agg_u,), label=f"INTT [G, rank={rank}, d]")
    print(f"  -> {per/G*1e6:.2f} us/group")

    def f_norm(c):
        (a,) = c
        coef = F.to_centered(a)
        norm = jnp.max(jnp.abs(coef), axis=(-2, -1))
        weight = jnp.max(jnp.sum((coef % np.int32(q)) != 0, axis=-1), axis=-1)
        return (a + (norm[0] & 1).astype(jnp.uint32),)

    per = rate(f_norm, (agg_u,), label="norm/weight checks")
    print(f"  -> {per/G*1e6:.2f} us/group")

    from fusion_cryptography_tpu.ops.ntt import ntt_inv_u_mxu

    def f_intt_mxu(c):
        (a,) = c
        return (ntt_inv_u_mxu(plan, a),)

    per = rate(f_intt_mxu, (agg_u,), label=f"INTT via MXU limbs")
    print(f"  -> {per/G*1e6:.2f} us/group")

    def f_fwd_ntt(c):
        (a,) = c
        return (ntt_fwd_u(plan, a),)

    alu = F.to_unsigned(al.reshape(B, d))
    per = rate(f_fwd_ntt, (alu,), label=f"fwd NTT [B, d]")
    print(f"  -> {per/G*1e6:.2f} us/group")


if __name__ == "__main__":
    main()
