#!/usr/bin/env python
"""Profile the PRODUCTION device-pipeline stages (j_signer / j_group /
j_lattice from scheme/device_pipeline._pipeline) with host-pull syncs —
``block_until_ready`` does not synchronize on this remote-TPU platform, so
each timed section ends by pulling one element of every stage output.

Usage: python benchmarks/stage_profile.py [--groups G] [--signers N] [--secpar S]
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
    from fusion_cryptography_tpu.scheme import device_setup as dset

    G, N = args.groups, args.signers
    params = ftpu.fusion_setup(args.secpar, 42)
    d = params.degree

    t0 = time.time()
    vks, msgs, aggs = dset.build_fleet(params, G, N, seed0=1)
    _ = np.asarray(jnp.asarray(aggs)[:1, :1, :1])
    print(f"fleet build: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    pre_buf, pre_len = dp.prehash_digits(params, msgs)
    pre_buf = jnp.asarray(pre_buf.reshape(G, N, -1))
    pre_len = jnp.asarray(pre_len.reshape(G, N))
    vks = jnp.asarray(vks)
    aggs = jnp.asarray(aggs)

    # Rebuild the exact production stage jits
    import types

    plan = params.plan
    F = plan.field
    fn3, fn5 = dp._pipeline(params, N)

    # grab the internal stage jits by re-creating them (the lru_cache closure
    # hides them); cheaper: time the composed fn but insert pulls via
    # derive_coeffs_device outputs.  Instead: time each j_* via make_stages.
    signer_stage, group_stage = dp.make_stages(params, N, False)

    @jax.jit
    def j_signer(vks, pre_buf, pre_len):
        B = vks.shape[0] * N
        vk2d_t = vks.reshape(B, 2 * d).T
        return signer_stage(vk2d_t, pre_buf.reshape(B, -1).T, pre_len.reshape(B))

    @jax.jit
    def j_group(tbuf, tlen):
        return group_stage(tbuf, tlen)

    def pull(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    def timed(name, fn, *a):
        out = fn(*a)  # warm/compile
        pull(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            out = fn(*a)
            pull(out)
            ts.append(time.time() - t0)
        dt = min(ts)
        print(f"{name:50s} {dt*1e3:9.2f} ms  ({dt/G*1e6:7.2f} us/group)",
              file=sys.stderr, flush=True)
        return out

    cc, c_hat_u, tbuf, tlen = timed("signer stage (ch preimage+XOF+decode+NTT+tri)",
                                    j_signer, vks, pre_buf, pre_len)
    al = timed("group stage (agg preimage+XOF+alpha decode)",
               j_group, tbuf.reshape(-1, G, N), tlen.reshape(G, N))

    a_mont = F.to_mont(F.to_unsigned(jnp.asarray(params.public_challenge)))

    @jax.jit
    def j_lattice(vks, c_hat_u, al, aggs):
        vk_u = F.to_unsigned(vks)
        c_u = c_hat_u.reshape(G, N, d)
        from fusion_cryptography_tpu.ops.ntt import ntt_fwd_u, ntt_inv_u

        alpha_u = ntt_fwd_u(plan, F.to_unsigned(al))
        t = F.add_mod(F.mont_mul(F.to_mont(c_u), vk_u[..., 0, :]), vk_u[..., 1, :])
        target = F.sum_mod(F.mont_mul(F.to_mont(alpha_u), t), axis=-2)
        agg_u = F.to_unsigned(aggs)
        observed = F.dot_mod(a_mont, agg_u, axis=-2)
        eq = jnp.all(target == observed, axis=-1)
        coef = F.to_centered(ntt_inv_u(plan, agg_u))
        norm = jnp.max(jnp.abs(coef), axis=(-2, -1))
        norm_ok = norm <= np.int32(min(params.beta_vf, 2**31 - 1))
        weight = jnp.max(jnp.sum((coef % np.int32(params.modulus)) != 0, axis=-1), axis=-1)
        return eq, norm_ok, weight <= np.int32(params.omega_vf)

    timed("lattice stage (NTTs + target/observed + norm)",
          j_lattice, vks, c_hat_u, al, aggs)

    # full composed pipeline for reference
    def full():
        return fn3(vks, pre_buf, pre_len, aggs)

    timed("FULL pipeline (all three stages)", full)


if __name__ == "__main__":
    main()
