#!/usr/bin/env python
"""Microbenchmark: the all-on-device verify pipeline (scheme/device_pipeline).

Measures grouped verify throughput where the ONLY host work is SHA3 message
prehash (78-byte digit strings); every XOF, decode, NTT, and lattice op runs
in one jit on the chip.  Compare against bench.py's host-hashing e2e path.

Usage: python benchmarks/devpipe_bench.py [--groups G] [--signers N] [--secpar S]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(m):
    print(f"[devpipe] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=2048)
    ap.add_argument("--signers", type=int, default=4)
    ap.add_argument("--secpar", type=int, default=256)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--group-chunk", type=int, default=4096)
    args = ap.parse_args()

    import jax

    cache_dir = Path(__file__).resolve().parents[1] / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    import fusion_cryptography_tpu as ftpu
    from fusion_cryptography_tpu.scheme import lifecycle as lc
    from fusion_cryptography_tpu.scheme import device_pipeline as dp

    G, N = args.groups, args.signers
    params = ftpu.fusion_setup(args.secpar, 42)
    log(f"device: {jax.devices()[0]}  G={G} N={N} secpar={args.secpar}")

    # ---- build G aggregate groups (not timed) -----------------------------
    t0 = time.time()
    msgs = [f"group{g}:msg{i}" for g in range(G) for i in range(N)]
    total = G * N
    chunk = min(total, 2048)
    vk_parts, sig_parts, repr_parts = [], [], []
    for lo in range(0, total, chunk):
        seeds = [lo + 1 + k for k in range(chunk)]
        m = (msgs[lo : lo + chunk] + ["pad"] * chunk)[:chunk]
        keys = ftpu.keygen(params, seeds)
        sigs = ftpu.sign(params, keys, m)
        take = min(chunk, total - lo)
        vk_parts.append(keys.vk_np()[:take])
        sig_parts.append(np.asarray(sigs.sig)[:take])
        repr_parts.extend(keys.vk_strs()[:take])
        del keys, sigs
    vk_np = np.concatenate(vk_parts)
    sig_np = np.concatenate(sig_parts)
    log(f"keygen+sign {total} keys: {time.time()-t0:.1f}s")

    t0 = time.time()
    order = np.empty((G, N), dtype=np.int64)
    for g in range(G):
        idx = list(range(g * N, (g + 1) * N))
        idx.sort(key=lambda i: repr_parts[i])
        order[g] = idx
    flat = order.reshape(-1)
    s_reprs = [repr_parts[i] for i in flat]
    s_msgs = [msgs[i] for i in flat]
    cc, al = lc.derive_alphas_grouped(params, s_reprs, s_msgs, G, N)
    aggs_dev = lc._ctx(params)["aggregate_core"](jnp.asarray(sig_np[order]), jnp.asarray(al))
    aggs = np.asarray(aggs_dev)
    grouped_vks = np.asarray(vk_np[order])  # [G, N, 2, d]
    log(f"host aggregate setup: {time.time()-t0:.1f}s")

    # ---- device pipeline ---------------------------------------------------
    kw = dict(group_chunk=args.group_chunk)
    t0 = time.time()
    eq, nok, wok = dp.verify_batch_device(params, grouped_vks, s_msgs, aggs, **kw)
    np.asarray(eq)  # host pull: block_until_ready does not sync on this platform
    log(f"warm (incl. compile): {time.time()-t0:.1f}s")
    assert bool(np.all(np.asarray(eq))), "device pipeline verify failed"
    assert bool(np.all(np.asarray(nok))) and bool(np.all(np.asarray(wok)))

    # steady state: enqueue reps batches, sync at the end (host prehash
    # overlaps device execution through async dispatch)
    t0 = time.time()
    pend = [dp.verify_batch_device(params, grouped_vks, s_msgs, aggs, **kw)[0]
            for _ in range(args.reps)]
    for e in pend:
        assert bool(np.all(np.asarray(e)))  # host pull = the only real sync here
    dt = (time.time() - t0) / args.reps
    log(f"{G} grouped verifies in {dt:.3f}s steady-state")
    print(f"device_pipeline_verifies_per_s={G/dt:.1f}  secpar={args.secpar} N={N} G={G}")


if __name__ == "__main__":
    main()
