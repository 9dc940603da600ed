#!/usr/bin/env python
"""One-process TPU experiment sweep: kernel microbenches + pipeline breakdown.

Runs everything in a single process so remote-TPU init and compiles are paid
once.  Prints a JSON summary at the end.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def t_best(fn, reps=5):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax

    cache_dir = Path(__file__).resolve().parent.parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    import fusion_cryptography_tpu as ftpu
    from fusion_cryptography_tpu import native
    from fusion_cryptography_tpu.ops.field import Q
    from fusion_cryptography_tpu.ops.ntt import make_plan, ntt_fwd
    from fusion_cryptography_tpu.ops.ntt_pallas import ntt_fwd_pallas
    from fusion_cryptography_tpu.scheme import lifecycle as lc

    out = {"device": str(jax.devices()[0]), "native": native.available()}
    log = lambda *a: print("[exp]", *a, file=sys.stderr, flush=True)
    log("device:", out["device"])

    # ---------- NTT microbench: jnp stage-sweep vs pallas ----------
    plan = make_plan(Q, 256, 3337519)
    rng = np.random.default_rng(0)
    for B in (4096, 65536):
        x = jnp.asarray(rng.integers(-(Q // 2), Q // 2, size=(B, 256), dtype=np.int64).astype(np.int32))
        dt = t_best(lambda: ntt_fwd(plan, x).block_until_ready())
        out[f"ntt_jnp_B{B}_ms"] = round(dt * 1e3, 3)
        out[f"ntt_jnp_B{B}_Mpolys_s"] = round(B / dt / 1e6, 2)
        log(f"ntt jnp B={B}: {dt*1e3:.3f} ms ({B/dt/1e6:.2f}M/s)")
        for tile in (256, 512):
            try:
                dtp = t_best(lambda: ntt_fwd_pallas(plan, x, tile=tile).block_until_ready())
                out[f"ntt_pallas_B{B}_t{tile}_ms"] = round(dtp * 1e3, 3)
                log(f"ntt pallas B={B} tile={tile}: {dtp*1e3:.3f} ms ({B/dtp/1e6:.2f}M/s)")
            except Exception as e:
                out[f"ntt_pallas_B{B}_t{tile}_error"] = str(e)[:200]
                log(f"ntt pallas B={B} tile={tile} FAILED: {e}")

    # ---------- grouped verify: device-only at several G ----------
    params = ftpu.fusion_setup(256, 42)
    ctx = lc._ctx(params)
    N = 4
    for G in (256, 2048):
        rank, d = params.rank, params.degree
        aggs = jnp.asarray(rng.integers(-(2**30), 2**30, size=(G, rank, d)).astype(np.int32))
        vks = jnp.asarray(rng.integers(-(2**30), 2**30, size=(G, N, 2, d)).astype(np.int32))
        cc = jnp.asarray(rng.integers(-1, 2, size=(G, N, d)).astype(np.int32))
        al = jnp.asarray(rng.integers(-1, 2, size=(G, N, d)).astype(np.int32))
        dt = t_best(lambda: ctx["verify_core"](aggs, vks, cc, al)[0].block_until_ready())
        out[f"verify_device_G{G}_ms"] = round(dt * 1e3, 3)
        out[f"verify_device_G{G}_vps"] = round(G / dt, 1)
        log(f"verify device G={G}: {dt*1e3:.2f} ms -> {G/dt:.0f} verifies/s")

    # ---------- host pipeline breakdown for one e2e batch ----------
    G = 256
    keys = ftpu.keygen(params, list(range(1, G * N + 1)))
    msgs = [f"g{g}:m{i}" for g in range(G) for i in range(N)]
    t0 = time.perf_counter()
    vk_reprs = keys.vk_strs()
    out["host_vk_serialize_s"] = round(time.perf_counter() - t0, 3)
    order = np.arange(G * N).reshape(G, N)
    for g in range(G):
        order[g] = sorted(order[g], key=lambda i: vk_reprs[i])
    flat = order.reshape(-1)
    s_reprs = [vk_reprs[i] for i in flat]
    s_msgs = [msgs[i] for i in flat]

    # challenge sweep (native)
    from fusion_cryptography_tpu.scheme.lifecycle import _challenges_for, _agg_alpha_coeffs
    dt = t_best(lambda: _challenges_for(params, s_reprs, s_msgs), reps=3)
    out["host_challenges_1024_s"] = round(dt, 3)
    log(f"challenge sweep (1024 items): {dt*1e3:.1f} ms")

    pre, cc_np = _challenges_for(params, s_reprs, s_msgs)
    c_hat_dev = ctx["field"].to_centered(
        __import__("fusion_cryptography_tpu.ops.ntt", fromlist=["ntt_fwd_u"]).ntt_fwd_u(
            ctx["plan"], ctx["field"].to_unsigned(jnp.asarray(cc_np))
        )
    )
    c_hat = np.asarray(c_hat_dev)
    from fusion_cryptography_tpu.interop import serial
    dt = t_best(lambda: [serial.challenge_str(params, c_hat[i]) for i in range(G * N)], reps=3)
    out["host_chall_reprs_s"] = round(dt, 3)
    log(f"challenge reprs (1024): {dt*1e3:.1f} ms")
    chall_reprs = [serial.challenge_str(params, c_hat[i]) for i in range(G * N)]

    def agg_hash_all():
        for g in range(G):
            sl = slice(g * N, (g + 1) * N)
            _agg_alpha_coeffs(params, s_reprs[sl], pre[sl], chall_reprs[sl])

    dt = t_best(agg_hash_all, reps=3)
    out["host_agg_xof_s"] = round(dt, 3)
    log(f"agg XOF+decode (256 groups): {dt*1e3:.1f} ms")

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
