#!/usr/bin/env python
"""Per-operation benchmark sweep, mirroring the reference harness's design
(/root/reference/benchmarks/benchmarks.py:15-18, :37-126: secpar in {128, 256},
aggregation sizes 2..32 doubling, per-op mean/median wall-clock) but measuring
the batched tensor pipeline, with per-op amortized costs at batch size B.

Writes a human-readable summary (and a JSON dump) to benchmarks_output/.
Run on TPU:  python benchmarks/benchmarks.py
Run on CPU:  JAX_PLATFORMS=cpu python benchmarks/benchmarks.py --cpu
"""
import argparse
import json
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo-root import


def _rss_mib() -> float:
    """Resident set size in MiB (reference harness parity: the reference
    records memory_profiler RSS per op, benchmarks.py:25-34).  Reads
    /proc/self/statm — no external dependency."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        import resource  # page size via os.sysconf is equivalent; keep stdlib

        return pages * (resource.getpagesize() / (1024 * 1024))
    except Exception:
        return float("nan")


def timeit(fn, reps=3):
    ts = []
    rss0 = _rss_mib()
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return {
        "mean": statistics.mean(ts),
        "median": statistics.median(ts),
        "min": min(ts),
        "rss_mib": round(_rss_mib(), 1),
        "rss_delta_mib": round(_rss_mib() - rss0, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--secpars", type=int, nargs="*", default=[128, 256])
    ap.add_argument("--agg-sizes", type=int, nargs="*", default=[2, 4, 8, 16, 32])
    ap.add_argument("--out", default=str(Path(__file__).parent / "benchmarks_output"))
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    import fusion_cryptography_tpu as ftpu
    from fusion_cryptography_tpu.scheme import lifecycle as lc

    results = {}
    B = args.batch
    for secpar in args.secpars:
        params = ftpu.fusion_setup(secpar, 42)
        entry = {}

        t = timeit(lambda: ftpu.fusion_setup(secpar, 123), reps=3)
        entry["fusion_setup"] = t

        seeds = list(range(1, B + 1))
        keys = ftpu.keygen(params, seeds)  # warm (includes jit compile)
        t = timeit(lambda: ftpu.keygen(params, seeds), reps=3)
        entry[f"keygen_batch{B}"] = {**t, "per_key_ms": t["min"] / B * 1e3}

        msgs = [f"msg{i}" for i in range(B)]
        sigs = ftpu.sign(params, keys, msgs)
        t = timeit(lambda: ftpu.sign(params, keys, msgs), reps=3)
        entry[f"sign_batch{B}"] = {**t, "per_sig_ms": t["min"] / B * 1e3}

        for n in args.agg_sizes:
            vks = keys.vk_np()[:n]
            m = msgs[:n]
            sg = sigs.sig[:n]
            agg = ftpu.aggregate(params, vks, m, sg)  # warm
            t = timeit(lambda: ftpu.aggregate(params, vks, m, sg), reps=3)
            entry[f"aggregate_N{n}"] = t
            ok, why = ftpu.verify(params, vks, m, agg)
            assert ok, why
            t = timeit(lambda: ftpu.verify(params, vks, m, agg), reps=3)
            entry[f"verify_N{n}"] = t

        results[secpar] = entry
        print(f"[{secpar}] " + json.dumps({k: round(v['min'], 4) if isinstance(v, dict) and 'min' in v else v
                                           for k, v in entry.items()}, default=str),
              file=sys.stderr)

    out_dir = Path(args.out)
    out_dir.mkdir(exist_ok=True)
    with open(out_dir / "benchmark_summary.json", "w") as f:
        json.dump(results, f, indent=2)
    lines = ["Fusion-TPU benchmark summary", "=" * 40]
    for secpar, entry in results.items():
        lines.append(f"secpar={secpar}")
        for op, t in entry.items():
            lines.append(f"  {op:24s} min={t['min']*1e3:9.2f} ms  mean={t['mean']*1e3:9.2f} ms")
    (out_dir / "benchmark_summary.txt").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
