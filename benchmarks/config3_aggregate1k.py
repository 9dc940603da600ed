#!/usr/bin/env python
"""BASELINE.json config 3: secpar=256 batched aggregate of 2^10 signatures,
single-chip NTT-domain verify.

One aggregation group with N=1024 signers (capacity at secpar=256 is 2818):
batched keygen + device-hash sign, host-pipeline alpha derivation for the
single giant group, NTT-domain aggregate sum and verify on the chip.

Usage: python benchmarks/config3_aggregate1k.py [--signers 1024]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--signers", type=int, default=1024)
    ap.add_argument("--secpar", type=int, default=256)
    args = ap.parse_args()

    import jax

    cache = Path(__file__).resolve().parents[1] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import fusion_cryptography_tpu as ftpu
    from fusion_cryptography_tpu.scheme import lifecycle as lc

    N = args.signers
    params = ftpu.fusion_setup(args.secpar, 42)
    assert N <= params.capacity, (N, params.capacity)
    msgs = [f"c3:{i}" for i in range(N)]

    t0 = time.time()
    keys = ftpu.keygen(params, list(range(1, N + 1)))
    sigs = ftpu.sign(params, keys, msgs)
    np.asarray(sigs.sig[:1, :1, :1])
    print(f"keygen+sign {N} keys: {time.time()-t0:.2f}s", flush=True)

    t0 = time.time()
    agg = ftpu.aggregate(params, keys.vk_np(), msgs, sigs.sig)
    agg_np = np.asarray(agg)
    print(f"aggregate of {N} signatures: {time.time()-t0:.2f}s "
          f"(one rank x d tensor, {agg_np.nbytes} bytes)", flush=True)

    t0 = time.time()
    ok, why = ftpu.verify(params, keys.vk_np(), msgs, agg)
    print(f"verify N={N}: ok={ok} in {time.time()-t0:.2f}s", flush=True)
    assert ok, why

    # tamper check: any coefficient perturbation must fail
    bad = agg_np.copy()
    bad[0, 0] += 1
    ok2, why2 = ftpu.verify(params, keys.vk_np(), msgs, bad)
    assert not ok2 and why2, "tampered aggregate must fail"
    print(f"tamper rejected: {why2!r}")


if __name__ == "__main__":
    main()
