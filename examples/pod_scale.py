#!/usr/bin/env python
"""Pod-scale configuration walkthrough (BASELINE.json configs 4 & 5).

Demonstrates the multi-chip wiring for the large configurations:
  * secpar=256 with 2^16 one-time keys sharded across a v5e-8 mesh (config 4);
  * a 2^20-signature workload as batched aggregation groups with psum-reduced
    aggregate signatures (config 5; multi-host runs add
    parallel.distributed.initialize() per host — shard_map code is unchanged).

Shapes default to a scaled-down smoke size so this also runs on the 8-device
CPU simulator:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/pod_scale.py
Pass --keys 65536 on real hardware.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=1024, help="total one-time keys (config 4: 65536)")
    ap.add_argument("--secpar", type=int, default=256)
    args = ap.parse_args()

    import jax

    from fusion_cryptography_tpu import fusion_setup
    from fusion_cryptography_tpu.parallel import make_mesh, sharded_lifecycle_step
    from fusion_cryptography_tpu.parallel.distributed import initialize

    initialize()  # no-op single-process; per-host bootstrap on a pod slice

    n_dev = len(jax.devices())
    mesh = make_mesh()  # (dp, tp) over all devices
    print(f"devices: {n_dev}, mesh: {dict(mesh.shape)}")

    params = fusion_setup(args.secpar, 42)
    step, prepare, rank_p = sharded_lifecycle_step(params, mesh)

    B = args.keys
    sk, c, al = prepare(B, seed=0)
    t0 = time.time()
    vk, agg, eq, norm_ok, w_ok = step(sk, c, al)
    vk.block_until_ready()
    print(f"first step (incl. compile): {time.time()-t0:.1f}s")
    t0 = time.time()
    vk, agg, eq, norm_ok, w_ok = step(sk, c, al)
    vk.block_until_ready()
    dt = time.time() - t0
    print(
        f"sharded keygen+sign+aggregate+verify for {B} keys: {dt*1e3:.1f} ms "
        f"({B/dt:.0f} keys/s across {n_dev} devices)"
    )
    assert bool(eq) and bool(norm_ok) and bool(w_ok)
    print("lifecycle verified:", bool(eq))


if __name__ == "__main__":
    main()
