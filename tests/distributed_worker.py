"""Worker for the two-process jax.distributed test (test_distributed_multiprocess).

Each process owns 4 virtual CPU devices; the two processes form one
8-device mesh via a gRPC coordinator.  The worker runs the psum lifecycle
(parallel/sharded.py) over the global mesh with REAL hash-derived
coefficients and asserts bitwise equality against the single-device host
path computed locally.  Exit code 0 = success.

Usage: distributed_worker.py <coordinator addr> <num_processes> <process_id>
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import numpy as np


def main():
    addr, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=addr, num_processes=num_procs, process_id=pid
    )
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 4 * num_procs, len(jax.devices())

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import fusion_cryptography_tpu as ftpu
    from fusion_cryptography_tpu.parallel import prepare_real
    from fusion_cryptography_tpu.parallel.sharded import sharded_lifecycle_step
    from fusion_cryptography_tpu.scheme import lifecycle as lc

    params = ftpu.fusion_setup(256, 7)
    n_dev = len(jax.devices())
    tp = 2
    mesh = Mesh(np.array(jax.devices()).reshape(n_dev // tp, tp), ("dp", "tp"))
    step, _, rank_p = sharded_lifecycle_step(params, mesh)

    B = 8
    seeds = [300 + i for i in range(B)]
    msgs = [f"mp:{i}" for i in range(B)]
    sk, cc, al, keys, order = prepare_real(params, rank_p, seeds, msgs)

    # lift host data into globally-sharded arrays (each process materializes
    # only the shards its devices own)
    def gshard(x, spec):
        x = np.asarray(x)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    sk_g = gshard(sk, P("dp", None, "tp", None))
    cc_g = gshard(cc, P("dp", None))
    al_g = gshard(al, P("dp", None))

    vk, agg, eq, norm_ok, w_ok = step(sk_g, cc_g, al_g)

    # replicated scalars are addressable everywhere
    assert bool(np.asarray(eq)), "verify failed in multi-process run"
    assert bool(np.asarray(norm_ok)) and bool(np.asarray(w_ok))

    # dp-sharded vk: check every locally-addressable shard against the host
    # keygen path (sorted order)
    vk_ref = keys.vk_np()[np.array(order)]
    checked = 0
    for s in vk.addressable_shards:
        np.testing.assert_array_equal(np.asarray(s.data), vk_ref[s.index])
        checked += 1
    assert checked > 0

    # tp-sharded aggregate: every local shard vs the host aggregate path
    sigs = lc.sign(params, keys, msgs)
    agg_host = np.asarray(lc.aggregate(params, keys.vk_np(), msgs, sigs.sig))
    agg_ref = np.zeros((rank_p, params.degree), dtype=np.int32)
    agg_ref[: params.rank] = agg_host
    for s in agg.addressable_shards:
        np.testing.assert_array_equal(np.asarray(s.data), agg_ref[s.index])

    print(f"[proc {pid}] multi-process lifecycle parity OK", flush=True)


if __name__ == "__main__":
    main()
