"""On-device fleet construction (keygen/sign/aggregate) vs the host lifecycle."""
import numpy as np

import jax.numpy as jnp

import fusion_cryptography_tpu as ftpu
from fusion_cryptography_tpu.scheme import device_setup as dset
from fusion_cryptography_tpu.scheme import lifecycle as lc


def test_fleet_matches_host_lifecycle(secpar=128, G=3, N=2, seed0=41):
    params = ftpu.fusion_setup(secpar, 7)

    # host path: keygen/sign through the object-free batched lifecycle
    keys = ftpu.keygen(params, [seed0 + k for k in range(G * N)])
    msgs = [f"m{g}:{i}" for g in range(G) for i in range(N)]
    sigs = ftpu.sign(params, keys, msgs)
    vk_np = keys.vk_np()
    reprs = keys.vk_strs()
    sig_np = np.asarray(sigs.sig)

    vks_d, msgs_d, aggs_d = dset.build_fleet(params, G, N, seed0=seed0, messages=msgs)
    vks_d, aggs_d = np.asarray(vks_d), np.asarray(aggs_d)

    order = np.empty((G, N), dtype=np.int64)
    for g in range(G):
        idx = list(range(g * N, (g + 1) * N))
        idx.sort(key=lambda i: reprs[i])
        order[g] = idx
    flat = order.reshape(-1)
    assert msgs_d == [msgs[i] for i in flat]
    assert np.array_equal(vks_d, vk_np[order])

    s_reprs = [reprs[i] for i in flat]
    s_msgs = [msgs[i] for i in flat]
    _, al = lc.derive_alphas_grouped(params, s_reprs, s_msgs, G, N)
    aggs_host = np.asarray(
        lc._ctx(params)["aggregate_core"](jnp.asarray(sig_np[order]), jnp.asarray(al))
    )
    assert np.array_equal(aggs_d, aggs_host)

    # and the fleet verifies through the scheme-layer verifier
    for g in range(G):
        ok, why = lc.verify(params, vks_d[g], s_msgs[g * N : (g + 1) * N], jnp.asarray(aggs_d[g]))
        assert ok, why


def test_fleet_256_small():
    params = ftpu.fusion_setup(256, 9)
    vks, msgs, aggs = dset.build_fleet(params, 2, 2, seed0=900)
    for g in range(2):
        ok, why = lc.verify(params, np.asarray(vks[g]), msgs[g * 2 : (g + 1) * 2], aggs[g])
        assert ok, why
