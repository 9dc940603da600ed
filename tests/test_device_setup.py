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


def test_vk_sort_ranks_matches_host_sort():
    """Device sort ranks == the reference's stable sorted(key=str(vk)) order,
    including groups with duplicate vks (stability tie-break) and adversarial
    prefix-render pairs."""
    from fusion_cryptography_tpu.interop import serial

    params = ftpu.fusion_setup(128, 5)
    G, N = 6, 5
    # seeds with a duplicate inside group 0 (identical vk reprs)
    seeds = [100 + k for k in range(G * N)]
    seeds[1] = seeds[0]
    keys = ftpu.keygen(params, seeds)
    vk_np = keys.vk_np()  # [B, 2, d]
    reprs = keys.vk_strs()

    ranks = np.asarray(dset.vk_sort_ranks(params, jnp.asarray(vk_np), N))
    assert ranks.shape == (G, N)
    for g in range(G):
        idx = list(range(g * N, (g + 1) * N))
        idx.sort(key=lambda i: reprs[i])  # Python sort: stable
        want_order = [i - g * N for i in idx]
        got_order = list(np.argsort(ranks[g], kind="stable"))
        assert got_order == want_order, (g, got_order, want_order)


def test_number_terminators_cover_vk_spec():
    from fusion_cryptography_tpu.interop import device_serial as ds

    for secpar in (128, 256):
        params = ftpu.fusion_setup(secpar, 3)
        spec = ds.vk_body_spec(params)
        terms = ds.number_terminators(spec)
        d = params.degree
        assert len(terms) == 2 * d
        # within each poly body: ',' after all but the last value, ']' last
        assert all(terms[k] == ord(",") for k in range(d - 1))
        assert terms[d - 1] == ord("]")
        assert all(terms[d + k] == ord(",") for k in range(d - 1))
        assert terms[2 * d - 1] == ord("]")
