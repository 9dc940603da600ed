"""Whole-verify-on-device pipeline vs the host hash pipeline (bit-exactness)."""
import numpy as np
import pytest

import jax.numpy as jnp

import fusion_cryptography_tpu as ftpu
from fusion_cryptography_tpu.scheme import device_pipeline as dp
from fusion_cryptography_tpu.scheme import lifecycle as lc


def _build_groups(params, G, N, seed0=100):
    keys = ftpu.keygen(params, [seed0 + k for k in range(G * N)])
    msgs = [f"m{g}:{i}" for g in range(G) for i in range(N)]
    sigs = ftpu.sign(params, keys, msgs)
    vk_np = keys.vk_np()
    reprs = keys.vk_strs()
    order = np.empty((G, N), dtype=np.int64)
    for g in range(G):
        idx = list(range(g * N, (g + 1) * N))
        idx.sort(key=lambda i: reprs[i])
        order[g] = idx
    flat = order.reshape(-1)
    s_reprs = [reprs[i] for i in flat]
    s_msgs = [msgs[i] for i in flat]
    cc, al = lc.derive_alphas_grouped(params, s_reprs, s_msgs, G, N)
    sig_np = np.asarray(sigs.sig)
    aggs = lc._ctx(params)["aggregate_core"](jnp.asarray(sig_np[order]), jnp.asarray(al))
    return vk_np[order], s_msgs, np.asarray(aggs), cc, al


@pytest.mark.parametrize("secpar,G,N", [(128, 3, 4), (256, 2, 3)])
@pytest.mark.fast
@pytest.mark.smoke
def test_device_pipeline_matches_host(secpar, G, N):
    params = ftpu.fusion_setup(secpar, 77)
    vks, msgs, aggs, cc_host, al_host = _build_groups(params, G, N)
    eq, norm_ok, w_ok, cc_dev, al_dev = dp.derive_coeffs_device(params, vks, msgs, aggs)
    assert np.array_equal(np.asarray(cc_dev).reshape(G, N, -1), cc_host)
    assert np.array_equal(np.asarray(al_dev), al_host)
    assert bool(np.all(np.asarray(eq))), "valid aggregates must verify on device"
    assert bool(np.all(np.asarray(norm_ok))) and bool(np.all(np.asarray(w_ok)))


def test_device_pipeline_rejects_tampered(secpar=128):
    params = ftpu.fusion_setup(secpar, 99)
    vks, msgs, aggs, _, _ = _build_groups(params, 2, 2, seed0=500)
    bad = aggs.copy()
    bad[1, 0, 0] = (bad[1, 0, 0] + 1) % params.modulus
    eq, _, _ = dp.verify_batch_device(params, vks, msgs, bad)
    eq = np.asarray(eq)
    assert bool(eq[0]) and not bool(eq[1])


def test_device_pipeline_staged_matches_unchunked(secpar=128):
    # G=6 > group_chunk=2 triggers the decoupled staged path in
    # verify_batch_device: signer/lattice in 2-group launches, the group hash
    # over group_hash_chunk=4 then a remainder of 2 — verdicts must equal the
    # one-launch path bit-exactly
    params = ftpu.fusion_setup(secpar, 41)
    G, N = 6, 2
    vks, msgs, aggs, _, _ = _build_groups(params, G, N, seed0=1300)
    bad = aggs.copy()
    bad[3, 0, 0] = (bad[3, 0, 0] + 1) % params.modulus
    eq1, n1, w1 = dp.verify_batch_device(
        params, vks, msgs, bad, group_chunk=2, group_hash_chunk=4
    )
    eq0, n0, w0 = dp.verify_batch_device(
        params, vks, msgs, bad, group_chunk=64
    )
    np.testing.assert_array_equal(np.asarray(eq1), np.asarray(eq0))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n0))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w0))
    assert not bool(np.asarray(eq1)[3]) and bool(np.asarray(eq1)[0])


def test_fused_modes_agree(secpar=128, monkeypatch=None):
    # FUSION_FUSED_MODE=all (one launch) / hash (fused hash + per-chunk
    # lattice) / off (round-4 per-chunk launches) must agree bitwise; the
    # fused path exercises the in-graph layout-constrained transposes
    params = ftpu.fusion_setup(secpar, 43)
    G, N = 4, 2
    vks, msgs, aggs, _, _ = _build_groups(params, G, N, seed0=2100)
    bad = aggs.copy()
    bad[2, 0, 0] = (bad[2, 0, 0] + 1) % params.modulus
    import os

    outs = {}
    for mode in ("all", "hash", "off"):
        os.environ["FUSION_FUSED_MODE"] = mode
        try:
            outs[mode] = tuple(
                np.asarray(x)
                for x in dp.verify_batch_device(
                    params, vks, msgs, bad, group_chunk=2
                )
            )
        finally:
            os.environ.pop("FUSION_FUSED_MODE", None)
    for mode in ("hash", "off"):
        for a, b in zip(outs["all"], outs[mode]):
            np.testing.assert_array_equal(a, b)
    assert not bool(outs["all"][0][2]) and bool(outs["all"][0][0])


def test_device_pipeline_chunked_paths(secpar=128):
    # group_chunk=2 with G=5 forces two full launches plus a remainder launch
    # (_launch_chunks -> [(0,2),(2,4),(4,5)]); results must concatenate to the
    # unchunked verdicts bit-exactly
    params = ftpu.fusion_setup(secpar, 31)
    G, N = 5, 2
    vks, msgs, aggs, cc_host, al_host = _build_groups(params, G, N, seed0=900)
    assert dp._launch_chunks(G, 2) == [(0, 2), (2, 4), (4, 5)]
    eq, _, _, cc_dev, al_dev = dp.derive_coeffs_device(
        params, vks, msgs, aggs, group_chunk=2
    )
    assert np.array_equal(np.asarray(cc_dev).reshape(G, N, -1), cc_host)
    assert np.array_equal(np.asarray(al_dev), al_host)
    assert bool(np.all(np.asarray(eq)))
