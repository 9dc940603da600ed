"""Lifecycle tests for the batched tensor API (mirrors the reference's
integration strategy, tests/test_fusion.py:762-873: full lifecycle, tamper
checks, reason strings, capacity/length guards)."""
import numpy as np
import jax.numpy as jnp
import pytest

import fusion_cryptography_tpu as ftpu
from fusion_cryptography_tpu.scheme import lifecycle as lc


@pytest.fixture(scope="module")
def params128():
    return ftpu.fusion_setup(128, 42)


@pytest.fixture(scope="module")
def setup128(params128):
    params = params128
    keys = ftpu.keygen(params, [7, 1000, 999999, 5])
    msgs = ["alpha", "beta", "gamma", "delta"]
    sigs = ftpu.sign(params, keys, msgs)
    return params, keys, msgs, sigs


def test_keygen_shapes(setup128):
    params, keys, _, sigs = setup128
    assert keys.sk_hat.shape == (4, 2, params.rank, params.degree)
    assert keys.vk.shape == (4, 2, params.degree)
    assert sigs.sig.shape == (4, params.rank, params.degree)


def test_keygen_rank_entries_identical(setup128):
    """Int-seed quirk: every rank entry of sk is the same polynomial
    (reference per-entry reseed, SURVEY §2.13)."""
    _, keys, _, _ = setup128
    sk = np.asarray(keys.sk_hat)
    assert np.all(sk == sk[:, :, :1, :])


def test_keygen_none_seed_rejected(params128):
    with pytest.raises(TypeError):
        ftpu.keygen(params128, [None])


def test_sign_satisfies_lattice_equation(setup128):
    """A·sig == vk_left·c + vk_right for each signature (the structural check
    behind reference tests/test_fusion.py:694-731)."""
    params, keys, msgs, sigs = setup128
    ctx = lc._ctx(params)
    F = ctx["field"]
    vk_reprs = keys.vk_strs()
    for k in range(len(keys)):
        _, c = lc._challenge_coeffs(params, vk_reprs[k], msgs[k])
        from fusion_cryptography_tpu.ops.ntt import ntt_fwd_u

        c_hat = ntt_fwd_u(ctx["plan"], F.to_unsigned(jnp.asarray(c)))
        sig_u = F.to_unsigned(sigs.sig[k])
        observed = F.dot_mod(ctx["a_mont"], sig_u, axis=0)
        vk_u = F.to_unsigned(keys.vk[k])
        expected = F.add_mod(F.mont_mul(F.to_mont(c_hat), vk_u[0]), vk_u[1])
        assert np.array_equal(np.asarray(observed), np.asarray(expected))


def test_full_lifecycle_verifies(setup128):
    params, keys, msgs, sigs = setup128
    agg = ftpu.aggregate(params, keys.vk_np(), msgs, sigs.sig)
    ok, why = ftpu.verify(params, keys.vk_np(), msgs, agg)
    assert ok and why == ""


def test_subset_sizes(params128):
    """Lifecycle with 1..4 signers (mirrors reference tests/test_fusion.py:812-873)."""
    params = params128
    keys = ftpu.keygen(params, [11, 22, 33, 44])
    msgs = ["a", "b", "c", "d"]
    sigs = ftpu.sign(params, keys, msgs)
    for n in range(1, 5):
        agg = ftpu.aggregate(params, keys.vk_np()[:n], msgs[:n], sigs.sig[:n])
        ok, why = ftpu.verify(params, keys.vk_np()[:n], msgs[:n], agg)
        assert ok, f"n={n}: {why}"


def test_tamper_detection(setup128):
    """Any single-coefficient perturbation must fail verification."""
    params, keys, msgs, sigs = setup128
    agg = np.asarray(ftpu.aggregate(params, keys.vk_np(), msgs, sigs.sig)).copy()
    rng = np.random.default_rng(0)
    for _ in range(3):
        bad = agg.copy()
        i = rng.integers(0, bad.shape[0])
        j = rng.integers(0, bad.shape[1])
        bad[i, j] += 1
        ok, why = ftpu.verify(params, keys.vk_np(), msgs, jnp.asarray(bad))
        assert not ok
        assert why == lc.REASON_TARGET


def test_wrong_message_fails(setup128):
    params, keys, msgs, sigs = setup128
    agg = ftpu.aggregate(params, keys.vk_np(), msgs, sigs.sig)
    bad_msgs = list(msgs)
    bad_msgs[0] = "tampered"
    ok, why = ftpu.verify(params, keys.vk_np(), bad_msgs, agg)
    assert not ok and why == lc.REASON_TARGET


def test_guard_reasons(setup128):
    params, keys, msgs, sigs = setup128
    agg = ftpu.aggregate(params, keys.vk_np(), msgs, sigs.sig)
    ok, why = ftpu.verify(params, keys.vk_np(), msgs[:-1], agg)
    assert not ok and why == lc.REASON_LEN_MISMATCH
    # capacity guard: fake an oversized key list view
    big_vks = np.repeat(keys.vk_np(), (params.capacity // 4) + 1, axis=0)
    ok, why = ftpu.verify(params, big_vks, ["m"] * len(big_vks), agg)
    assert not ok and why == lc.REASON_TOO_MANY


def test_aggregation_order_invariance(setup128):
    """aggregate/verify sort by str(vk) internally, so caller order must not
    matter (reference fusion.py:661-663, :693)."""
    params, keys, msgs, sigs = setup128
    agg1 = np.asarray(ftpu.aggregate(params, keys.vk_np(), msgs, sigs.sig))
    perm = [2, 0, 3, 1]
    agg2 = np.asarray(
        ftpu.aggregate(
            params, keys.vk_np()[perm], [msgs[i] for i in perm], sigs.sig[np.array(perm)]
        )
    )
    assert np.array_equal(agg1, agg2)
    ok, _ = ftpu.verify(params, keys.vk_np()[perm], [msgs[i] for i in perm], jnp.asarray(agg1))
    assert ok


def test_verify_batch_grouped(params128):
    """Grouped verify path used by the benchmark: G independent aggregates."""
    params = params128
    G, N = 3, 2
    all_vks, all_cc, all_al, all_aggs = [], [], [], []
    for g in range(G):
        keys = ftpu.keygen(params, [100 * g + 1, 100 * g + 2])
        msgs = [f"g{g}m{i}" for i in range(N)]
        sigs = ftpu.sign(params, keys, msgs)
        vk_reprs = keys.vk_strs()
        order = sorted(range(N), key=lambda i: vk_reprs[i])
        s_reprs = [vk_reprs[i] for i in order]
        s_msgs = [msgs[i] for i in order]
        _, cc, al = lc.derive_alphas(params, s_reprs, s_msgs)
        agg = lc._ctx(params)["aggregate_core"](
            jnp.asarray(np.asarray(sigs.sig)[np.array(order)]), jnp.asarray(al)
        )
        all_vks.append(keys.vk_np()[np.array(order)])
        all_cc.append(cc)
        all_al.append(al)
        all_aggs.append(np.asarray(agg))
    eq, norm_ok, w_ok = ftpu.verify_batch(
        params,
        jnp.asarray(np.stack(all_vks)),
        jnp.asarray(np.stack(all_cc)),
        jnp.asarray(np.stack(all_al)),
        jnp.asarray(np.stack(all_aggs)),
    )
    assert np.all(np.asarray(eq)) and np.all(np.asarray(norm_ok)) and np.all(np.asarray(w_ok))


def test_lifecycle_256():
    params = ftpu.fusion_setup(256, 99)
    keys = ftpu.keygen(params, [1, 2])
    msgs = ["x", "y"]
    sigs = ftpu.sign(params, keys, msgs)
    agg = ftpu.aggregate(params, keys.vk_np(), msgs, sigs.sig)
    ok, why = ftpu.verify(params, keys.vk_np(), msgs, agg)
    assert ok, why


def test_verify_many_ragged(params128):
    """verify_many: mixed signer counts, guard failures and tampering in one
    batched call."""
    params = params128
    keys = ftpu.keygen(params, [201, 202, 203, 204, 205])
    msgs = ["m1", "m2", "m3", "m4", "m5"]
    sigs = ftpu.sign(params, keys, msgs)
    vk = keys.vk_np()
    sg = np.asarray(sigs.sig)
    agg2 = np.asarray(ftpu.aggregate(params, vk[:2], msgs[:2], sigs.sig[:2]))
    agg3 = np.asarray(ftpu.aggregate(params, vk[2:], msgs[2:], sigs.sig[2:]))
    bad = agg3.copy()
    bad[0, 0] += 1
    groups = [
        (vk[:2], msgs[:2], agg2),              # valid, N=2
        (vk[2:], msgs[2:], agg3),              # valid, N=3
        (vk[2:], msgs[2:], bad),               # tampered
        (vk[:2], ["m1"], agg2),                # length mismatch
    ]
    out = lc.verify_many(params, groups)
    assert out[0] == (True, "")
    assert out[1] == (True, "")
    assert out[2] == (False, lc.REASON_TARGET)
    assert out[3] == (False, lc.REASON_LEN_MISMATCH)


def test_verify_many_device_bucket_path(params128):
    """verify_many with device_bucket_threshold=1 routes every bucket through
    the all-on-device hash pipeline — same verdicts as the host path."""
    params = params128
    keys = ftpu.keygen(params, [301, 302, 303, 304, 305])
    msgs = ["a1", "a2", "a3", "a4", "a5"]
    sigs = ftpu.sign(params, keys, msgs)
    vk = keys.vk_np()
    agg2 = np.asarray(ftpu.aggregate(params, vk[:2], msgs[:2], sigs.sig[:2]))
    agg3 = np.asarray(ftpu.aggregate(params, vk[2:], msgs[2:], sigs.sig[2:]))
    bad = agg2.copy()
    bad[0, 0] += 1
    groups = [
        (vk[:2], msgs[:2], agg2),
        (vk[2:], msgs[2:], agg3),
        (vk[:2], msgs[:2], bad),
    ]
    out = lc.verify_many(params, groups, device_bucket_threshold=1)
    assert out[0] == (True, "")
    assert out[1] == (True, "")
    assert out[2] == (False, lc.REASON_TARGET)
    assert out == lc.verify_many(params, groups, device_bucket_threshold=10**9)


def test_sign_device_hash_matches_host(params128):
    """lifecycle.sign's on-device challenge derivation (device_hash_threshold
    crossed) produces bit-identical signatures to the host hash path."""
    params = params128
    keys = ftpu.keygen(params, list(range(500, 532)))
    msgs = [f"dm{i}" for i in range(32)]
    dev = lc.sign(params, keys, msgs, device_hash_threshold=1)
    host = lc.sign(params, keys, msgs, device_hash_threshold=10**9)
    assert np.array_equal(np.asarray(dev.sig), np.asarray(host.sig))
