"""Distributed-equivalence tests: the sharded lifecycle on an 8-device CPU mesh
must be bitwise identical to the single-device kernels (SURVEY.md §4's
distributed test plan)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fusion_cryptography_tpu as ftpu
from fusion_cryptography_tpu.parallel import make_mesh, sharded_lifecycle_step
from fusion_cryptography_tpu.scheme import lifecycle as lc
from fusion_cryptography_tpu.ops.ntt import ntt_fwd_u


@pytest.fixture(scope="module")
def params():
    return ftpu.fusion_setup(256, 7)


def _reference_unsharded(params, sk, c, al, rank_p):
    """Single-device recomputation of the sharded step outputs."""
    ctx = lc._ctx(params)
    F, plan = ctx["field"], ctx["plan"]
    a_pad = np.zeros((rank_p, params.degree), dtype=np.int32)
    a_pad[: params.rank] = np.asarray(params.public_challenge)
    a_mont = F.to_mont(F.to_unsigned(jnp.asarray(a_pad)))
    sk_u = ntt_fwd_u(plan, F.to_unsigned(jnp.asarray(sk)))
    vk_u = F.sum_mod(F.mont_mul(a_mont, sk_u), axis=-2)
    c_u = ntt_fwd_u(plan, F.to_unsigned(jnp.asarray(c)))
    sig_u = F.add_mod(F.mont_mul(F.to_mont(c_u)[:, None, :], sk_u[:, 0]), sk_u[:, 1])
    al_u = ntt_fwd_u(plan, F.to_unsigned(jnp.asarray(al)))
    agg_u = F.sum_mod(F.mont_mul(F.to_mont(al_u)[:, None, :], sig_u), axis=0)
    return np.asarray(F.to_centered(vk_u)), np.asarray(F.to_centered(agg_u))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_matches_unsharded(params, mesh_shape):
    mesh = make_mesh(mesh_shape)
    step, prepare, rank_p = sharded_lifecycle_step(params, mesh)
    B = 16
    sk, c, al = prepare(B, seed=3)
    vk, agg, eq, norm_ok, w_ok = step(sk, c, al)
    vk_ref, agg_ref = _reference_unsharded(params, sk, c, al, rank_p)
    np.testing.assert_array_equal(np.asarray(vk), vk_ref)
    np.testing.assert_array_equal(np.asarray(agg), agg_ref)
    assert bool(eq)  # the pipeline's own signatures must verify
    assert bool(norm_ok) and bool(w_ok)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_lifecycle_128(params):
    """Second parameter set through the sharded path."""
    p128 = ftpu.fusion_setup(128, 5)
    mesh = make_mesh((4, 2))
    step, prepare, rank_p = sharded_lifecycle_step(p128, mesh)
    sk, c, al = prepare(8, seed=4)
    vk, agg, eq, norm_ok, w_ok = step(sk, c, al)
    vk_ref, agg_ref = _reference_unsharded(p128, sk, c, al, rank_p)
    np.testing.assert_array_equal(np.asarray(vk), vk_ref)
    np.testing.assert_array_equal(np.asarray(agg), agg_ref)
    assert bool(eq) and bool(norm_ok) and bool(w_ok)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_sharded_with_hash_derived_coeffs(params, mesh_shape):
    """The sharded lifecycle fed by the REAL hash pipeline (SHA3 prehash ->
    SHAKE challenge/alpha decode, sorted by str(vk)) must bitwise match the
    KAT-anchored host path: vk vs lifecycle.keygen, agg vs lifecycle.aggregate,
    and the verify verdict must hold (VERDICT r2 item 6: prepare()'s random
    +/-1 tensors satisfy the lattice equation identically, so only hash-derived
    coefficients exercise the sharded-hash integration)."""
    from fusion_cryptography_tpu.parallel import prepare_real

    mesh = make_mesh(mesh_shape)
    step, _, rank_p = sharded_lifecycle_step(params, mesh)
    B = 8
    seeds = [500 + i for i in range(B)]
    msgs = [f"sharded-hash:{i}" for i in range(B)]
    sk, cc, al, keys, order = prepare_real(params, rank_p, seeds, msgs)
    vk, agg, eq, norm_ok, w_ok = step(sk, cc, al)

    # vk parity against the host keygen path (sorted aggregation order)
    np.testing.assert_array_equal(np.asarray(vk), keys.vk_np()[np.array(order)])

    # aggregate parity against the host aggregate path (sorts internally)
    sigs = lc.sign(params, keys, msgs)
    agg_host = lc.aggregate(params, keys.vk_np(), msgs, sigs.sig)
    got = np.asarray(agg)
    np.testing.assert_array_equal(got[: params.rank], np.asarray(agg_host))
    assert not got[params.rank :].any(), "padded rank rows must stay zero"

    # the full verify verdict with hash-derived coefficients
    assert bool(eq) and bool(norm_ok) and bool(w_ok)

    # and the host verifier accepts the sharded aggregate
    ok, why = lc.verify(params, keys.vk_np(), msgs, got[: params.rank])
    assert ok, why


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("dp_size", [8, 4])
def test_sharded_device_verify(dp_size):
    """The flagship all-on-device verify pipeline under shard_map over dp
    (groups axis) must be bitwise identical to the single-device fused path."""
    from fusion_cryptography_tpu.parallel.sharded import sharded_verify_device
    from fusion_cryptography_tpu.scheme import device_pipeline as dp_mod

    params = ftpu.fusion_setup(128, 7)
    G, N = 8, 2
    keys = ftpu.keygen(params, [400 + k for k in range(G * N)])
    msgs = [f"sv{g}:{i}" for g in range(G) for i in range(N)]
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
    aggs = np.asarray(
        lc._ctx(params)["aggregate_core"](jnp.asarray(sig_np[order]), jnp.asarray(al))
    )
    vks = vk_np[order]
    # tamper one group so the verdict vector is non-trivial
    bad = aggs.copy()
    bad[G // 2, 0, 0] = (bad[G // 2, 0, 0] + 1) % params.modulus

    want = tuple(
        np.asarray(x)
        for x in dp_mod.verify_batch_device(params, vks, s_msgs, bad, group_chunk=4)
    )
    mesh = make_mesh((dp_size, 8 // dp_size))
    got = tuple(
        np.asarray(x)
        for x in sharded_verify_device(params, mesh, vks, s_msgs, bad)
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    assert not bool(got[0][G // 2]) and bool(got[0][0])
