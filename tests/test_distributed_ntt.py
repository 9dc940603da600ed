"""Coefficient-sharded NTT vs the single-device butterfly kernels: bitwise."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from fusion_cryptography_tpu.ops.field import Q, FUSION_FIELD
from fusion_cryptography_tpu.ops.ntt import make_plan, ntt_fwd, ntt_inv
from fusion_cryptography_tpu.parallel.distributed_ntt import make_distributed_ntt

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _mesh(n, name="sp"):
    return Mesh(np.array(jax.devices()[:n]), (name,))


@needs8
@pytest.mark.parametrize("d,root,shards", [(256, 3337519, 8), (256, 3337519, 4), (64, 23584283, 8)])
def test_fwd_matches_butterfly(d, root, shards):
    plan = make_plan(Q, d, root)
    fwd, inv = make_distributed_ntt(plan, _mesh(shards))
    rng = np.random.default_rng(d + shards)
    x = rng.integers(-(Q // 2), Q // 2 + 1, size=(8, d), dtype=np.int64).astype(np.int32)
    got = np.asarray(fwd(jnp.asarray(x)))
    expect = np.asarray(ntt_fwd(plan, jnp.asarray(x)))
    np.testing.assert_array_equal(got, expect)


@needs8
def test_roundtrip_and_inverse_matches():
    plan = make_plan(Q, 256, 3337519)
    fwd, inv = make_distributed_ntt(plan, _mesh(8))
    rng = np.random.default_rng(0)
    x = rng.integers(-(Q // 2), Q // 2 + 1, size=(4, 256), dtype=np.int64).astype(np.int32)
    x_hat = fwd(jnp.asarray(x))
    back = np.asarray(inv(x_hat))
    np.testing.assert_array_equal(back, x)
    # inverse agrees with the butterfly INTT on the same NTT-domain input
    expect = np.asarray(ntt_inv(plan, jnp.asarray(np.asarray(x_hat))))
    np.testing.assert_array_equal(back, expect)


@needs8
@pytest.mark.parametrize("d,root,shards", [(256, 3337519, 8), (256, 3337519, 4), (64, 23584283, 8)])
def test_fourstep_roundtrip(d, root, shards):
    from fusion_cryptography_tpu.parallel.distributed_ntt import make_fourstep_ntt

    plan = make_plan(Q, d, root)
    fwd, inv, layout, unlayout = make_fourstep_ntt(plan, _mesh(shards))
    rng = np.random.default_rng(d * shards)
    x = rng.integers(-(Q // 2), Q // 2 + 1, size=(6, d), dtype=np.int64).astype(np.int32)
    xc = layout(jnp.asarray(x))
    back = np.asarray(unlayout(inv(fwd(xc))))
    np.testing.assert_array_equal(back, x)


@needs8
def test_fourstep_pointwise_homomorphism():
    """inv(fwd(f) ⊙ fwd(g)) must equal the negacyclic product — proves the
    four-step output is a consistent NTT-domain representation even though its
    slot order differs from the butterfly kernels'."""
    from fusion_cryptography_tpu.ops.ntt import negacyclic_poly_mult
    from fusion_cryptography_tpu.parallel.distributed_ntt import make_fourstep_ntt

    plan = make_plan(Q, 256, 3337519)
    F = FUSION_FIELD
    fwd, inv, layout, unlayout = make_fourstep_ntt(plan, _mesh(8))
    rng = np.random.default_rng(2)
    f = rng.integers(-500, 501, size=(3, 256)).astype(np.int32)
    g = rng.integers(-500, 501, size=(3, 256)).astype(np.int32)
    fh = F.to_unsigned(jnp.asarray(np.asarray(fwd(layout(jnp.asarray(f))))))
    gh = F.to_unsigned(jnp.asarray(np.asarray(fwd(layout(jnp.asarray(g))))))
    prod = F.to_centered(F.mont_mul(F.to_mont(fh), gh))
    got = np.asarray(unlayout(inv(prod)))
    expect = np.asarray(negacyclic_poly_mult(plan, jnp.asarray(f), jnp.asarray(g)))
    np.testing.assert_array_equal(got, expect)


@needs8
def test_pointwise_product_composes():
    """Sharded NTT-domain pointwise products behave as ring multiplication."""
    plan = make_plan(Q, 256, 3337519)
    F = FUSION_FIELD
    fwd, inv = make_distributed_ntt(plan, _mesh(8))
    rng = np.random.default_rng(1)
    f = rng.integers(-100, 101, size=(2, 256)).astype(np.int32)
    g = rng.integers(-100, 101, size=(2, 256)).astype(np.int32)
    fh = F.to_unsigned(jnp.asarray(np.asarray(fwd(jnp.asarray(f)))))
    gh = F.to_unsigned(jnp.asarray(np.asarray(fwd(jnp.asarray(g)))))
    prod = F.to_centered(F.mont_mul(F.to_mont(fh), gh))
    got = np.asarray(inv(prod))
    from fusion_cryptography_tpu.ops.ntt import negacyclic_poly_mult

    expect = np.asarray(negacyclic_poly_mult(plan, jnp.asarray(f), jnp.asarray(g)))
    np.testing.assert_array_equal(got, expect)


@needs8
def test_fourstep_order_recovery():
    """fourstep_order makes the all_to_all form drop-in for the reference slot
    layout: gathered outputs match ntt_fwd bitwise."""
    from fusion_cryptography_tpu.parallel.distributed_ntt import (
        fourstep_order,
        make_fourstep_ntt,
    )

    plan = make_plan(Q, 256, 3337519)
    fwd, inv, layout, unlayout = make_fourstep_ntt(plan, _mesh(8))
    perm = fourstep_order(plan, fwd, layout)
    assert sorted(perm.tolist()) == list(range(256))
    rng = np.random.default_rng(5)
    x = rng.integers(-(Q // 2), Q // 2 + 1, size=(4, 256), dtype=np.int64).astype(np.int32)
    got = np.asarray(fwd(layout(jnp.asarray(x))))
    ref = np.asarray(ntt_fwd(plan, jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref[:, perm])


@needs8
@pytest.mark.parametrize("d,root,shards", [(256, 3337519, 8), (256, 3337519, 4), (64, 23584283, 8)])
def test_fourstep_perm_closed_form_matches_probe(d, root, shards):
    """The closed-form permutation equals the empirically probed one."""
    from fusion_cryptography_tpu.parallel.distributed_ntt import (
        fourstep_order,
        fourstep_perm,
        make_fourstep_ntt,
    )

    plan = make_plan(Q, d, root)
    fwd, inv, layout, unlayout = make_fourstep_ntt(plan, _mesh(shards), order="fourstep")
    probed = fourstep_order(plan, fwd, layout)
    closed = fourstep_perm(plan, shards)
    np.testing.assert_array_equal(closed, probed)


@needs8
@pytest.mark.parametrize("d,root,shards", [(256, 3337519, 8), (64, 23584283, 8)])
def test_fourstep_reference_order_fused(d, root, shards):
    """order='reference' emits ntt_fwd's slot layout directly (the gather is
    fused as a per-shard local reorder — no extra collective)."""
    from fusion_cryptography_tpu.parallel.distributed_ntt import make_fourstep_ntt

    plan = make_plan(Q, d, root)
    fwd, inv, layout, unlayout = make_fourstep_ntt(plan, _mesh(shards), order="reference")
    assert fwd.order == "reference"
    rng = np.random.default_rng(d + 1)
    x = rng.integers(-(Q // 2), Q // 2 + 1, size=(5, d), dtype=np.int64).astype(np.int32)
    got = np.asarray(fwd(layout(jnp.asarray(x))))
    expect = np.asarray(ntt_fwd(plan, jnp.asarray(x)))
    np.testing.assert_array_equal(got, expect)
    # inverse accepts reference-order NTT-domain input
    back = np.asarray(unlayout(inv(jnp.asarray(expect))))
    np.testing.assert_array_equal(back, x)


@needs8
def test_fourstep_padded_shards():
    """S^2 does not divide d (d=32, S=8): padded all_to_all chunks round-trip
    bitwise and the closed-form perm maps every valid slot to ntt_fwd's."""
    from fusion_cryptography_tpu.ops.field import FUSION_FIELD as F
    from fusion_cryptography_tpu.parallel.distributed_ntt import (
        fourstep_perm,
        make_fourstep_ntt,
    )

    root32 = pow(3337519, 512 // 64, Q)  # primitive 64th root -> degree 32
    plan = make_plan(Q, 32, root32)
    with pytest.raises(ValueError, match="reference"):
        make_fourstep_ntt(plan, _mesh(8), order="reference")
    fwd, inv, layout, unlayout = make_fourstep_ntt(plan, _mesh(8))
    assert fwd.order == "fourstep" and fwd.out_width == 64
    rng = np.random.default_rng(9)
    x = rng.integers(-(Q // 2), Q // 2 + 1, size=(6, 32), dtype=np.int64).astype(np.int32)
    y = np.asarray(fwd(layout(jnp.asarray(x))))
    assert y.shape == (6, 64)
    perm = fourstep_perm(plan, 8)
    assert (perm >= 0).sum() == 32 and set(perm[perm >= 0]) == set(range(32))
    expect = np.asarray(ntt_fwd(plan, jnp.asarray(x)))
    valid = perm >= 0
    np.testing.assert_array_equal(y[:, valid], expect[:, perm[valid]])
    back = np.asarray(unlayout(inv(jnp.asarray(y))))
    np.testing.assert_array_equal(back, x)
    # pointwise homomorphism straight through the padded layout
    from fusion_cryptography_tpu.ops.ntt import negacyclic_poly_mult

    g = rng.integers(-200, 201, size=(6, 32)).astype(np.int32)
    gh = F.to_unsigned(jnp.asarray(np.asarray(fwd(layout(jnp.asarray(g))))))
    prod = F.to_centered(F.mont_mul(F.to_mont(F.to_unsigned(jnp.asarray(y))), gh))
    got = np.asarray(unlayout(inv(prod)))
    expect_prod = np.asarray(negacyclic_poly_mult(plan, jnp.asarray(x), jnp.asarray(g)))
    np.testing.assert_array_equal(got, expect_prod)
