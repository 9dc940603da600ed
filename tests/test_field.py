"""Property tests for the uint32 limb field arithmetic against CPython big-int
oracles (the reference's arithmetic is all CPython ints, algebra/ntt.py:93-123)."""
import random

import numpy as np
import jax.numpy as jnp
import pytest

from fusion_cryptography_tpu.ops import field as F

pytestmark = pytest.mark.fast


def rand_residues(n, seed):
    rng = random.Random(seed)
    vals = [rng.randrange(F.Q) for _ in range(n)]
    # sprinkle in edge cases
    vals[:6] = [0, 1, F.Q - 1, F.HALF_Q, F.HALF_Q + 1, F.Q // 3]
    return np.array(vals, dtype=np.uint32)


def test_centered_unsigned_roundtrip():
    u = rand_residues(1000, 1)
    c = F.to_centered(jnp.asarray(u))
    c_np = np.asarray(c)
    assert c_np.min() >= -F.HALF_Q and c_np.max() <= F.HALF_Q
    for ui, ci in zip(u[:50].tolist(), c_np[:50].tolist()):
        assert ci % F.Q == ui
    back = np.asarray(F.to_unsigned(c))
    np.testing.assert_array_equal(back, u)


def test_add_sub_mod():
    a = rand_residues(500, 2)
    b = rand_residues(500, 3)
    s = np.asarray(F.add_mod(jnp.asarray(a), jnp.asarray(b)))
    d = np.asarray(F.sub_mod(jnp.asarray(a), jnp.asarray(b)))
    for i in range(500):
        assert s[i] == (int(a[i]) + int(b[i])) % F.Q
        assert d[i] == (int(a[i]) - int(b[i])) % F.Q


def test_widening_mul_exact():
    rng = random.Random(4)
    a = np.array([rng.randrange(1 << 32) for _ in range(500)], dtype=np.uint32)
    b = np.array([rng.randrange(1 << 32) for _ in range(500)], dtype=np.uint32)
    hi, lo = F.widening_mul(jnp.asarray(a), jnp.asarray(b))
    hi, lo = np.asarray(hi), np.asarray(lo)
    for i in range(500):
        p = int(a[i]) * int(b[i])
        assert int(hi[i]) == p >> 32 and int(lo[i]) == p & 0xFFFFFFFF


def test_mont_mul_and_domain():
    a = rand_residues(500, 5)
    b = rand_residues(500, 6)
    am = F.to_mont(jnp.asarray(a))
    prod = np.asarray(F.mont_mul(am, jnp.asarray(b)))
    for i in range(500):
        assert prod[i] == (int(a[i]) * int(b[i])) % F.Q
    # plain-domain helper
    prod2 = np.asarray(F.mul_mod(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(prod, prod2)
    # from_mont undoes to_mont
    back = np.asarray(F.from_mont(am))
    np.testing.assert_array_equal(back, a)


def test_shoup_mul():
    a = rand_residues(300, 7)
    rng = random.Random(8)
    for s in [0, 1, F.Q - 1] + [rng.randrange(F.Q) for _ in range(5)]:
        sh = F.shoup_precompute(s)
        out = np.asarray(
            F.mul_mod_shoup(jnp.asarray(a), jnp.asarray(np.uint32(s)), jnp.asarray(np.uint32(sh)))
        )
        for i in range(300):
            assert out[i] == (int(a[i]) * s) % F.Q


def test_sum_mod():
    rng = np.random.default_rng(9)
    x = rng.integers(0, F.Q, size=(7, 2818), dtype=np.uint32)  # capacity-sized axis
    out = np.asarray(F.sum_mod(jnp.asarray(x), axis=1))
    expect = [sum(int(v) for v in row) % F.Q for row in x]
    np.testing.assert_array_equal(out, np.array(expect, dtype=np.uint32))


def test_sum_mod_hierarchical_oversize():
    """Beyond the limb headroom the reduction recurses (zero-padded, exact)."""
    rng = np.random.default_rng(12)
    x = rng.integers(0, F.Q, size=(F.SUM_TERMS_LIMIT + 7, 2), dtype=np.uint32)
    out = np.asarray(F.sum_mod(jnp.asarray(x), axis=0))
    expect = [sum(int(v) for v in x[:, j]) % F.Q for j in range(2)]
    assert out.tolist() == expect


def test_dot_mod():
    rng = np.random.default_rng(10)
    a = rng.integers(0, F.Q, size=(195, 64), dtype=np.uint32)
    b = rng.integers(0, F.Q, size=(195, 64), dtype=np.uint32)
    out = np.asarray(F.dot_mod(F.to_mont(jnp.asarray(a)), jnp.asarray(b), axis=0))
    for j in range(64):
        expect = sum(int(a[k, j]) * int(b[k, j]) for k in range(195)) % F.Q
        assert out[j] == expect


def test_cent_matches_reference_contract():
    rng = random.Random(11)
    vals = [0, 1, -1, F.Q, -F.Q, F.HALF_Q, -F.HALF_Q, 2**31 - 1, -(2**31)] + [
        rng.randrange(-(2**31), 2**31) for _ in range(500)
    ]
    x = np.array(vals, dtype=np.int64).astype(np.int32)
    out = np.asarray(F.cent(jnp.asarray(x)))
    for xi, oi in zip(x.tolist(), out.tolist()):
        y = xi % F.Q
        expect = y - F.Q if y > F.HALF_Q else y
        assert oi == expect
