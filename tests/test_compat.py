"""Object-compat layer tests: operator algebra, validation errors, repr formats,
and transform round-trips (mirrors reference tests/test_polynomials.py and
tests/test_matrices.py coverage)."""
import random

import numpy as np
import pytest

from fusion_cryptography_tpu.interop.objects import (
    GeneralMatrix,
    PolynomialCoefficientRepresentation as PolyCoef,
    PolynomialNTTRepresentation as PolyNTT,
    is_algebraic_class,
    sample_polynomial_coefficient_representation,
    sample_polynomial_ntt_representation,
    transform,
)

Q = 2147465729
RING128 = dict(modulus=Q, degree=64, root=23584283,
               inv_root=pow(23584283, Q - 2, Q), root_order=128)


def _coef(coefs, **kw):
    return PolyCoef(coefficients=coefs, **{**RING128, **kw})


def _rand_coef(seed, lo=-500, hi=500):
    rng = random.Random(seed)
    return _coef([rng.randrange(lo, hi) for _ in range(64)])


def test_repr_format_and_module_masquerade():
    p = _coef([0] * 64)
    s = str(p)
    assert s.startswith("PolynomialCoefficientRepresentation(modulus=2147465729, degree=64, ")
    assert repr(PolyNTT) == "<class 'algebra.polynomials.PolynomialNTTRepresentation'>"
    assert repr(PolyCoef) == "<class 'algebra.polynomials.PolynomialCoefficientRepresentation'>"


def test_validation_errors():
    with pytest.raises(TypeError):
        PolyCoef(**{**RING128, "modulus": "x"}, coefficients=[0] * 64)  # type: ignore
    with pytest.raises(ValueError):
        _coef([0] * 63)
    with pytest.raises(TypeError):
        _coef([0.5] * 64)  # type: ignore
    with pytest.raises(ValueError):
        PolyCoef(**{**RING128, "root_order": 127}, coefficients=[0] * 64)
    with pytest.raises(ValueError):
        # root of order 64 is not primitive of order 128
        bad_root = pow(23584283, 2, Q)
        PolyCoef(modulus=Q, degree=64, root=bad_root, inv_root=pow(bad_root, Q - 2, Q),
                 root_order=128, coefficients=[0] * 64)


def test_add_sub_neg_mod_identities():
    a, b = _rand_coef(1), _rand_coef(2)
    s = a + b
    for x, y, z in zip(a.coefficients, b.coefficients, s.coefficients):
        assert (z - x - y) % Q == 0
        assert -(Q // 2) <= z <= Q // 2
    d = a - b
    for x, y, z in zip(a.coefficients, b.coefficients, d.coefficients):
        assert (z - x + y) % Q == 0
    assert 0 + a == a and a + 0 == a  # radd/identity


def test_mul_matches_schoolbook():
    a, b = _rand_coef(3), _rand_coef(4)
    got = (a * b).coefficients
    d = 64
    c = [0] * (2 * d)
    for i, x in enumerate(a.coefficients):
        for j, y in enumerate(b.coefficients):
            c[i + j] += x * y
    for k in range(d):
        assert (got[k] - (c[k] - c[k + d])) % Q == 0
        assert abs(got[k]) <= Q // 2


def test_eq_is_mod_q_equivalence():
    a = _rand_coef(5)
    shifted = _coef([x + Q for x in a.coefficients])
    assert a == shifted
    b = _coef([x + 1 for x in a.coefficients])
    assert a != b


def test_transform_roundtrip_and_homomorphism():
    a, b = _rand_coef(6), _rand_coef(7)
    fa, fb = transform(a), transform(b)
    assert isinstance(fa, PolyNTT)
    back = transform(fa)
    assert back == a
    # INTT(NTT(a) ⊙ NTT(b)) == a*b  (reference tests/test_polynomials.py:792-879)
    prod_ntt = fa * fb
    assert transform(prod_ntt) == a * b


def test_norm_weight():
    a = _coef([3, -7] + [0] * 62)
    assert a.norm(p="infty") == 7
    assert a.weight() == 2
    with pytest.raises(NotImplementedError):
        a.norm(p=2)


def test_samplers_bounds_and_determinism():
    p1 = sample_polynomial_coefficient_representation(
        **RING128, norm_bound=52, weight_bound=64, seed=77
    )
    p2 = sample_polynomial_coefficient_representation(
        **RING128, norm_bound=52, weight_bound=64, seed=77
    )
    assert p1 == p2 and p1.coefficients == p2.coefficients
    assert p1.weight() == 64
    assert 1 <= p1.norm(p="infty") <= 52
    u = sample_polynomial_ntt_representation(**RING128, seed=78)
    assert all(-(Q // 2) <= v <= Q // 2 for v in u.values)


def test_general_matrix_algebra():
    a = GeneralMatrix([[_rand_coef(10), _rand_coef(11)], [_rand_coef(12), _rand_coef(13)]])
    b = GeneralMatrix([[_rand_coef(14), _rand_coef(15)], [_rand_coef(16), _rand_coef(17)]])
    assert is_algebraic_class(PolyCoef)
    assert a.elem_class is PolyCoef
    s = a + b
    assert s[0][0] == a[0][0] + b[0][0]
    prod = a * b
    # hand-expanded 2x2 cofactor check (reference tests/test_matrices.py:20-221)
    assert prod[0][0] == a[0][0] * b[0][0] + a[0][1] * b[1][0]
    assert prod[1][1] == a[1][0] * b[0][1] + a[1][1] * b[1][1]
    # scalar (element) broadcast branch
    sc = a * b[0][0]
    assert sc[1][0] == a[1][0] * b[0][0]
    # coefficient polys have no ==0 special case (reference polynomials.py:98),
    # so check zero-ness via weight instead
    assert all(item.weight() == 0 for row in (a - a).matrix for item in row)
    assert str(a).startswith(
        "GeneralMatrix(elem_class=<class 'algebra.polynomials.PolynomialCoefficientRepresentation'>, matrix=[["
    )


def test_general_matrix_validation():
    with pytest.raises(ValueError):
        GeneralMatrix("nope")  # type: ignore
    with pytest.raises(ValueError):
        GeneralMatrix([])
    with pytest.raises(ValueError):
        GeneralMatrix([[]])
    with pytest.raises(ValueError):
        GeneralMatrix([[_rand_coef(1)], [_rand_coef(2), _rand_coef(3)]])
    with pytest.raises(ValueError):
        GeneralMatrix([[1, 2], [3, "x"]])  # mixed/non-algebraic


def test_general_matrix_delitem_zeroes_row():
    a = GeneralMatrix([[_rand_coef(20)], [_rand_coef(21)]])
    del a[0]
    assert a.matrix[0] == 0  # reference quirk (matrices.py:58-59)


def test_matrix_norm_weight():
    a = GeneralMatrix([[_coef([5] + [0] * 63), _coef([-9] + [0] * 63)]])
    assert a.norm(p="infty") == 9
    assert a.weight() == 1
    assert a.norm(p=2) is None  # reference returns None for p != "infty"
