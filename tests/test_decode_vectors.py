"""Closed-form decoder vectors: the all-zero and all-one XOF inputs have fully
derivable outputs (the reference freezes these as its decode spec,
tests/test_fusion.py:475-558).  Checked for both the Python and C decoders."""
import numpy as np
import pytest

from fusion_cryptography_tpu import native
from fusion_cryptography_tpu.hashing.decode import decode_bytes_to_coefficients
from fusion_cryptography_tpu.ops.field import Q


def expected_zero_vector(degree, weight):
    """All-zero bytes: signums all -1 (bit 0 -> 2*0-1), magnitudes 1, and every
    Fisher–Yates index j = 0, so the swap chain is swap(d-1, 0), swap(d-2, 0),
    ..., swap(w+1, 0) applied to [-1]*w + [0]*(d-w) — the first swap parks the
    slot-0 value (-1) at slot d-1 and each later swap shuttles a 0 through
    slot 0 (matching the reference's hand-worked trace,
    tests/test_fusion.py:475-516)."""
    coefs = [-1] * weight + [0] * (degree - weight)
    for i in range(degree - 1, weight, -1):
        coefs[i], coefs[0] = coefs[0], coefs[i]
    return coefs


@pytest.mark.parametrize("degree,weight,bias", [(64, 27, 128), (256, 60, 256)])
def test_all_zero_bytes(degree, weight, bias):
    from math import ceil, log2

    bpc = ceil((1 + bias) / 8)
    bpi = ceil((log2(degree) + bias) / 8)
    n = ceil(weight / 8) + bpc * weight + degree * bpi  # hash_ch-sized buffer
    b = bytes(n)
    got = decode_bytes_to_coefficients(b, bias, Q, degree, 1, weight)
    expect = expected_zero_vector(degree, weight)
    assert got.tolist() == expect
    # every nonzero is -1 (signum bit 0), weight preserved
    assert sorted(got.tolist()).count(-1) == weight
    if native.available():
        c = native.decode_coeffs(b, degree, weight, 1, bpc, bpi)
        np.testing.assert_array_equal(c, got)


@pytest.mark.parametrize("degree,weight,bias", [(64, 27, 128), (256, 60, 256)])
def test_all_ones_bytes(degree, weight, bias):
    """All-0xFF bytes: signums all +1; each FY index j = (2^(8*bpi) - 1) % (i+1)."""
    from math import ceil, log2

    bpc = ceil((1 + bias) / 8)
    bpi = ceil((log2(degree) + bias) / 8)
    n = ceil(weight / 8) + bpc * weight + degree * bpi
    b = b"\xff" * n
    got = decode_bytes_to_coefficients(b, bias, Q, degree, 1, weight)
    coefs = [1] * weight + [0] * (degree - weight)
    big = (1 << (8 * bpi)) - 1
    for i in range(degree - 1, weight, -1):
        j = big % (i + 1)
        coefs[i], coefs[j] = coefs[j], coefs[i]
    assert got.tolist() == coefs
    assert sorted(got.tolist()).count(1) == weight
    if native.available():
        c = native.decode_coeffs(b, degree, weight, 1, bpc, bpi)
        np.testing.assert_array_equal(c, got)


def test_too_few_bytes_raises():
    with pytest.raises(ValueError):
        decode_bytes_to_coefficients(b"\x00" * 10, 128, Q, 64, 1, 27)
    if native.available():
        with pytest.raises(ValueError):
            native.decode_coeffs(b"\x00" * 10, 64, 27, 1, 17, 17)