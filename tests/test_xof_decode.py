"""Device XOF-byte decoder vs the host decoder (bit-exactness)."""
import numpy as np
import pytest

from fusion_cryptography_tpu.hashing.decode import decode_bytes_to_coefficients
from fusion_cryptography_tpu.ops import xof_decode

Q = 2147465729


@pytest.mark.parametrize(
    "secpar,degree,weight,bound",
    [
        (256, 256, 60, 1),  # production challenge/alpha geometry, secpar=256
        (128, 64, 27, 1),  # secpar=128 challenge
        (128, 64, 35, 1),  # secpar=128 alpha
        (256, 256, 60, 52),  # bound > 1 exercises the magnitude Horner path
        (128, 64, 63, 7),  # near-full weight (only one swap)
    ],
)
def test_decode_matches_host(secpar, degree, weight, bound):
    geom = xof_decode.geometry(secpar, Q, degree, bound, weight)
    n = geom.min_bytes + geom.num_swaps * geom.bytes_per_index
    # the challenge XOF always supplies degree * bytes_per_index index bytes
    n = geom.index_stream_offset + degree * geom.bytes_per_index
    rng = np.random.default_rng(secpar * degree + weight)
    B = 9
    raw = rng.integers(0, 256, size=(B, n), dtype=np.uint8)
    out = np.asarray(xof_decode.decode_coeffs(raw, geom))
    for b in range(B):
        want = decode_bytes_to_coefficients(
            raw[b].tobytes(),
            log2_bias=secpar,
            modulus=Q,
            degree=degree,
            norm_bound=bound,
            weight_bound=weight,
        )
        assert np.array_equal(out[b], want), f"lane {b} mismatch"


@pytest.mark.parametrize(
    "secpar,degree,weight",
    [(256, 256, 60), (128, 64, 35)],
)
def test_decode_short_index_stream_matches_host(secpar, degree, weight):
    # aggregation blocks supply only ``weight`` index slots but the reference's
    # Fisher-Yates reads degree-1-weight of them: the tail reads are truncated
    # or empty byte slices (fusion.py:474) and must decode identically
    geom = xof_decode.geometry(secpar, Q, degree, 1, weight)
    n = geom.min_bytes  # the exact agg-block length
    rng = np.random.default_rng(77 + secpar)
    B = 6
    raw = rng.integers(0, 256, size=(B, n), dtype=np.uint8)
    out = np.asarray(xof_decode.decode_coeffs(raw, geom))
    for b in range(B):
        want = decode_bytes_to_coefficients(raw[b].tobytes(), secpar, Q, degree, 1, weight)
        assert np.array_equal(out[b], want), f"lane {b}"


def test_decode_closed_form_all_zero_bytes():
    # all-zero XOF bytes: signums all -1, magnitudes 1, every swap j = 0
    # (mirrors the reference's closed-form vector test, test_fusion.py:475-558)
    geom = xof_decode.geometry(256, Q, 256, 1, 60)
    n = geom.index_stream_offset + 256 * geom.bytes_per_index
    raw = np.zeros((1, n), dtype=np.uint8)
    out = np.asarray(xof_decode.decode_coeffs(raw, geom))[0]
    want = decode_bytes_to_coefficients(raw[0].tobytes(), 256, Q, 256, 1, 60)
    assert np.array_equal(out, want)


def test_decode_rejects_short_input():
    geom = xof_decode.geometry(256, Q, 256, 1, 60)
    with pytest.raises(ValueError, match="Too few bytes"):
        xof_decode.decode_coeffs(np.zeros((1, 10), dtype=np.uint8), geom)
