"""Device XOF-byte decoder vs the host decoder (bit-exactness)."""
import numpy as np
import pytest

from fusion_cryptography_tpu.hashing.decode import decode_bytes_to_coefficients
from fusion_cryptography_tpu.ops import xof_decode

pytestmark = pytest.mark.fast

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


@pytest.mark.parametrize(
    "secpar,degree,weight,bound,trunc",
    [
        (256, 256, 60, 1, False),  # production challenge geometry
        (256, 256, 60, 1, True),  # production alpha geometry (truncated)
        (128, 64, 27, 1, False),  # secpar=128 challenge (offset % 4 == 3)
        (128, 64, 35, 1, True),  # secpar=128 alpha
        (256, 256, 60, 52, False),  # bound > 1 magnitude path
        (128, 64, 63, 7, True),  # near-full weight, one swap
    ],
)
def test_decode_words_matches_lane_major(secpar, degree, weight, bound, trunc):
    """The packed-word decoder is a bit-exact twin of the byte decoders for
    full and truncated streams, aligned and misaligned index offsets."""
    from fusion_cryptography_tpu.ops.ragged_words import pack_bytes_to_words

    geom = xof_decode.geometry(secpar, Q, degree, bound, weight)
    n = geom.min_bytes if trunc else (
        geom.index_stream_offset + degree * geom.bytes_per_index
    )
    rng = np.random.default_rng(1000 * secpar + degree + weight + bound)
    B = 7
    raw = rng.integers(0, 256, size=(n, B), dtype=np.uint8)
    want = np.asarray(xof_decode.decode_coeffs_lm(raw, geom))
    words = pack_bytes_to_words(raw)
    got = np.asarray(xof_decode.decode_coeffs_w(words, geom, n))
    assert np.array_equal(got, want)
    # scratch garbage in the partial tail word must not leak in
    if n % 4:
        wfull = np.array(words)  # writable copy
        wfull[-1] |= np.uint32(0xA5A5A5A5) << np.uint32(8 * (n % 4))
        got2 = np.asarray(xof_decode.decode_coeffs_w(wfull, geom, n))
        assert np.array_equal(got2, want)


def test_decode_words_rejects_short_input():
    geom = xof_decode.geometry(256, Q, 256, 1, 60)
    with pytest.raises(ValueError, match="Too few bytes"):
        xof_decode.decode_coeffs_w(
            np.zeros((2, 3), np.uint32), geom, geom.min_bytes - 1
        )
    with pytest.raises(ValueError, match="fewer than"):
        xof_decode.decode_coeffs_w(
            np.zeros((4, 3), np.uint32), geom, geom.min_bytes
        )
