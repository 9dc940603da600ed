"""Segmented SHAKE absorb vs the contiguous absorb on the folded stream.

The segmented absorb must be bit-exact for every lane: it reproduces the
reference's hashing of str() concatenations (fusion.py:417, :586-589)
without materializing them.
"""
import hashlib

import numpy as np
import jax.numpy as jnp
import pytest

from fusion_cryptography_tpu.ops import keccak as kc
from fusion_cryptography_tpu.ops import ragged_words as rw

pytestmark = pytest.mark.fast


def _random_segments(rng, B, spec):
    """spec: list of (min_len, max_len); returns (segments, per-lane bytes)."""
    segs = []
    payloads = [b"" for _ in range(B)]
    for mn, mx in spec:
        lens = rng.integers(mn, mx + 1, B).astype(np.int32)
        W = rw.words_for(mx)
        by = np.zeros((W * 4, B), np.uint8)
        for b in range(B):
            data = rng.integers(1, 256, lens[b]).astype(np.uint8)
            by[: lens[b], b] = data
            payloads[b] += data.tobytes()
        words = np.asarray(rw.pack_bytes_to_words(jnp.asarray(by), W))
        segs.append((jnp.asarray(words), jnp.asarray(lens), mn, mx))
    return segs, payloads


@pytest.mark.parametrize(
    "spec",
    [
        [(3, 13)],
        [(0, 0 + 5), (1, 78), (2, 2)],
        [(130, 150), (1, 300), (7, 7), (0, 140), (136, 136)],
        [(400, 700), (1, 78), (200, 420), (1, 1)],
    ],
    ids=["single", "tiny", "rate-straddling", "triple-like"],
)
def test_segmented_absorb_matches_hashlib(spec):
    rng = np.random.default_rng(hash(str(spec)) % 2**32)
    B = 17
    segs, payloads = _random_segments(rng, B, spec)
    state = kc.shake256_absorb_segments_words(segs)
    n_words = 16
    got = np.asarray(kc.shake256_squeeze_words(state, n_words))
    for b in range(B):
        want = hashlib.shake_256(payloads[b]).digest(4 * n_words)
        want_w = np.frombuffer(want, "<u4")
        np.testing.assert_array_equal(got[:, b], want_w, err_msg=f"lane {b}")


def test_segmented_absorb_matches_contiguous():
    rng = np.random.default_rng(9)
    B = 13
    segs, payloads = _random_segments(rng, B, [(10, 260), (1, 78), (50, 413)])
    total_max = sum(mx for _, _, _, mx in segs)
    pad_w = -(-(total_max + 1) // kc.RATE) * kc.RATE_WORDS
    buf = np.zeros((pad_w * 4, B), np.uint8)
    lens = np.zeros(B, np.int32)
    for b in range(B):
        buf[: len(payloads[b]), b] = np.frombuffer(payloads[b], np.uint8)
        lens[b] = len(payloads[b])
    words = rw.pack_bytes_to_words(jnp.asarray(buf), pad_w)
    want_state = kc.shake256_absorb_words(words, jnp.asarray(lens))
    got_state = kc.shake256_absorb_segments_words(segs)
    want = np.asarray(kc.shake256_squeeze_words(want_state, 40))
    got = np.asarray(kc.shake256_squeeze_words(got_state, 40))
    np.testing.assert_array_equal(got, want)
