"""Device Keccak/SHAKE256 vs hashlib (bit-exactness for every padding shape)."""
import hashlib

import numpy as np
import pytest

from fusion_cryptography_tpu.ops import keccak


def _ref_shake(payload: bytes, n: int) -> np.ndarray:
    return np.frombuffer(hashlib.shake_256(payload).digest(n), dtype=np.uint8)


@pytest.mark.parametrize(
    "lengths",
    [
        [0, 1, 2, 135, 136, 137, 271, 272, 273],  # every pad/boundary case
        [500, 1000, 7219, 10436],  # production challenge-preimage scale
    ],
)
def test_shake256_batch_matches_hashlib(lengths):
    rng = np.random.default_rng(sum(lengths) + 7)
    payloads = [rng.integers(0, 256, size=n, dtype=np.uint8).tobytes() for n in lengths]
    buf, lens = keccak.pad_payloads(payloads)
    n_out = 300  # crosses two squeeze blocks
    out = np.asarray(keccak.shake256_batch(buf, lens, n_out))
    for i, p in enumerate(payloads):
        assert np.array_equal(out[i], _ref_shake(p, n_out)), f"lane {i} (len {len(p)})"


def test_shake256_long_output():
    payloads = [b"fusion", b"x" * 136]
    buf, lens = keccak.pad_payloads(payloads)
    n_out = 10436  # secpar=256 challenge XOF length (77 squeeze blocks)
    out = np.asarray(keccak.shake256_batch(buf, lens, n_out))
    for i, p in enumerate(payloads):
        assert np.array_equal(out[i], _ref_shake(p, n_out))


def test_keccak_f_matches_known_vector():
    # keccak_f on the all-zero state equals absorbing the empty SHAKE payload
    # minus padding; cross-check via a one-block absorb of zeros against a
    # manual state comparison: SHAKE256("") first 136 bytes.
    buf, lens = keccak.pad_payloads([b""])
    state = keccak.shake256_absorb(buf, lens)
    first = np.asarray(keccak.shake256_squeeze(state, 136))[0]
    assert np.array_equal(first, _ref_shake(b"", 136))


def test_scratch_tail_bytes_are_ignored():
    payload = b"tail-independence"
    buf, lens = keccak.pad_payloads([payload])
    dirty = buf.copy()
    dirty[0, len(payload) :] = 0xAB  # garbage beyond len must not matter
    a = np.asarray(keccak.shake256_batch(buf, lens, 64))
    b = np.asarray(keccak.shake256_batch(dirty, lens, 64))
    assert np.array_equal(a, b)
    assert np.array_equal(a[0], _ref_shake(payload, 64))
