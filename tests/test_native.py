"""Native C pipeline vs pure-Python host pipeline: bit-exactness checks."""
import hashlib
import random

import numpy as np
import pytest

from fusion_cryptography_tpu import native
from fusion_cryptography_tpu.hashing.decode import decode_bytes_to_coefficients
from fusion_cryptography_tpu.hashing.sampler import (
    sample_short_poly_coeffs,
    sample_uniform_ntt_values,
)
from fusion_cryptography_tpu.hashing.xof import challenge_xof_len, hash_message_to_int
from fusion_cryptography_tpu.ops.field import Q

pytestmark = pytest.mark.skipif(not native.available(), reason="no C toolchain")


def test_sha3_and_shake_match_hashlib():
    rng = random.Random(0)
    for n in [0, 1, 135, 136, 137, 1000, 20000]:
        data = bytes(rng.randrange(256) for _ in range(n))
        assert native.sha3_256(data) == hashlib.sha3_256(data).digest()
        for outlen in [1, 32, 136, 137, 1551, 10436]:
            assert native.shake256(data, outlen) == hashlib.shake_256(data).digest(outlen)


def test_decode_matches_python():
    rng = random.Random(1)
    for degree, weight, bound, bias in [(64, 27, 1, 128), (256, 60, 1, 256), (64, 35, 7, 128)]:
        from math import ceil, log2

        bpc = ceil((log2(max(1, min(Q // 2, bound))) + 1 + bias) / 8)
        bpi = ceil((log2(degree) + bias) / 8)
        total = ceil(weight / 8) + (bpc + bpi) * weight
        b = bytes(rng.randrange(256) for _ in range(total + 8))
        py = decode_bytes_to_coefficients(b, bias, Q, degree, bound, weight)
        c = native.decode_coeffs(b, degree, weight, max(1, min(Q // 2, bound)), bpc, bpi)
        np.testing.assert_array_equal(py, c)


def test_samplers_match_cpython_random():
    seeds = [0, 1, 42, 2**31, 2**32 - 1, 323042374]
    got = native.sample_short_batch(seeds, 64, 52, 64, Q)
    for i, s in enumerate(seeds):
        expect = sample_short_poly_coeffs(Q, 64, 52, 64, s)
        np.testing.assert_array_equal(got[i], expect, err_msg=f"seed {s}")
    got = native.sample_short_batch(seeds, 256, 52, 60, Q)  # partial weight
    for i, s in enumerate(seeds):
        expect = sample_short_poly_coeffs(Q, 256, 52, 60, s)
        np.testing.assert_array_equal(got[i], expect, err_msg=f"seed {s}")
    got = native.sample_uniform_batch(seeds, 256, Q)
    for i, s in enumerate(seeds):
        expect = sample_uniform_ntt_values(Q, 256, s)
        np.testing.assert_array_equal(got[i], expect, err_msg=f"seed {s}")


def test_derive_challenges_matches_python():
    import fusion_cryptography_tpu as ftpu
    from fusion_cryptography_tpu.scheme.lifecycle import _challenge_coeffs

    params = ftpu.fusion_setup(128, 42)
    keys = ftpu.keygen(params, [5, 6, 7])
    msgs = ["a", "bb", "ccc"]
    vk_reprs = keys.vk_strs()
    n_xof = challenge_xof_len(params.secpar, params.degree, params.modulus,
                              params.beta_ch, params.omega_ch)
    coeffs, pre = native.derive_challenges(
        params.sign_pre_hash_dst, params.sign_hash_dst,
        [r.encode() for r in vk_reprs], [m.encode() for m in msgs],
        params.degree, params.omega_ch, max(1, min(params.modulus // 2, params.beta_ch)),
        params.bytes_for_one_coef_bdd_by_beta_ch,
        params.bytes_for_one_coef_bdd_by_beta_ch,  # bpc == bpi for these params
        n_xof,
    )
    for k in range(3):
        i_py, c_py = _challenge_coeffs(params, vk_reprs[k], msgs[k])
        np.testing.assert_array_equal(coeffs[k], c_py)
        assert int.from_bytes(bytes(pre[k]), "little") == i_py


def test_format_poly_matches_serializer():
    from fusion_cryptography_tpu.interop import serial

    rng = np.random.default_rng(2)
    vals = rng.integers(-(Q // 2), Q // 2 + 1, size=64, dtype=np.int64).astype(np.int32)
    meta = f"modulus={Q}, degree=64, root=23584283, inv_root=540632852, root_order=128, ".encode()
    got = native.format_poly(b"PolynomialNTTRepresentation", meta, b"values", vals)
    expect = serial.poly_ntt_str(Q, 64, 23584283, 540632852, 128, vals).encode()
    assert got == expect


def test_derive_alphas_grouped_native_vs_python_parity():
    """Regression: the keccak workers' 8-wide path must only engage on runs of
    equal absorb-block counts (a heterogeneous leading pair once slipped
    through and hashed with the wrong block count).  Compare the full native
    pipeline against the pure-Python fallback across enough groups to cross
    payload-length boundaries."""
    import fusion_cryptography_tpu as ftpu
    import fusion_cryptography_tpu.native as nat
    from fusion_cryptography_tpu.scheme import lifecycle as lc

    params = ftpu.fusion_setup(128, 42)
    G, N = 96, 3
    keys = ftpu.keygen(params, list(range(1, G * N + 1)))
    # message lengths varied so challenge payload block counts straddle
    msgs = ["m" * (1 + (i * 37) % 400) for i in range(G * N)]
    reprs = keys.vk_strs()
    cc_n, al_n = lc.derive_alphas_grouped(params, reprs, msgs, G, N)
    orig = nat.available
    nat.available = lambda: False
    try:
        cc_p, al_p = lc.derive_alphas_grouped(params, reprs, msgs, G, N)
    finally:
        nat.available = orig
    np.testing.assert_array_equal(cc_n, cc_p)
    np.testing.assert_array_equal(al_n, al_p)


def test_prehash_digits_native_vs_python_parity():
    """device_pipeline.prehash_digits switches to the native C path only above
    64 messages; assert the two branches agree byte-for-byte across the
    threshold (ADVICE r2: the native branch was never exercised by tests)."""
    import fusion_cryptography_tpu as ftpu
    import fusion_cryptography_tpu.native as nat
    from fusion_cryptography_tpu.scheme import device_pipeline as dp

    if not nat.available():
        import pytest

        pytest.skip("native library unavailable")
    params = ftpu.fusion_setup(128, 42)
    msgs = ["m" * (1 + (i * 53) % 300) + f":{i}" for i in range(130)]
    buf_n, len_n = dp.prehash_digits(params, msgs)  # native (>64)
    orig = nat.available
    nat.available = lambda: False
    try:
        buf_p, len_p = dp.prehash_digits(params, msgs)
    finally:
        nat.available = orig
    np.testing.assert_array_equal(len_n, len_p)
    np.testing.assert_array_equal(buf_n, buf_p)
