"""Binary serialization round-trips (keys, signatures, params) and cross-level
interop: serialized objects keep verifying and re-serialize to identical wire
reprs."""
import numpy as np
import jax.numpy as jnp

import fusion_cryptography_tpu as ftpu
from fusion_cryptography_tpu.interop import serial
from fusion_cryptography_tpu.scheme import serde


def test_roundtrips_and_verify():
    params = ftpu.fusion_setup(128, 42)
    keys = ftpu.keygen(params, [7, 8])
    msgs = ["a", "b"]
    sigs = ftpu.sign(params, keys, msgs)
    agg = np.asarray(ftpu.aggregate(params, keys.vk_np(), msgs, sigs.sig))

    # params
    p2 = serde.decode_params(serde.encode_params(params))
    assert p2.secpar == 128
    np.testing.assert_array_equal(p2.public_challenge, params.public_challenge)
    assert serial.params_str(p2) == serial.params_str(params)

    # vk / sk / sig
    vk = keys.vk_np()[0]
    secpar, vk2 = serde.decode_vk(serde.encode_vk(params, vk))
    assert secpar == 128
    np.testing.assert_array_equal(vk2, vk)

    sk = np.asarray(keys.sk_hat)[0]
    secpar, seed, sk2 = serde.decode_sk(serde.encode_sk(params, 7, sk))
    assert (secpar, seed) == (128, 7)
    np.testing.assert_array_equal(sk2, sk)

    s0 = np.asarray(sigs.sig)[0]
    secpar, s2 = serde.decode_signature(serde.encode_signature(params, s0))
    np.testing.assert_array_equal(s2, s0)

    # decoded params + agg still verify (decoded params hash identically since
    # the repr — the wire format — is equal)
    secpar, agg2 = serde.decode_signature(serde.encode_signature(params, agg))
    ok, why = ftpu.verify(p2, keys.vk_np(), msgs, jnp.asarray(agg2))
    assert ok, why


def test_bad_magic_rejected():
    import pytest

    with pytest.raises(ValueError):
        serde.decode_vk(b"XXXX" + b"\x00" * 32)
