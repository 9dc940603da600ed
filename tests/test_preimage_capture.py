"""Unit-level preimage pinning for the device assembler against the LIVE
reference's hash inputs.

The reference's own tests patch ``sha3_256``/``shake_256`` to pin the exact
preimage strings fed to the hashes (/root/reference/tests/test_fusion.py:368-435).
This module does the same at the *device assembler* level: it runs the
reference's ``sign`` / ``hash_ag`` with the hashes instrumented to CAPTURE
every preimage, then asserts the device preimage pipeline
(interop/device_serial specs + word-carrier assembly) reproduces those exact
bytes for the same key/message — so a divergence is localized to the assembly
stage rather than surfacing as a far-downstream KAT mismatch.

Skipped when /root/reference is not mounted.
"""
import sys
from hashlib import sha3_256, shake_256
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")

if REF.exists() and str(REF) not in sys.path:
    sys.path.insert(0, str(REF))

import fusion_cryptography_tpu as ftpu
from fusion_cryptography_tpu.interop import device_serial as ds
from fusion_cryptography_tpu.ops import ragged_words as rw


class _CapturingHash:
    """hashlib-compatible shim recording every constructed preimage."""

    def __init__(self, real, log):
        self._real = real
        self._log = log

    def __call__(self, data=b""):
        self._log.append(bytes(data))
        return self._real(data)


def _capture_reference_preimages(ref, monkeypatch, secpar, seed, message):
    """Run reference keygen+sign (and agg-XOF derivation) for one key with
    instrumented hashes; returns (otvk, sha3_preimages, shake_preimages)."""
    sha_log, shake_log = [], []
    monkeypatch.setattr(ref, "sha3_256", _CapturingHash(sha3_256, sha_log))
    monkeypatch.setattr(ref, "shake_256", _CapturingHash(shake_256, shake_log))
    params = ref.fusion_setup(secpar, seed)
    otsk, otvk = ref.keygen(params, seed)
    sig = ref.sign(params, (otsk, otvk), message)
    ref.aggregate(params, [otvk], [message], [sig])
    return params, otvk, sha_log, shake_log


@pytest.mark.parametrize("secpar", [128, 256])
def test_device_preimages_match_reference_capture(secpar, monkeypatch):
    from fusion import fusion as ref  # type: ignore

    seed, message = 424242, "capture-me"
    rparams, otvk, sha_log, shake_log = _capture_reference_preimages(
        ref, monkeypatch, secpar, seed, message
    )

    params = ftpu.fusion_setup(secpar, seed)
    d = params.degree

    # -- SHA3 message prehash preimage (fusion.py:405-409) -------------------
    expect_pre = params.sign_pre_hash_dst.decode() + "," + message
    assert any(p == expect_pre.encode() for p in sha_log), sha_log[:2]

    # the integer the reference derives from it, rendered as the digit field
    # the device assemblers consume
    from fusion_cryptography_tpu.scheme.device_pipeline import prehash_digits

    pre_buf, pre_len = prehash_digits(params, [message] * 2)
    i_ref = ref.hash_message_to_int(rparams, message)
    assert bytes(pre_buf[0, : pre_len[0]]) == str(i_ref).encode()

    # -- challenge SHAKE preimage: dst + "," + str(vk) + "," + str(i) --------
    vk_np = np.stack(
        [
            np.array(otvk.left_vk_hat.matrix[0][0].values, dtype=np.int32),
            np.array(otvk.right_vk_hat.matrix[0][0].values, dtype=np.int32),
        ]
    )  # [2, d] — the reference object's coefficients, reused verbatim
    spec = ds.challenge_preimage_spec(params)
    pre_w = rw.pack_bytes_to_words(jnp.asarray(pre_buf[:1].T.astype(np.uint8)))
    buf_w, tot = ds.assemble_chunks_words(
        spec,
        values=jnp.asarray(vk_np.reshape(2 * d, 1)),
        extras=[(pre_w, jnp.asarray(pre_len[:1]))],
        extra_bounds=[(1, ds.PREHASH_W)],
    )
    got = bytes(
        np.asarray(rw.unpack_words_to_bytes(buf_w, spec.out_max))[: int(tot[0]), 0]
    )
    expect_ch = (
        params.sign_hash_dst.decode() + "," + str(otvk) + "," + str(i_ref)
    ).encode()
    assert got == expect_ch
    # and the reference actually hashed that exact string (sign's SHAKE call)
    assert any(p == expect_ch for p in shake_log)

    # -- aggregation SHAKE preimage: dst + "," + str(list(zip(...))) ---------
    agg_pre = [p for p in shake_log if p.startswith(bytes(params.agg_xof_dst))]
    assert agg_pre, "reference did not hash an aggregation preimage"
    # reproduce via the device triple + agg specs (single signer, N=1)
    c_hat = np.array(
        ref.hash_ch(rparams, otvk, message).c_hat.values, dtype=np.int32
    )
    tri_spec = ds.triple_spec(params)
    tvals = np.concatenate([vk_np.reshape(2 * d), c_hat]).astype(np.int32)
    tbuf_w, tlen = ds.assemble_chunks_words(
        tri_spec,
        values=jnp.asarray(tvals.reshape(3 * d, 1)),
        extras=[(pre_w, jnp.asarray(pre_len[:1]))],
        extra_bounds=[(1, ds.PREHASH_W)],
    )
    agg_spec = ds.agg_preimage_spec(params, 1, tri_spec.out_max)
    tri_min = ds.spec_min_total(tri_spec, [1])
    gbuf_w, gtot = ds.assemble_chunks_words(
        agg_spec,
        extras=[(tbuf_w[:, :1], tlen[:1])],
        extra_bounds=[(tri_min, tri_spec.out_max)],
    )
    got_agg = bytes(
        np.asarray(rw.unpack_words_to_bytes(gbuf_w, agg_spec.out_max))[: int(gtot[0]), 0]
    )
    assert got_agg == agg_pre[-1]
