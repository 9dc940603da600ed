"""Interpret-mode parity tests for the fused Pallas sponge and assembly
kernels (ops/keccak_pallas.py, ops/assemble_pallas.py) against their tested
twins: hashlib.shake_256 / ops/keccak for the sponge, and
interop/device_serial.assemble_chunks_lm for the preimage assembler.

These run the exact kernel bodies through the Pallas interpreter on CPU
(mirroring tests/test_ntt_pallas.py) so a kernel bug shows up in the suite
instead of only on real TPU hardware."""
from hashlib import shake_256

import numpy as np
import pytest

import jax.numpy as jnp

import fusion_cryptography_tpu as ftpu
from fusion_cryptography_tpu.interop import device_serial as ds
from fusion_cryptography_tpu.ops.assemble_pallas import assemble_pallas
from fusion_cryptography_tpu.ops.keccak import RATE
from fusion_cryptography_tpu.ops.keccak_pallas import (
    shake256_lm_pallas,
    shake256_words_pallas,
)
from fusion_cryptography_tpu.scheme.device_pipeline import _pad_rate, prehash_digits

B_SPONGE = 1024  # the sponge kernels' minimum batch tile
B_ASM = 128  # the assembler's tile


def _random_payloads(rng, B, max_len):
    """Lane-major zero-padded payload buffer + ragged lengths (multi-block
    lengths included: the absorb loop must handle 0..max blocks)."""
    lens = rng.integers(0, max_len + 1, size=B).astype(np.int32)
    lens[0] = 0  # empty-message edge case
    lens[1] = max_len
    lens[2] = min(RATE - 1, max_len)  # pad byte in same block as payload tail
    lens[3] = min(RATE, max_len)  # pad byte starts a fresh block (if it fits)
    W = _pad_rate(max_len)
    buf = np.zeros((W, B), dtype=np.uint8)
    for k in range(B):
        buf[: lens[k], k] = rng.integers(0, 256, size=lens[k], dtype=np.uint8)
    return buf, lens


# ---------------------------------------------------------------------------
# Sponge kernel logic, tested at the component level.
#
# Running the full sponge kernels through the Pallas interpreter is infeasible
# here: the unrolled 24-round permutation makes the XLA *CPU compile* of the
# interpreted kernel take minutes (measured >300 s even for one block at the
# minimum 1024-lane batch).  Every piece of genuinely new logic — word-level
# multi-rate padding (_pad_words_lm), byte<->word packing, and the unrolled
# permutation (_round_unrolled/_perm_unrolled) — is a plain jnp function the
# kernel body calls, so it is tested directly against hashlib / ops/keccak.
# The pallas_call plumbing itself (grid, BlockSpecs, state refs) is covered by
# the on-chip smoke in bench/microbench plus device_pipeline's self-check
# (_pallas_selfcheck compares one kernel run against hashlib before the Pallas
# path can be enabled at all).
# ---------------------------------------------------------------------------


def test_perm_unrolled_matches_keccak_f():
    """The kernel's fully-unrolled permutation vs the tested lane permutation
    (ops/keccak.keccak_f_lanes) on random 1600-bit states."""
    from fusion_cryptography_tpu.ops.keccak import keccak_f_lanes
    from fusion_cryptography_tpu.ops.keccak_pallas import _perm_unrolled

    rng = np.random.default_rng(1)
    B = 8
    lanes = [
        (
            jnp.asarray(rng.integers(0, 1 << 32, size=(1, B), dtype=np.uint32)),
            jnp.asarray(rng.integers(0, 1 << 32, size=(1, B), dtype=np.uint32)),
        )
        for _ in range(25)
    ]
    want = keccak_f_lanes(tuple((lo, hi) for lo, hi in lanes))
    got = _perm_unrolled(list(lanes))
    for (glo, ghi), (wlo, whi) in zip(got, want):
        np.testing.assert_array_equal(np.asarray(glo), np.asarray(wlo))
        np.testing.assert_array_equal(np.asarray(ghi), np.asarray(whi))


def _pack_words_np(buf):
    """Little-endian word packing of a lane-major byte buffer (the layout the
    assembly kernels emit)."""
    W, B = buf.shape
    return (
        buf.reshape(W // 4, 4, B).astype(np.uint32)
        * np.array([1, 1 << 8, 1 << 16, 1 << 24], dtype=np.uint32)[None, :, None]
    ).sum(axis=1, dtype=np.uint32)


def _sponge_from_words(words, n_blocks, n_out):
    """Emulate the sponge kernels' dataflow in plain jnp: lane-major padded
    words -> masked absorb loop -> squeeze, using the exact helper functions
    the kernels call (_perm_unrolled, _words_to_bytes_lm)."""
    from fusion_cryptography_tpu.ops.keccak_pallas import (
        _WPB,
        _perm_unrolled,
        _words_to_bytes_lm,
    )

    rows, B = words.shape
    max_blocks = rows // _WPB
    zero = jnp.zeros((1, B), dtype=jnp.uint32)
    lanes = [(zero, zero) for _ in range(25)]
    w = np.asarray(words).reshape(max_blocks, _WPB, B)
    for blk in range(max_blocks):
        # mirror the kernel: XOR + permute unconditionally, then keep the old
        # state for lanes whose payload ended before this block
        live = (jnp.asarray(n_blocks) > blk)[None, :]
        absorbed = []
        for l in range(25):
            lo, hi = lanes[l]
            if 2 * l < _WPB:
                lo = lo ^ jnp.asarray(w[blk, 2 * l])[None, :]
            if 2 * l + 1 < _WPB:
                hi = hi ^ jnp.asarray(w[blk, 2 * l + 1])[None, :]
            absorbed.append((lo, hi))
        nxt = _perm_unrolled(absorbed)
        lanes = [
            (jnp.where(live, nxt[l][0], lanes[l][0]),
             jnp.where(live, nxt[l][1], lanes[l][1]))
            for l in range(25)
        ]
    out_blocks = -(-n_out // RATE)
    outs = []
    for ob in range(out_blocks):
        if ob:
            lanes = _perm_unrolled(lanes)
        for l in range(_WPB // 2):
            outs.append(lanes[l][0])
            outs.append(lanes[l][1])
    stream = jnp.concatenate(outs, axis=0)  # [out_blocks*_WPB, B]
    return _words_to_bytes_lm(stream, n_out)


@pytest.mark.parametrize("max_len,n_out", [(RATE - 2, 64), (3 * RATE, 300)])
def test_sponge_word_dataflow_matches_hashlib(max_len, n_out):
    """_pad_words_lm + masked word absorb + squeeze + _words_to_bytes_lm
    (the sponge kernels' exact dataflow) vs hashlib per lane."""
    from fusion_cryptography_tpu.ops.keccak_pallas import _pad_words_lm

    rng = np.random.default_rng(max_len)
    B = 128
    buf, lens = _random_payloads(rng, B, max_len)
    words = _pack_words_np(buf)
    w, n_blocks = _pad_words_lm(jnp.asarray(words), jnp.asarray(lens))
    out = np.asarray(_sponge_from_words(w, n_blocks, n_out))
    for k in range(B):
        want = shake_256(buf[: lens[k], k].tobytes()).digest(n_out)
        assert out[:, k].tobytes() == want, f"lane {k} len {lens[k]}"


def test_bytes_to_words_lm_matches_packing():
    """_bytes_to_words_lm (the byte-input kernel's packing + padding) agrees
    with numpy packing + _pad_words_lm."""
    from fusion_cryptography_tpu.ops.keccak_pallas import (
        _bytes_to_words_lm,
        _pad_words_lm,
    )

    rng = np.random.default_rng(3)
    buf, lens = _random_payloads(rng, 64, 2 * RATE)
    got_w, got_nb = _bytes_to_words_lm(jnp.asarray(buf), jnp.asarray(lens))
    want_w, want_nb = _pad_words_lm(
        jnp.asarray(_pack_words_np(buf)), jnp.asarray(lens)
    )
    np.testing.assert_array_equal(np.asarray(got_nb), np.asarray(want_nb))
    np.testing.assert_array_equal(np.asarray(got_w), np.asarray(want_w))


def _challenge_inputs(params, B, seed=11):
    """Realistic signer-stage inputs: vk value columns + prehash digit extras,
    exactly as device_pipeline.make_stages feeds the assembler."""
    rng = np.random.default_rng(seed)
    d = params.degree
    q = params.modulus
    vk2d_t = rng.integers(-(q // 2), q // 2 + 1, size=(2 * d, B)).astype(np.int32)
    msgs = [f"pallas-parity:{k}" for k in range(B)]
    pre_buf, pre_len = prehash_digits(params, msgs)
    return jnp.asarray(vk2d_t), jnp.asarray(pre_buf.T), jnp.asarray(pre_len)


@pytest.mark.parametrize("secpar", [128, 256])
def test_assemble_pallas_challenge_spec_matches_xla(secpar):
    params = ftpu.fusion_setup(secpar, 5)
    spec = ds.challenge_preimage_spec(params)
    bounds = [(1, ds.PREHASH_W)]
    vals, pre_buf, pre_len = _challenge_inputs(params, B_ASM)

    ref_buf, ref_tot = ds.assemble_chunks_lm(
        spec, values=vals, extras=[(pre_buf.astype(jnp.uint8), pre_len)],
        extra_bounds=bounds,
    )
    ref_buf, ref_tot = np.asarray(ref_buf), np.asarray(ref_tot)

    pad_to = _pad_rate(spec.out_max)
    # "words" mode: the packed little-endian stream must equal the byte stream
    words, tot = assemble_pallas(
        spec, values=vals, extras=[(pre_buf.astype(jnp.int32), pre_len)],
        extra_bounds=bounds, pad_to=pad_to, output="words", interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(tot), ref_tot)
    words = np.asarray(words)
    got_bytes = np.zeros((words.shape[0] * 4, B_ASM), dtype=np.uint8)
    for j in range(4):
        got_bytes[j::4] = (words >> (8 * j)).astype(np.uint8)
    np.testing.assert_array_equal(got_bytes[: ref_buf.shape[0]], ref_buf)
    assert not got_bytes[ref_buf.shape[0]:].any(), "pad region must be zero"

    # "bytes" mode
    bbuf, btot = assemble_pallas(
        spec, values=vals, extras=[(pre_buf.astype(jnp.int32), pre_len)],
        extra_bounds=bounds, pad_to=pad_to, output="bytes", interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(btot), ref_tot)
    np.testing.assert_array_equal(np.asarray(bbuf)[: ref_buf.shape[0]], ref_buf)


def test_assemble_pallas_triple_spec_bytes16(secpar=128):
    """The signer stage's triple-buffer output mode (int16 carrier)."""
    params = ftpu.fusion_setup(secpar, 6)
    spec = ds.triple_spec(params)
    bounds = [(1, ds.PREHASH_W)]
    rng = np.random.default_rng(3)
    d = params.degree
    q = params.modulus
    tvals = rng.integers(-(q // 2), q // 2 + 1, size=(3 * d, B_ASM)).astype(np.int32)
    msgs = [f"tri:{k}" for k in range(B_ASM)]
    pre_buf, pre_len = prehash_digits(params, msgs)
    pre_buf_t = jnp.asarray(pre_buf.T)
    pre_len = jnp.asarray(pre_len)

    ref_buf, ref_tot = ds.assemble_chunks_lm(
        spec, values=jnp.asarray(tvals),
        extras=[(pre_buf_t.astype(jnp.uint8), pre_len)], extra_bounds=bounds,
    )
    got_buf, got_tot = assemble_pallas(
        spec, values=jnp.asarray(tvals),
        extras=[(pre_buf_t.astype(jnp.int32), pre_len)], extra_bounds=bounds,
        output="bytes16", interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_tot), np.asarray(ref_tot))
    got = np.asarray(got_buf)
    assert got.dtype == np.int16 and (got >= 0).all() and (got < 256).all()
    np.testing.assert_array_equal(
        got[: ref_buf.shape[0]].astype(np.uint8), np.asarray(ref_buf)
    )


def test_assemble_pallas_rejects_untiled_batch():
    params = ftpu.fusion_setup(128, 5)
    spec = ds.challenge_preimage_spec(params)
    vals, pre_buf, pre_len = _challenge_inputs(params, B_ASM)
    with pytest.raises(ValueError, match="multiple of 128"):
        assemble_pallas(
            spec, values=vals[:, :100],
            extras=[(pre_buf[:, :100].astype(jnp.int32), pre_len[:100])],
            extra_bounds=[(1, ds.PREHASH_W)], output="bytes", interpret=True,
        )


def test_shake256_lm_pallas_rejects_untiled_batch():
    buf = jnp.zeros((RATE, 256), dtype=jnp.uint8)
    lens = jnp.zeros((256,), dtype=jnp.int32)
    with pytest.raises(ValueError, match="multiple of 1024"):
        shake256_lm_pallas(buf, lens, 32, interpret=True)
