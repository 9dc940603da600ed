"""Pallas TPU kernels: fused batched SHAKE256 sponge (absorb + squeeze).

The XLA sponge (ops/keccak.py) materializes the 50-word state between scan
steps; these kernels keep the state resident in VMEM across all rate blocks,
so HBM traffic collapses to one read of the payload words and one write of
the XOF words.

Streaming layout: VMEM (~16 MB) cannot hold a whole multi-KB payload batch,
so the grid is (batch_tiles, rate_blocks) with the *last* dimension iterating
sequentially (TPU grid order): the payload block spec walks one 136-byte rate
block per step while the state lives in an output whose index map ignores the
block index — Pallas keeps such a block in VMEM across the inner grid steps
(the standard reduction-accumulator pattern).

  payload words  uint32[max_blocks, 34, B/128, 128]  word w = 2l+h is the
                 (lo, hi) half of sponge lane l in that rate block
  state          uint32[50, B/128, 128]              rows 2l+h
  XOF words      uint32[out_blocks, 34, B/128, 128]

A batch tile is [8, 128] (1024 sponges): one state word = one full vreg.  The
24 rounds are python-unrolled; rho/pi are static shifts and renames exactly
as in ops/keccak.py (bit-identical output; parity vs hashlib asserted in
tests/test_keccak.py and on-chip in benchmarks).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .keccak import _PI_SRC, _RC, _ROT, RATE, _rotl_static

_U32 = jnp.uint32
_WPB = 34  # words per rate block: 17 lanes x (lo, hi)


def _round_unrolled(lanes, rc_lo: int, rc_hi: int):
    """One Keccak round on a list of 25 (lo, hi) vreg pairs; static constants."""
    C = []
    for x in range(5):
        lo = lanes[x][0] ^ lanes[x + 5][0] ^ lanes[x + 10][0] ^ lanes[x + 15][0] ^ lanes[x + 20][0]
        hi = lanes[x][1] ^ lanes[x + 5][1] ^ lanes[x + 10][1] ^ lanes[x + 15][1] ^ lanes[x + 20][1]
        C.append((lo, hi))
    D = []
    for x in range(5):
        rlo, rhi = _rotl_static(C[(x + 1) % 5][0], C[(x + 1) % 5][1], 1)
        D.append((C[(x + 4) % 5][0] ^ rlo, C[(x + 4) % 5][1] ^ rhi))
    A = [(lanes[l][0] ^ D[l % 5][0], lanes[l][1] ^ D[l % 5][1]) for l in range(25)]
    B = [None] * 25
    for dest in range(25):
        src = int(_PI_SRC[dest])
        B[dest] = _rotl_static(A[src][0], A[src][1], int(_ROT[src]))
    out = []
    for y in range(5):
        for x in range(5):
            b0, b1, b2 = B[x + 5 * y], B[(x + 1) % 5 + 5 * y], B[(x + 2) % 5 + 5 * y]
            out.append((b0[0] ^ (~b1[0] & b2[0]), b0[1] ^ (~b1[1] & b2[1])))
    out[0] = (out[0][0] ^ np.uint32(rc_lo), out[0][1] ^ np.uint32(rc_hi))
    return out


def _perm_unrolled(lanes):
    for r in range(24):
        lanes = _round_unrolled(lanes, int(_RC[r, 0]), int(_RC[r, 1]))
    return lanes


def _read_state(st_ref):
    return tuple((st_ref[2 * l], st_ref[2 * l + 1]) for l in range(25))


def _write_state(st_ref, lanes):
    st_ref[:] = jnp.stack([w for p in lanes for w in p])


@lru_cache(maxsize=16)
def _build_absorb(max_blocks: int, interpret: bool):
    def kernel(words_ref, nblk_ref, st_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            st_ref[:] = jnp.zeros((50, 8, 128), _U32)

        lanes = _read_state(st_ref)
        blk = words_ref[0]  # [34, 8, 128]
        absorbed = list(lanes)
        for l in range(17):
            absorbed[l] = (lanes[l][0] ^ blk[2 * l], lanes[l][1] ^ blk[2 * l + 1])
        nxt = _perm_unrolled(absorbed)
        live = j < nblk_ref[:]
        _write_state(
            st_ref,
            tuple(
                (jnp.where(live, nxt[l][0], lanes[l][0]), jnp.where(live, nxt[l][1], lanes[l][1]))
                for l in range(25)
            ),
        )

    def call(words4, nblk3):
        """words4 u32[max_blocks, 34, T, 128]; nblk3 i32[T, 128] -> state u32[50, T, 128]."""
        T = words4.shape[2]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((50, T, 128), jnp.uint32),
            grid=(T // 8, max_blocks),
            in_specs=[
                pl.BlockSpec((1, _WPB, 8, 128), lambda i, j: (j, 0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((50, 8, 128), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
            interpret=interpret,
        )(words4, nblk3)

    return call


@lru_cache(maxsize=16)
def _build_squeeze(out_blocks: int, interpret: bool):
    def kernel(st_in_ref, out_ref, st_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            st_ref[:] = st_in_ref[:]

        lanes = _read_state(st_ref)
        rate_rows = []
        for l in range(17):
            rate_rows.append(lanes[l][0])
            rate_rows.append(lanes[l][1])
        out_ref[0] = jnp.stack(rate_rows)
        if out_blocks > 1:
            _write_state(st_ref, _perm_unrolled(lanes))

    def call(state3):
        """state u32[50, T, 128] -> XOF words u32[out_blocks, 34, T, 128]."""
        T = state3.shape[1]
        out, _ = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((out_blocks, _WPB, T, 128), jnp.uint32),
                jax.ShapeDtypeStruct((50, T, 128), jnp.uint32),
            ),
            grid=(T // 8, out_blocks),
            in_specs=[
                pl.BlockSpec((50, 8, 128), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, _WPB, 8, 128), lambda i, j: (j, 0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((50, 8, 128), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(state3)
        return out

    return call


def _bytes_to_words_lm(buf, lens):
    """Lane-major padded payload bytes -> sponge word rows.

    buf uint8[max_blocks*RATE, B], lens int32[B] ->
    (uint32[max_blocks*34, B], int32[B] block counts).  Applies the SHAKE
    multi-rate padding exactly as ops/keccak._payload_to_blocks_lm.
    """
    total, B = buf.shape
    max_blocks = total // RATE
    lens = lens.astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (total, B), 0)
    data = jnp.where(pos < lens[None, :], buf, 0)
    n_blocks = lens // RATE + 1
    pad_head = jnp.where(pos == lens[None, :], np.uint8(0x1F), np.uint8(0))
    last_byte = n_blocks * RATE - 1
    pad_tail = jnp.where(pos == last_byte[None, :], np.uint8(0x80), np.uint8(0))
    data = data | pad_head | pad_tail
    w4 = data.reshape(max_blocks * _WPB, 4, B).astype(_U32)
    words = (
        w4[:, 0]
        | (w4[:, 1] << np.uint32(8))
        | (w4[:, 2] << np.uint32(16))
        | (w4[:, 3] << np.uint32(24))
    )
    return words, n_blocks


def _words_to_bytes_lm(words, n_out: int):
    """uint32[rows, B] XOF words -> uint8[n_out, B] byte stream."""
    rows, B = words.shape
    by = jnp.stack(
        [
            (words & np.uint32(0xFF)).astype(jnp.uint8),
            ((words >> np.uint32(8)) & np.uint32(0xFF)).astype(jnp.uint8),
            ((words >> np.uint32(16)) & np.uint32(0xFF)).astype(jnp.uint8),
            ((words >> np.uint32(24)) & np.uint32(0xFF)).astype(jnp.uint8),
        ],
        axis=1,
    )  # [rows, 4, B]
    return by.reshape(rows * 4, B)[:n_out]


def shake256_lm_pallas(buf, lens, n_out: int, interpret: bool = False):
    """Fused-sponge SHAKE256, lane-major: uint8[max_blocks*RATE, B] padded
    payloads (zero beyond ``lens``) -> uint8[n_out, B].  Bit-identical to
    ops/keccak semantics (hashlib.shake_256 per lane).  B must be a multiple
    of 1024 (one [8, 128] vreg tile per grid step).
    """
    total, B = buf.shape
    if B % 1024:
        raise ValueError(f"batch {B} must be a multiple of 1024")
    words, n_blocks = _bytes_to_words_lm(buf, lens)
    max_blocks = total // RATE
    out_blocks = -(-n_out // RATE)
    T = B // 128
    w4 = words.reshape(max_blocks, _WPB, T, 128)
    nb3 = n_blocks.reshape(T, 128)
    state = _build_absorb(max_blocks, interpret)(w4, nb3)
    out = _build_squeeze(out_blocks, interpret)(state)
    return _words_to_bytes_lm(out.reshape(out_blocks * _WPB, B), n_out)


def _pad_words_lm(words, lens):
    """Apply SHAKE multi-rate padding directly on packed little-endian words.

    words uint32[max_blocks*34, B] with ZERO content beyond ``lens`` (the
    assembly kernels guarantee zero scratch), lens int32[B] ->
    (padded words, block counts int32[B]).  The 0x1F head byte lands at byte
    offset ``len`` (word len>>2, lane shift 8*(len&3)); the 0x80 tail byte is
    always byte 3 of the last rate word (RATE % 4 == 0).
    """
    rows, B = words.shape
    lens = lens.astype(jnp.int32)
    widx = jax.lax.broadcasted_iota(jnp.int32, (rows, B), 0)
    head_word = lens // 4
    head_val = jnp.left_shift(np.uint32(0x1F), (np.uint32(8) * (lens % 4).astype(jnp.uint32)))
    n_blocks = lens // RATE + 1
    tail_word = (n_blocks * RATE) // 4 - 1
    w = words | jnp.where(widx == head_word[None, :], head_val[None, :], np.uint32(0))
    w = w | jnp.where(widx == tail_word[None, :], np.uint32(0x80000000), np.uint32(0))
    return w, n_blocks


def shake256_words_pallas(words, lens, n_out: int, interpret: bool = False):
    """Fused-sponge SHAKE256 from pre-packed payload words (the assembly
    kernels' "words" output): uint32[max_blocks*34, B] -> uint8[n_out, B].
    ``words`` must be zero beyond ``lens`` bytes; B a multiple of 1024.
    """
    rows, B = words.shape
    if B % 1024:
        raise ValueError(f"batch {B} must be a multiple of 1024")
    if rows % _WPB:
        raise ValueError(f"word rows {rows} must be a multiple of {_WPB}")
    max_blocks = rows // _WPB
    w, n_blocks = _pad_words_lm(words, lens)
    out_blocks = -(-n_out // RATE)
    T = B // 128
    state = _build_absorb(max_blocks, interpret)(
        w.reshape(max_blocks, _WPB, T, 128), n_blocks.reshape(T, 128)
    )
    out = _build_squeeze(out_blocks, interpret)(state)
    return _words_to_bytes_lm(out.reshape(out_blocks * _WPB, B), n_out)


def shake256_words_pallas_w(words, lens, n_words: int, interpret: bool = False):
    """Fused-sponge SHAKE256, packed words in AND out: uint32[max_blocks*34, B]
    payload words -> uint32[n_words, B] XOF stream words (same layout as
    keccak.shake256_squeeze_words — feeds ops/xof_decode.decode_coeffs_w with
    no byte unpacking).  ``words`` must be zero beyond ``lens`` bytes; B a
    multiple of 1024."""
    rows, B = words.shape
    if B % 1024:
        raise ValueError(f"batch {B} must be a multiple of 1024")
    if rows % _WPB:
        raise ValueError(f"word rows {rows} must be a multiple of {_WPB}")
    max_blocks = rows // _WPB
    w, n_blocks = _pad_words_lm(words, lens)
    out_blocks = -(-(4 * n_words) // RATE)
    T = B // 128
    state = _build_absorb(max_blocks, interpret)(
        w.reshape(max_blocks, _WPB, T, 128), n_blocks.reshape(T, 128)
    )
    out = _build_squeeze(out_blocks, interpret)(state)
    return out.reshape(out_blocks * _WPB, B)[:n_words]
