"""Device decode: XOF byte streams -> bounded-coefficient polynomials.

Bit-exact twin of the host decoder (hashing/decode.py, which itself mirrors
the reference fusion/fusion.py:422-481), vectorized over a batch of B streams
so the decode rides the same device pipeline as the XOF (ops/keccak.py):

  [ signum bytes ][ weight_bound magnitude blocks ][ Fisher-Yates index stream ]

* signums: bit i (LSB-first) of the big-endian integer over the signum bytes;
* magnitudes: each bpc-byte block big-endian, ``(block % bound) + 1`` (bound=1
  in production, where every magnitude is 1 but the bytes are still consumed);
* placement: partial Fisher-Yates from i = degree-1 down to weight_bound+1
  (exclusive-bound quirk preserved, fusion.py:473).  All swap indices are
  derived up-front by a vectorized Horner reduction of the index stream; the
  swap chain itself is a ``lax.scan`` of one-hot updates over int32[B, degree].

Geometry (byte offsets) is static per parameter set, so everything traces to
fixed shapes.
"""
from __future__ import annotations

from dataclasses import dataclass
from math import ceil, log2

import jax
import jax.numpy as jnp
import numpy as np

_I32 = jnp.int32
_U32 = jnp.uint32


@dataclass(frozen=True)
class DecodeGeometry:
    """Static byte layout of one XOF-decoded polynomial (fusion.py:541-550)."""

    degree: int
    weight_bound: int
    bound: int
    bytes_per_coefficient: int
    bytes_per_index: int
    bytes_for_signums: int

    @property
    def index_stream_offset(self) -> int:
        return self.bytes_for_signums + self.weight_bound * self.bytes_per_coefficient

    @property
    def num_swaps(self) -> int:
        # fusion.py:473: for i in range(degree - 1, weight_bound, -1)
        return max(0, self.degree - 1 - self.weight_bound)

    @property
    def min_bytes(self) -> int:
        return self.bytes_for_signums + (
            self.bytes_per_coefficient + self.bytes_per_index
        ) * self.weight_bound


def geometry(log2_bias: int, modulus: int, degree: int, norm_bound: int, weight_bound: int) -> DecodeGeometry:
    """Derive the static layout exactly as the host decoder does."""
    bound = max(1, min(modulus // 2, norm_bound))
    if bound >= 1 << 24:
        raise NotImplementedError(
            "device Horner reduction needs bound*256 < 2**32; production bounds are tiny"
        )
    if not (0 < weight_bound <= degree):
        raise NotImplementedError("device decoder assumes 0 < weight_bound <= degree")
    return DecodeGeometry(
        degree=degree,
        weight_bound=weight_bound,
        bound=bound,
        bytes_per_coefficient=ceil((log2(bound) + 1 + log2_bias) / 8),
        bytes_per_index=ceil((log2(degree) + log2_bias) / 8),
        bytes_for_signums=ceil(weight_bound / 8),
    )


def _horner_mod(blocks, mods):
    """Big-endian bytes -> integer mod ``mods``, vectorized.

    blocks: uint8[..., nbytes]; mods: broadcastable int array (each < 2**24).
    Invariant: r < mod, so r*256 + byte < mod*256 + 256 fits uint32.
    """
    m = jnp.asarray(mods).astype(_U32)
    r = jnp.zeros(jnp.broadcast_shapes(blocks.shape[:-1], m.shape), _U32)
    for k in range(blocks.shape[-1]):
        r = (r * np.uint32(256) + blocks[..., k].astype(_U32)) % m
    return r


def decode_coeffs(xof_bytes, geom: DecodeGeometry):
    """uint8[B, n] XOF streams -> int32[B, degree] coefficient vectors."""
    d, w = geom.degree, geom.weight_bound
    B = xof_bytes.shape[0]
    if xof_bytes.shape[1] < geom.min_bytes:
        raise ValueError(
            f"Too few bytes to decode polynomial. Expected {geom.min_bytes} "
            f"but got {xof_bytes.shape[1]}"
        )

    # signums: bit i of the big-endian int over the first signum bytes
    nb = geom.bytes_for_signums
    i_arr = np.arange(w)
    src_byte = nb - 1 - i_arr // 8  # [w]
    shift = np.uint32(1) * (i_arr % 8).astype(np.uint32)
    sig_bytes = xof_bytes[:, src_byte].astype(_U32)  # [B, w]
    bits = (sig_bytes >> jnp.asarray(shift)) & np.uint32(1)
    signums = (2 * bits.astype(_I32)) - 1  # [B, w]

    # magnitudes
    if geom.bound == 1:
        mags = jnp.ones((B, w), _I32)
    else:
        off = nb
        blocks = xof_bytes[:, off : off + w * geom.bytes_per_coefficient].reshape(
            B, w, geom.bytes_per_coefficient
        )
        mags = _horner_mod(blocks, np.uint32(geom.bound)).astype(_I32) + 1

    coefs = jnp.concatenate(
        [mags * signums, jnp.zeros((B, d - w), _I32)], axis=1
    )  # [B, d]

    S = geom.num_swaps
    if S == 0:
        return coefs

    # swap targets: j_t = int(index bytes) % (i_t + 1), i_t = d-1-t.
    # The reference reads the index stream with plain byte slicing
    # (fusion.py:474), so a stream shorter than num_swaps * bytes_per_index
    # yields *truncated* big-endian ints at the boundary and empty reads
    # (value 0 -> j = 0) past the end — e.g. the aggregation blocks supply only
    # weight_bound index slots.  The per-swap available-byte counts are static,
    # so this is a statically masked Horner reduction.
    off = geom.index_stream_offset
    bpi = geom.bytes_per_index
    n = xof_bytes.shape[1]
    pad = max(0, off + S * bpi - n)
    xb = jnp.pad(xof_bytes, ((0, 0), (0, pad))) if pad else xof_bytes
    idx_blocks = xb[:, off : off + S * bpi].reshape(B, S, bpi)
    i_vals = np.arange(d - 1, w, -1)  # [S]
    avail = np.clip(n - (off + np.arange(S) * bpi), 0, bpi)  # [S]
    mods = jnp.asarray((i_vals + 1).astype(np.uint32))
    r = jnp.zeros((B, S), _U32)
    for k in range(bpi):
        nxt = (r * np.uint32(256) + idx_blocks[..., k].astype(_U32)) % mods
        r = jnp.where(jnp.asarray(k < avail)[None, :], nxt, r)
    j_all = r.astype(_I32)  # [B, S]

    iota_d = jax.lax.broadcasted_iota(_I32, (1, d), 1)

    def swap(state, xs):
        i_t, j_t = xs  # scalar, [B]
        oh_i = (iota_d == i_t).astype(_I32)  # [1, d]
        oh_j = (iota_d == j_t[:, None]).astype(_I32)  # [B, d]
        val_i = jnp.sum(state * oh_i, axis=1)  # [B]
        val_j = jnp.sum(state * oh_j, axis=1)  # [B]
        state = state + oh_i * (val_j - val_i)[:, None] + oh_j * (val_i - val_j)[:, None]
        return state, None

    coefs, _ = jax.lax.scan(swap, coefs, (jnp.asarray(i_vals, _I32), j_all.T))
    return coefs
