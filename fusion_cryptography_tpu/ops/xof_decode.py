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
  derived up-front by a vectorized Horner reduction of the index stream.  The
  swap chain only ever *relocates* the weight_bound live values (every other
  slot is zero), so instead of materializing int32[B, degree] swap states the
  ``lax.scan`` tracks the positions int32[B, weight_bound] of the live values
  through the chain (a swap (i, j) moves a tracked value at i to j and vice
  versa) and one final one-hot scatter places them — ~(degree/weight_bound)x
  less work per step than swapping full coefficient rows.

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


def consumed_bytes(geom: DecodeGeometry, n_xof: int) -> int:
    """Bytes of an ``n_xof``-byte XOF stream the decoder actually reads.

    The reference's output-length arithmetic (fusion.py:541-550) asks for
    ``bytes_per_index * degree`` index bytes but the partial Fisher-Yates only
    performs ``num_swaps`` (< degree) swaps, so the stream tail is never read.
    Squeezing only this many bytes is bit-exact: every index slice the decoder
    takes is identical (truncated reads happen only when n_xof itself is
    shorter, and then this returns n_xof unchanged).
    """
    return min(n_xof, geom.index_stream_offset + geom.num_swaps * geom.bytes_per_index)


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

    vals = mags * signums  # [B, w]

    S = geom.num_swaps
    if S == 0:
        return jnp.concatenate([vals, jnp.zeros((B, d - w), _I32)], axis=1)

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

    # Track the live values' positions through the swap chain: a swap (i, j)
    # sends a tracked value sitting at i to j and one sitting at j to i (a
    # value at both means i == j, where the two displacements cancel).
    p0 = jnp.broadcast_to(jnp.arange(w, dtype=_I32)[None, :], (B, w))

    def swap(p, xs):
        i_t, j_t = xs  # scalar int32, [B]
        j = j_t[:, None]  # [B, 1]
        at_i = (p == i_t).astype(_I32)
        at_j = (p == j).astype(_I32)
        return p + at_i * (j - i_t) + at_j * (i_t - j), None

    pos, _ = jax.lax.scan(swap, p0, (jnp.asarray(i_vals, _I32), j_all.T))
    # one-hot scatter of the w live values into their final slots (positions
    # are distinct, so the sum has at most one term per slot)
    iota_d = jax.lax.broadcasted_iota(_I32, (1, 1, d), 2)
    hits = (pos[:, :, None] == iota_d).astype(_I32)  # [B, w, d]
    return jnp.sum(vals[:, :, None] * hits, axis=1)


# ---------------------------------------------------------------------------
# Lane-major decode (production path): streams uint8[n, B], batch minor
# ---------------------------------------------------------------------------


def _horner_mod_lm(blocks, mods):
    """Lane-major :func:`_horner_mod`: blocks uint8[..., nbytes, B]; mods
    broadcastable against the [..., B] result."""
    m = jnp.asarray(mods).astype(_U32)
    shape = jnp.broadcast_shapes(blocks.shape[:-2] + blocks.shape[-1:], m.shape)
    r = jnp.zeros(shape, _U32)
    for k in range(blocks.shape[-2]):
        r = (r * np.uint32(256) + blocks[..., k, :].astype(_U32)) % m
    return r


def decode_coeffs_lm(xof_bytes, geom: DecodeGeometry):
    """Lane-major :func:`decode_coeffs`: uint8[n, B] streams -> int32[d, B].

    Identical arithmetic, batch-minor layout; the swap chain is fully
    unrolled at trace time (static step count).
    """
    d, w = geom.degree, geom.weight_bound
    n, B = xof_bytes.shape
    if n < geom.min_bytes:
        raise ValueError(
            f"Too few bytes to decode polynomial. Expected {geom.min_bytes} "
            f"but got {n}"
        )

    nb = geom.bytes_for_signums
    i_arr = np.arange(w)
    src_byte = nb - 1 - i_arr // 8  # [w]
    shift = (i_arr % 8).astype(np.uint32)
    sig_bytes = xof_bytes[src_byte].astype(_U32)  # [w, B]
    bits = (sig_bytes >> jnp.asarray(shift)[:, None]) & np.uint32(1)
    signums = (2 * bits.astype(_I32)) - 1  # [w, B]

    if geom.bound == 1:
        vals = signums
    else:
        off = nb
        blocks = xof_bytes[off : off + w * geom.bytes_per_coefficient].reshape(
            w, geom.bytes_per_coefficient, B
        )
        mags = _horner_mod_lm(blocks, np.uint32(geom.bound)).astype(_I32) + 1
        vals = mags * signums  # [w, B]

    S = geom.num_swaps
    if S == 0:
        return jnp.concatenate([vals, jnp.zeros((d - w, B), _I32)], axis=0)

    off = geom.index_stream_offset
    bpi = geom.bytes_per_index
    pad = max(0, off + S * bpi - n)
    xb = jnp.pad(xof_bytes, ((0, pad), (0, 0))) if pad else xof_bytes
    idx_blocks = xb[off : off + S * bpi].reshape(S, bpi, B)
    i_vals = np.arange(d - 1, w, -1)  # [S]
    avail = np.clip(n - (off + np.arange(S) * bpi), 0, bpi)  # [S]
    mods = jnp.asarray((i_vals + 1).astype(np.uint32))[:, None]
    r = jnp.zeros((S, B), _U32)
    for k in range(bpi):
        nxt = (r * np.uint32(256) + idx_blocks[:, k].astype(_U32)) % mods
        r = jnp.where(jnp.asarray(k < avail)[:, None], nxt, r)
    j_all = r.astype(_I32)  # [S, B]

    p0 = jnp.broadcast_to(jnp.arange(w, dtype=_I32)[:, None], (w, B))

    # On the accelerator the swap chain is fully unrolled at trace time: S is
    # static (195 in production) and each step is ~6 elementwise ops on
    # [w, B], so per-iteration scan latency dominates the arithmetic by >10x.
    # On CPU (the test suite) a partially-unrolled scan keeps compiles fast.
    try:
        full = jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover
        full = False
    if full:
        pos = p0
        for t in range(S):
            i_t = np.int32(i_vals[t])
            j = j_all[t][None, :]  # [1, B]
            at_i = (pos == i_t).astype(_I32)
            at_j = (pos == j).astype(_I32)
            pos = pos + at_i * (j - i_t) + at_j * (i_t - j)
    else:

        def swap(p, xs):
            i_t, j_t = xs  # scalar int32, [B]
            j = j_t[None, :]
            at_i = (p == i_t).astype(_I32)
            at_j = (p == j).astype(_I32)
            return p + at_i * (j - i_t) + at_j * (i_t - j), None

        pos, _ = jax.lax.scan(
            swap, p0, (jnp.asarray(i_vals, _I32), j_all), unroll=16
        )
    iota_d = jax.lax.broadcasted_iota(_I32, (1, d, 1), 1)
    hits = (pos[:, None, :] == iota_d).astype(_I32)  # [w, d, B]
    return jnp.sum(vals[:, None, :] * hits, axis=0)  # [d, B]
