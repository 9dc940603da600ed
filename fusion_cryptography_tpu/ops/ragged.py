"""Device ragged byte assembly: decimal rendering + variable-length concat.

The reference hashes Python ``str()`` reprs of its object graphs (SURVEY.md
§2.14): preimages are long ASCII strings interleaving fixed boilerplate with
variable-width decimal integers.  To keep the whole hash pipeline on-device,
these preimages are assembled as tensors:

* :func:`render_decimal` turns int32 values into right-aligned 11-byte decimal
  fields (sign + up to 10 digits — any centered representative mod a 31-bit
  prime fits) plus (start, length) pairs describing the occupied suffix;
* :func:`ragged_concat` concatenates per-row segment lists — each segment a
  (source offset, length) view into a per-row byte pool — into one contiguous
  byte buffer per row via cumsum + searchsorted + a single gather.

Both are static-shape, branch-free, and feed ops/keccak.py's masked absorb.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_I32 = jnp.int32
_U32 = jnp.uint32

DEC_W = 11  # '-' + 10 digits covers |v| < 2**31


def render_decimal(values):
    """int32[..., K] -> (field uint8[..., K, DEC_W], start int32[..., K],
    length int32[..., K]).

    ``field[..., start:start+length]`` are exactly the bytes of ``str(v)``
    (right-aligned; bytes before ``start`` are scratch).
    """
    v = jnp.asarray(values, _I32)
    neg = v < 0
    a = jnp.where(neg, -v, v).astype(_U32)  # |int32 min| never occurs (|v| <= q//2)
    # divmod chain builds digits right-to-left at static positions
    digs = []
    cur = a
    for _ in range(DEC_W - 1):
        nxt = cur // np.uint32(10)
        digs.append((cur - nxt * np.uint32(10)).astype(jnp.uint8) + np.uint8(ord("0")))
        cur = nxt
    field = jnp.stack(digs[::-1], axis=-1)  # [..., 10], most-significant first
    nd = jnp.ones(a.shape, _I32)
    for k in range(1, DEC_W - 1):
        nd = nd + (a >= np.uint32(10**k)).astype(_I32)
    length = nd + neg.astype(_I32)
    start = np.int32(DEC_W) - length
    # prepend one scratch byte column, then drop the sign into place
    field = jnp.concatenate(
        [jnp.zeros(field.shape[:-1] + (1,), jnp.uint8), field], axis=-1
    )  # [..., 11]
    pos = jax.lax.broadcasted_iota(_I32, field.shape, field.ndim - 1)
    sign_here = neg[..., None] & (pos == start[..., None])
    return jnp.where(sign_here, np.uint8(ord("-")), field), start, length


def ragged_concat(pool, seg_off, seg_len, out_max: int):
    """Concatenate per-row ragged segments into contiguous byte rows.

    pool:    uint8[B, M]   per-row byte pool (templates + rendered numbers)
    seg_off: int32[B, S]   start of each segment inside ``pool``'s row
    seg_len: int32[B, S]   live bytes of each segment
    out_max: static upper bound on the concatenated length

    Returns (buf uint8[B, out_max], total int32[B]).  Bytes at or beyond
    ``total`` in ``buf`` are unspecified scratch (keccak absorb masks them).
    """
    B, S = seg_off.shape
    starts = jnp.cumsum(seg_len, axis=1) - seg_len  # exclusive cumsum [B, S]
    total = starts[:, -1] + seg_len[:, -1]
    pos = jnp.arange(out_max, dtype=_I32)
    # segment owning each output byte: last s with starts[s] <= p
    s_idx = jax.vmap(lambda st: jnp.searchsorted(st, pos, side="right"))(starts) - 1
    s_idx = jnp.clip(s_idx, 0, S - 1)
    r = pos[None, :] - jnp.take_along_axis(starts, s_idx, axis=1)
    src = jnp.take_along_axis(seg_off, s_idx, axis=1) + r
    src = jnp.clip(src, 0, pool.shape[1] - 1)  # tail positions read scratch
    return jnp.take_along_axis(pool, src, axis=1), total
