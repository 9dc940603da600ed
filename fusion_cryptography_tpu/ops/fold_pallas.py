"""Pallas VMEM log-depth preimage assembly (round-5 redesign of assemble_pallas).

The XLA word-assembly merge tree (interop/device_serial.assemble_chunks_words
over ops/ragged_words) is algebraically optimal — log-depth merges, narrow
barrels, slice operands — but XLA materializes every merge level's [W, B]
intermediate to HBM, leaving the stage ~2-3x above its VPU-op floor
(PERFORMANCE.md round 4: ~5.6 us/group across the three signer folds).  The
round-4 assemble_pallas kernel replaced the merge tree with a per-byte emit
loop and lost 2x the other way.

These kernels run the SAME log-depth merge algebra as ops/ragged_words —
bit-identical outputs, asserted in tests/test_fold_pallas.py — inside one
Pallas kernel per batch tile, so every merge level lives in VMEM:

* ``signer_fold_a`` : vk values + prehash digits -> folded str(vk) chunk AND
  the padded challenge preimage (dst + "," + str(vk) + "," + str(i),
  fusion.py:412-419) in one pass;
* ``signer_fold_b`` : the folded vk chunk + prehash + challenge values ->
  the padded triple str((vk, i, challenge)) (fusion.py:586-589);
* ``agg_fold``      : N triple chunks -> the padded aggregation preimage
  (dst + "," + str(list(zip(...))), fusion.py:573-591).

Mosaic-specific deviations from ops/ragged_words (outputs unchanged):
radix-2 where-chain barrels (select_n is 2-ary in Mosaic), template words
passed as a [Wc, 1] const-pool input (captured array constants are
unsupported), separators ORed in as scalar word fills.

CONCAT-FREE barrels (the round-5b redesign): the first fold_pallas lost to
the XLA merge tree because every pad/prepend was a ``jnp.concatenate`` —
a full-buffer VMEM copy, usually sublane-misaligned — and the radix-2
barrel re-padded per PASS, so the kernel did more vector copies than the
XLA path did HBM passes.  Now each merge pads its right chunk ONCE to
``window + R`` (R = the barrel's total worst-case word shift), static word
moves are ``pltpu.roll`` ops (zero-wrap is safe because bytes at or beyond
``length`` are zero and the pad bound covers the roll), and every barrel
pass is two static in-bounds slices + one where, with DESCENDING widths
(``width_p = window + R_remaining``, processed largest bit first) so late
passes touch only the live window.  Bit-exactness is unchanged
(tests/test_fold_pallas.py).
"""
from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ragged_words as rw

_U32 = jnp.uint32
_I32 = jnp.int32
DEC_W = rw.DEC_W


# ---------------------------------------------------------------------------
# Mosaic-safe twins of the ops/ragged_words primitives (same algebra)
# ---------------------------------------------------------------------------


_INTERPRET = False  # set by the public wrappers; selects the roll lowering


def _zero_rows(buf, n: int):
    shape = list(buf.shape)
    shape[-2] = n
    return jnp.zeros(shape, buf.dtype)


def _pad_rows(buf, n: int):
    """Append n zero words on the word axis (jnp.pad twin)."""
    if n <= 0:
        return buf
    return jnp.concatenate([buf, _zero_rows(buf, n)], axis=-2)


def _prepend_rows(buf, n: int):
    if n <= 0:
        return buf
    return jnp.concatenate([_zero_rows(buf, n), buf], axis=-2)


def _roll_rows(buf, shift: int):
    """Circular roll along the word axis: out[i] = buf[(i - shift) % W].

    ``pltpu.roll`` on the compiled path (a sublane rotate, no copy chain);
    slice+concat under interpret mode and for >2D values (Mosaic's roll is
    a 2D vreg op; the >2D callers are the small early cell levels where the
    concat form is cheap anyway)."""
    W = buf.shape[-2]
    shift %= W
    if shift == 0:
        return buf
    if _INTERPRET or buf.ndim != 2:
        lo = jax.lax.slice_in_dim(buf, W - shift, W, axis=buf.ndim - 2)
        hi = jax.lax.slice_in_dim(buf, 0, W - shift, axis=buf.ndim - 2)
        return jnp.concatenate([lo, hi], axis=-2)
    return pltpu.roll(buf, shift, axis=buf.ndim - 2)


def _word_iota(buf):
    return jax.lax.broadcasted_iota(_I32, buf.shape, buf.ndim - 2)


def _shift_right_static(buf, r: int):
    """ragged_words.shift_right_w_static: roll-carry, no concat copy."""
    if r == 0:
        return buf
    sh = np.uint32(8 * r)
    csh = np.uint32(32 - 8 * r)
    lo = buf << sh
    if buf.shape[-2] == 1:  # single-word chunk: no carry source
        return lo
    prv = _roll_rows(buf, 1)
    prv = jnp.where(_word_iota(buf) == 0, np.uint32(0), prv)
    return lo | (prv >> csh)


def _barrel_bits(max_wq: int):
    bits = []
    bit = 1
    while bit <= max_wq:
        bits.append(bit)
        bit <<= 1
    return bits


def _shift_left_w(buf, s, max_s: int, pre_padded: bool = False):
    """ragged_words.shift_left_w: one dynamic sub-word pass + a RADIX-2
    word barrel.  Concat-free: the buffer is padded ONCE by the barrel's
    total worst-case word shift R (or arrives ``pre_padded`` by >= R), then
    every pass is two static in-bounds slices + a where, with descending
    widths (largest bit first) — the select never sees a pad-created
    operand and late passes shrink to the live window."""
    if max_s <= 0:
        return buf
    s = s.astype(_I32)
    r = (s & 3).astype(_U32)[..., None, :]
    sa = np.uint32(8) * r
    if buf.shape[-2] == 1:
        nxt = _zero_rows(buf, 1)
    else:
        nxt = _roll_rows(buf, -1)
        nxt = jnp.where(_word_iota(buf) == buf.shape[-2] - 1, np.uint32(0), nxt)
    hi = jnp.where(sa > 0, nxt << (np.uint32(32) - sa), np.uint32(0))
    buf = jnp.where(sa > 0, (buf >> sa) | hi, buf)
    wq = s >> 2
    max_wq = max_s >> 2
    bits = _barrel_bits(max_wq)
    if not bits:
        return buf
    R = sum(bits)
    if not pre_padded:
        buf = _pad_rows(buf, R)
    Ww = buf.shape[-2] - R  # output width
    rem = R
    for bit in reversed(bits):
        rem -= bit
        w_out = Ww + rem
        take = ((wq & bit) != 0)[..., None, :]
        cur = jax.lax.slice_in_dim(buf, 0, w_out, axis=buf.ndim - 2)
        sh = jax.lax.slice_in_dim(buf, bit, bit + w_out, axis=buf.ndim - 2)
        buf = jnp.where(take, sh, cur)
    return buf


def _mask_tail_w(buf, length):
    Ww = buf.shape[-2]
    wi = jax.lax.broadcasted_iota(_I32, buf.shape, buf.ndim - 2)
    keep = jnp.clip(length[..., None, :] - 4 * wi, 0, 4)
    mask = jnp.where(
        keep >= 4,
        np.uint32(0xFFFFFFFF),
        (np.uint32(1) << (np.uint32(8) * keep.astype(_U32))) - np.uint32(1),
    )
    return buf & mask


def _merge_w(a: rw.WChunk, b: rw.WChunk) -> rw.WChunk:
    """ragged_words.merge_w with ONE pad + roll placement per merge.

    b is padded once to ``nw + P`` (P covers both the barrel headroom R and
    the static placement roll), statically sub-word-shifted (roll carry),
    rolled to word ``q0 // 4`` (wrap-safe: the pad bound keeps the wrapped
    words zero), then barrel-shifted in place with descending widths."""
    W = a.max_len + b.max_len
    Ww = rw.words_for(W)
    slack = a.max_len - a.min_len
    pa = a.buf
    if pa.shape[-2] < Ww:
        pa = _pad_rows(pa, Ww - pa.shape[-2])
    else:
        pa = jax.lax.slice_in_dim(pa, 0, Ww, axis=pa.ndim - 2)
    base_w = a.min_len // 4
    nw = Ww - base_w
    q0 = (a.min_len % 4) + slack
    lr = q0 % 4
    pb = b.buf
    need = rw.words_for(b.max_len + lr)
    R = sum(_barrel_bits(slack >> 2))
    P = max(R, q0 // 4 + need - nw, 0)
    if pb.shape[-2] < nw + P:
        pb = _pad_rows(pb, nw + P - pb.shape[-2])
    else:
        pb = jax.lax.slice_in_dim(pb, 0, nw + P, axis=pb.ndim - 2)
    pb = _shift_right_static(pb, lr)
    pb = _roll_rows(pb, q0 // 4)
    if P > R:
        pb = jax.lax.slice_in_dim(pb, 0, nw + R, axis=pb.ndim - 2)
    pb = _shift_left_w(pb, a.max_len - a.length, slack, pre_padded=R > 0)
    if pb.shape[-2] > nw:  # R == 0 but P > 0: sub-word-only barrel kept P
        pb = jax.lax.slice_in_dim(pb, 0, nw, axis=pb.ndim - 2)
    pb = _prepend_rows(pb, base_w)
    return rw.WChunk(
        buf=pa | pb,
        length=a.length + b.length,
        max_len=W,
        min_len=a.min_len + b.min_len,
    )


def _expand_block(v, block_w: int):
    """[nb, B] per-block values -> [nb*block_w, B] (broadcast along the block
    words; the reshape is tile-aligned because block_w is a multiple of 8)."""
    nb, B = v.shape
    return jnp.broadcast_to(v[:, None, :], (nb, block_w, B)).reshape(
        nb * block_w, B
    )


def _flat_byte_lt_mask(W: int, block_w: int, upto_bytes, B: int):
    """uint32[W, B] mask keeping block-local bytes < ``upto_bytes`` [nb, B]."""
    lw = jax.lax.broadcasted_iota(_I32, (W, B), 0) & np.int32(block_w - 1)
    keep = jnp.clip(_expand_block(upto_bytes, block_w) - 4 * lw, 0, 4)
    return jnp.where(
        keep >= 4,
        np.uint32(0xFFFFFFFF),
        (np.uint32(1) << (np.uint32(8) * keep.astype(_U32))) - np.uint32(1),
    )


def _merge_cells_flat(cells: rw.WChunk) -> rw.WChunk:
    """Power-of-two flat-slot merge tree: the whole [K, cw, B] cell batch
    lives in ONE [K*S, B] buffer (each node in a static power-of-two slot,
    zeros elsewhere) and every level is a global LEFT-SHIFT DELETION:

      odd_only = level & (bytes in the odd half below its content end)
      left     = level & (bytes below len_even)       # also zeroes odd half
      merged   = left | shift_left(odd_only, slot_bytes - len_even)

    The left shift uses global circular rolls: entering bytes always come
    from the NEXT block's left region, which odd_only zeroed — so no pass
    needs a boundary mask and no contamination survives (content never
    reaches the last ``slot - 13*2^l`` bytes of a block).  Every operand is
    the full [K*S, B] buffer -> full vreg occupancy at every level, one
    where per barrel bit, zero concats.  Bit-identical to merge_cells_w
    (same concatenation, associativity), asserted in tests/test_fold_pallas.
    """
    K0, cw_w, B = cells.buf.shape
    if K0 == 1:
        return rw.WChunk(cells.buf[0], cells.length[0], cells.max_len, cells.min_len)
    Kp = 1
    while Kp < K0:
        Kp *= 2
    buf = cells.buf
    lens = cells.length.astype(_I32)
    min_cell = cells.min_len if Kp == K0 else 0
    if cw_w < 4:
        buf = _pad_rows(buf, 4 - cw_w)
    if Kp != K0:  # pad with EMPTY cells (length 0 => concat no-ops)
        buf = jnp.concatenate(
            [buf, jnp.zeros((Kp - K0, buf.shape[1], B), _U32)], axis=0
        )
        lens = jnp.concatenate([lens, jnp.zeros((Kp - K0, B), _I32)], axis=0)
    # level 0 on the K-leading axis (4-word windows; the flat levels need
    # 8-word-aligned slots, which pairs of 4-word cells provide)
    pr = buf.reshape(Kp // 2, 2, buf.shape[1], B)
    lr = lens.reshape(Kp // 2, 2, B)
    even = rw.WChunk(pr[:, 0], lr[:, 0], cells.max_len, min_cell)
    odd = rw.WChunk(pr[:, 1], lr[:, 1], cells.max_len, min_cell)
    m0 = _merge_w(even, odd)
    M = Kp // 2
    S = 8  # words per node slot
    pb = m0.buf
    if pb.shape[1] < S:
        pb = _pad_rows(pb, S - pb.shape[1])
    flat = pb.reshape(M * S, B)
    lens = m0.length
    lmax = 2 * cells.max_len  # static bound on node content bytes (< 4*S)
    while M > 1:
        nb = M // 2
        W = flat.shape[0]
        block_w = 2 * S
        lp = lens.reshape(nb, 2, B)
        b, lo_ = lp[:, 0], lp[:, 1]
        # odd halves, cleaned of carried tail garbage, left region zeroed
        # (the odd half starts at the word-aligned static byte 4*S)
        lw = jax.lax.broadcasted_iota(_I32, (W, B), 0) & np.int32(block_w - 1)
        odd_only = jnp.where(lw >= S, flat, np.uint32(0)) & _flat_byte_lt_mask(
            W, block_w, np.int32(4 * S) + lo_, B
        )
        left = flat & _flat_byte_lt_mask(W, block_w, b, B)
        # shift odd_only LEFT by s = 4*S - b bytes (block-local semantics via
        # global rolls: entering bytes are the next block's zeroed left half)
        s = np.int32(4 * S) - b
        r = (s & 3).astype(_U32)
        r_exp = _expand_block(r.astype(_I32), block_w).astype(_U32)
        nxt = _roll_rows(odd_only, -1)
        hi = jnp.where(
            r_exp > 0, nxt << (np.uint32(32) - np.uint32(8) * r_exp), np.uint32(0)
        )
        odd_only = jnp.where(
            r_exp > 0, (odd_only >> (np.uint32(8) * r_exp)) | hi, odd_only
        )
        wq = s >> 2
        bit = 1
        while bit <= S:
            take = _expand_block(((wq & bit) != 0).astype(_I32), block_w) != 0
            flat_sh = _roll_rows(odd_only, -bit)
            odd_only = jnp.where(take, flat_sh, odd_only)
            bit <<= 1
        flat = left | odd_only
        lens = b + lo_
        M = nb
        S = 2 * S
        lmax = 2 * lmax
    return rw.WChunk(
        buf=flat,
        length=lens[0],
        max_len=K0 * cells.max_len,
        min_len=K0 * cells.min_len,
    )


def _merge_cells_w(cells: rw.WChunk) -> rw.WChunk:
    if cells.buf.shape[0] >= 8 and cells.buf.shape[1] <= 4 and cells.max_len < 16:
        return _merge_cells_flat(cells)
    tails = []
    cur = cells
    while cur.buf.shape[0] > 1:
        K = cur.buf.shape[0]
        half = K // 2
        if K % 2:
            tails.append(
                rw.WChunk(cur.buf[K - 1], cur.length[K - 1], cur.max_len, cur.min_len)
            )
        pb = cur.buf[: 2 * half].reshape(half, 2, *cur.buf.shape[1:])
        plen = cur.length[: 2 * half].reshape(half, 2, *cur.length.shape[1:])
        even = rw.WChunk(pb[:, 0], plen[:, 0], cur.max_len, cur.min_len)
        odd = rw.WChunk(pb[:, 1], plen[:, 1], cur.max_len, cur.min_len)
        cur = _merge_w(even, odd)
    out = rw.WChunk(cur.buf[0], cur.length[0], cur.max_len, cur.min_len)
    for t in reversed(tails):
        out = _merge_w(out, t)
    return out


def _fold_chunks_w(nodes) -> rw.WChunk:
    nodes = list(nodes)
    while len(nodes) > 1:
        nxt = []
        for i in range(0, len(nodes) - 1, 2):
            nxt.append(_merge_w(nodes[i], nodes[i + 1]))
        if len(nodes) % 2:
            nxt.append(nodes[-1])
        nodes = nxt
    return nodes[0]


def _render_cells(values, sep: bytes) -> rw.WChunk:
    """ragged_words.render_decimal_cells_w with scalar-fill separators."""
    v = jnp.asarray(values, _I32)
    K, B = v.shape
    neg = v < 0
    a = jnp.where(neg, -v, v).astype(_U32)
    digs = []
    cur = a
    for _ in range(DEC_W - 1):
        nxt = cur // np.uint32(10)
        digs.append(cur - nxt * np.uint32(10) + np.uint32(ord("0")))
        cur = nxt
    digs = digs[::-1]
    nd = jnp.ones(a.shape, _I32)
    for k in range(1, DEC_W - 1):
        nd = nd + (a >= np.uint32(10**k)).astype(_I32)
    length = nd + neg.astype(_I32)
    start = np.int32(DEC_W) - length
    planes = [jnp.zeros_like(a)] + digs + [jnp.zeros_like(a)]
    field = jnp.stack(
        [
            planes[4 * w]
            | (planes[4 * w + 1] << np.uint32(8))
            | (planes[4 * w + 2] << np.uint32(16))
            | (planes[4 * w + 3] << np.uint32(24))
            for w in range(rw.DEC_WW)
        ],
        axis=-2,
    )  # [K, 3, B]
    s_w = (start >> 2)[..., None, :]
    s_r = (np.uint32(8) * (start & 3).astype(_U32))[..., None, :]
    wi = jax.lax.broadcasted_iota(_I32, field.shape, field.ndim - 2)
    hit = neg[..., None, :] & (wi == s_w)
    sign_val = np.uint32(ord("-")) << s_r
    byte_mask = ~(np.uint32(0xFF) << s_r)
    field = jnp.where(hit, (field & byte_mask) | sign_val, field)
    field = _shift_left_w(field, start, DEC_W - 1)
    field = _mask_tail_w(field, length)
    s = len(sep)
    if s == 0:
        return rw.WChunk(buf=field, length=length, max_len=DEC_W, min_len=1)
    Wc = s + DEC_W
    Ww = rw.words_for(Wc)
    pf = field
    need = rw.words_for(DEC_W + s)
    if pf.shape[-2] < need:
        pf = _pad_rows(pf, need - pf.shape[-2])
    pf = _shift_right_static(pf, s % 4)
    pf = _prepend_rows(pf, s // 4)
    if pf.shape[-2] < Ww:
        pf = _pad_rows(pf, Ww - pf.shape[-2])
    else:
        pf = jax.lax.slice_in_dim(pf, 0, Ww, axis=pf.ndim - 2)
    # OR the static separator bytes in as per-word scalar fills
    sep_words = rw.pack_const_words(sep)
    parts = []
    for wdx in range(pf.shape[-2]):
        row = jax.lax.slice_in_dim(pf, wdx, wdx + 1, axis=pf.ndim - 2)
        if wdx < len(sep_words) and int(sep_words[wdx]):
            row = row | np.uint32(int(sep_words[wdx]))
        parts.append(row)
    buf = jnp.concatenate(parts, axis=-2)
    return rw.WChunk(
        buf=buf, length=length + np.int32(s), max_len=Wc, min_len=s + 1
    )


# ---------------------------------------------------------------------------
# Spec-node evaluation against a const pool ref
# ---------------------------------------------------------------------------


def _build_const_pool(nodes) -> Tuple[np.ndarray, dict]:
    """Pack every const node's words into one uint32[Wc, 1] pool."""
    words: List[int] = []
    offsets = {}
    for i, node in enumerate(nodes):
        if node[0] == "const":
            cw = rw.pack_const_words(node[1])
            offsets[i] = (len(words), len(cw), len(node[1]))
            words.extend(int(w) for w in cw)
    pool = np.asarray(words or [0], dtype=np.uint32).reshape(-1, 1)
    return pool, offsets


def _const_chunk_from_pool(pool_ref, off: int, nw: int, nbytes: int, B: int) -> rw.WChunk:
    rowz = jnp.broadcast_to(pool_ref[off : off + nw, 0:1], (nw, B))
    return rw.WChunk(
        buf=rowz,
        length=jnp.full((B,), nbytes, _I32),
        max_len=nbytes,
        min_len=nbytes,
    )


def _eval_nodes(nodes, pool_ref, offsets, values, extras, extra_bounds, B: int):
    out = []
    for i, node in enumerate(nodes):
        if node[0] == "const":
            off, nw, nbytes = offsets[i]
            out.append(_const_chunk_from_pool(pool_ref, off, nw, nbytes, B))
        elif node[0] == "cells":
            _, sep, i0, count = node
            cells = _render_cells(values[i0 : i0 + count], sep)
            out.append(
                _merge_cells_w(cells)
                if count > 1
                else rw.WChunk(cells.buf[0], cells.length[0], cells.max_len, cells.min_len)
            )
        else:
            e = node[1]
            eb, el = extras[e]
            lo, hi = extra_bounds[e]
            out.append(rw.WChunk(buf=eb, length=el.astype(_I32), max_len=hi, min_len=lo))
    return out


def _finish(chunk: rw.WChunk, pad_words: int):
    pad = pad_words - chunk.buf.shape[0]
    buf = _pad_rows(chunk.buf, pad) if pad > 0 else chunk.buf[:pad_words]
    return buf, chunk.length


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


@lru_cache(maxsize=16)
def _signer_a_call(params, tile: int, interpret: bool):
    """vk2d_t i32[2d, B], pre_w u32[20, B], pre_len i32[1, B] ->
    (ch_wbuf u32[Wch, B], ch_total i32[1, B], vk_buf u32[Wvk, B],
    vk_len i32[1, B])."""
    from ..interop import device_serial as ds

    d = params.degree
    vk_spec = ds.vk_body_spec(params)
    vk_nodes = ds._compile_spec(vk_spec)
    ch_spec = ds.challenge_preimage_spec(params)
    pool_np, offsets = _build_const_pool(vk_nodes)
    dst = bytes(params.sign_hash_dst) + b","
    dst_w = rw.pack_const_words(dst)
    comma_w = rw.pack_const_words(b",")
    pool2 = np.concatenate(
        [pool_np, np.asarray([int(w) for w in dst_w] + [int(comma_w[0])],
                             np.uint32).reshape(-1, 1)]
    )
    dst_off, comma_off = len(pool_np), len(pool_np) + len(dst_w)
    Wvk = rw.words_for(vk_spec.out_max)
    pad_ch = -(-(ch_spec.out_max + 1) // 136) * 34  # whole SHAKE256 rate blocks
    pre_w_rows = rw.words_for(ds.PREHASH_W + 2)  # 20 words (render layout)

    def kernel(vk_ref, pre_ref, plen_ref, pool_ref, chb_ref, cht_ref,
               vkb_ref, vkl_ref):
        B = vk_ref.shape[-1]
        vals = vk_ref[:]
        pre = rw.WChunk(
            buf=pre_ref[:], length=plen_ref[0, :], max_len=ds.PREHASH_W, min_len=1
        )
        vk_chunk = _fold_chunks_w(
            _eval_nodes(vk_nodes, pool_ref, offsets, vals, (), (), B)
        )
        ch = _fold_chunks_w(
            [
                _const_chunk_from_pool(pool_ref, dst_off, len(dst_w), len(dst), B),
                vk_chunk,
                _const_chunk_from_pool(pool_ref, comma_off, 1, 1, B),
                pre,
            ]
        )
        chb, cht = _finish(ch, pad_ch)
        chb_ref[:] = chb
        cht_ref[:] = cht[None, :]
        vkb, vkl = _finish(vk_chunk, Wvk)
        vkb_ref[:] = vkb
        vkl_ref[:] = vkl[None, :]

    def call(vk2d_t, pre_w, pre_len):
        global _INTERPRET
        _INTERPRET = interpret
        B = vk2d_t.shape[-1]
        grid = (B // tile,)
        col = lambda i: (0, i)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((pad_ch, B), _U32),
                jax.ShapeDtypeStruct((1, B), _I32),
                jax.ShapeDtypeStruct((Wvk, B), _U32),
                jax.ShapeDtypeStruct((1, B), _I32),
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((2 * d, tile), col, memory_space=pltpu.VMEM),
                pl.BlockSpec((pre_w_rows, tile), col, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM),
                pl.BlockSpec((len(pool2), 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((pad_ch, tile), col, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM),
                pl.BlockSpec((Wvk, tile), col, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(vk2d_t, pre_w, pre_len[None, :].astype(_I32), jnp.asarray(pool2))

    return call


@lru_cache(maxsize=16)
def _signer_b_call(params, tile: int, interpret: bool):
    """vk_buf u32[Wvk, B], vk_len i32[1, B], pre_w, pre_len, c_hat_t i32[d, B]
    -> (tri_wbuf u32[Wtri, B], tri_total i32[1, B])."""
    from ..interop import device_serial as ds

    d = params.degree
    vk_spec = ds.vk_body_spec(params)
    chb_spec = ds.challenge_body_spec(params)
    chb_nodes = ds._compile_spec(chb_spec)
    tri_spec = ds.triple_spec(params)
    pool_np, offsets = _build_const_pool(chb_nodes)
    extra_consts = [rw.pack_const_words(b"("), rw.pack_const_words(b", "),
                    rw.pack_const_words(b")")]
    flat_extra = [int(w) for cw in extra_consts for w in cw]
    pool2 = np.concatenate(
        [pool_np, np.asarray(flat_extra, np.uint32).reshape(-1, 1)]
    )
    e_off = len(pool_np)
    paren_off, sep_off, close_off = e_off, e_off + 1, e_off + 2
    vk_min = ds.spec_min_total(vk_spec, [])
    Wvk = rw.words_for(vk_spec.out_max)
    Wtri = rw.words_for(tri_spec.out_max)
    pre_w_rows = rw.words_for(ds.PREHASH_W + 2)

    def kernel(vkb_ref, vkl_ref, pre_ref, plen_ref, ch_ref, pool_ref,
               trib_ref, trit_ref):
        B = vkb_ref.shape[-1]
        vk_chunk = rw.WChunk(
            buf=vkb_ref[:], length=vkl_ref[0, :], max_len=vk_spec.out_max,
            min_len=vk_min,
        )
        pre = rw.WChunk(
            buf=pre_ref[:], length=plen_ref[0, :], max_len=ds.PREHASH_W, min_len=1
        )
        ch_chunk = _fold_chunks_w(
            _eval_nodes(chb_nodes, pool_ref, offsets, ch_ref[:], (), (), B)
        )
        tri = _fold_chunks_w(
            [
                _const_chunk_from_pool(pool_ref, paren_off, 1, 1, B),
                vk_chunk,
                _const_chunk_from_pool(pool_ref, sep_off, 1, 2, B),
                pre,
                _const_chunk_from_pool(pool_ref, sep_off, 1, 2, B),
                ch_chunk,
                _const_chunk_from_pool(pool_ref, close_off, 1, 1, B),
            ]
        )
        trib, trit = _finish(tri, Wtri)
        trib_ref[:] = trib
        trit_ref[:] = trit[None, :]

    def call(vk_buf, vk_len, pre_w, pre_len, c_hat_t):
        global _INTERPRET
        _INTERPRET = interpret
        B = vk_buf.shape[-1]
        grid = (B // tile,)
        col = lambda i: (0, i)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((Wtri, B), _U32),
                jax.ShapeDtypeStruct((1, B), _I32),
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((Wvk, tile), col, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM),
                pl.BlockSpec((pre_w_rows, tile), col, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM),
                pl.BlockSpec((d, tile), col, memory_space=pltpu.VMEM),
                pl.BlockSpec((len(pool2), 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((Wtri, tile), col, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(vk_buf, vk_len[None, :].astype(_I32) if vk_len.ndim == 1 else vk_len,
          pre_w, pre_len[None, :].astype(_I32), c_hat_t, jnp.asarray(pool2))

    return call


@lru_cache(maxsize=16)
def _agg_fold_call(params, n_signers: int, tile: int, interpret: bool):
    """N triple buffers u32[Wtri, G] + lengths i32[1, G] -> padded agg
    preimage (u32[Wagg, G], i32[1, G])."""
    from ..interop import device_serial as ds
    from ..hashing.xof import agg_block_len  # noqa: F401  (geometry parity)

    tri_spec = ds.triple_spec(params)
    agg_spec = ds.agg_preimage_spec(params, n_signers, tri_spec.out_max)
    nodes = ds._compile_spec(agg_spec)
    pool_np, offsets = _build_const_pool(nodes)
    tri_min = ds.spec_min_total(tri_spec, [1])
    bounds = tuple((tri_min, tri_spec.out_max) for _ in range(n_signers))
    Wtri = rw.words_for(tri_spec.out_max)
    pad_agg = -(-(agg_spec.out_max + 1) // 136) * 34

    def kernel(*refs):
        tb = refs[: n_signers]
        tl = refs[n_signers : 2 * n_signers]
        pool_ref = refs[2 * n_signers]
        ob_ref, ot_ref = refs[2 * n_signers + 1 :]
        B = tb[0].shape[-1]
        extras = [(tb[k][:], tl[k][0, :]) for k in range(n_signers)]
        out = _fold_chunks_w(
            _eval_nodes(nodes, pool_ref, offsets, None, extras, bounds, B)
        )
        ob, ot = _finish(out, pad_agg)
        ob_ref[:] = ob
        ot_ref[:] = ot[None, :]

    def call(tbs: Sequence, tls: Sequence):
        global _INTERPRET
        _INTERPRET = interpret
        G = tbs[0].shape[-1]
        grid = (G // tile,)
        col = lambda i: (0, i)
        in_specs = (
            [pl.BlockSpec((Wtri, tile), col, memory_space=pltpu.VMEM)] * n_signers
            + [pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM)] * n_signers
            + [pl.BlockSpec((len(pool_np), 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)]
        )
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((pad_agg, G), _U32),
                jax.ShapeDtypeStruct((1, G), _I32),
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((pad_agg, tile), col, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(*[jnp.asarray(t) for t in tbs],
          *[t[None, :].astype(_I32) if t.ndim == 1 else t for t in tls],
          jnp.asarray(pool_np))

    return call


# ---------------------------------------------------------------------------
# Public wrappers
# ---------------------------------------------------------------------------


def signer_fold_a(params, vk2d_t, pre_w, pre_len, *, tile: int = 128,
                  interpret: bool = False):
    """-> (ch_wbuf, ch_total, vk_buf, vk_len): the challenge preimage padded
    to whole SHAKE rate blocks, plus the folded str(vk) chunk for reuse by
    :func:`signer_fold_b`.  Bit-identical to
    device_serial.fold_challenge_preimage_w(vk_chunk_w(...))."""
    chb, cht, vkb, vkl = _signer_a_call(params, tile, interpret)(
        vk2d_t, jnp.asarray(pre_w, _U32), pre_len
    )
    return chb, cht[0], vkb, vkl[0]


def signer_fold_b(params, vk_buf, vk_len, pre_w, pre_len, c_hat_t, *,
                  tile: int = 128, interpret: bool = False):
    """-> (tri_wbuf, tri_total): str((vk, i, challenge)) — bit-identical to
    device_serial.fold_triple_w."""
    trib, trit = _signer_b_call(params, tile, interpret)(
        vk_buf, vk_len, jnp.asarray(pre_w, _U32), pre_len, c_hat_t
    )
    return trib, trit[0]


def agg_fold(params, n_signers: int, tbs, tls, *, tile: int = 128,
             interpret: bool = False):
    """-> (agg_wbuf, agg_total) padded to whole SHAKE rate blocks —
    bit-identical to device_serial.assemble_chunks_words(agg_spec, ...)."""
    ob, ot = _agg_fold_call(params, n_signers, tile, interpret)(tbs, tls)
    return ob, ot[0]
