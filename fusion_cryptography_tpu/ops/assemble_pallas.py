"""Pallas TPU kernel: fused preimage assembly (ragged barrel-shift concat).

The XLA lane-major assembler (interop/device_serial.assemble_chunks_lm) runs
the recursive-doubling merge tree as ~70 full-array barrel passes, each a
round trip through HBM.  This kernel runs the whole tree for a [*, 128] batch
tile inside VMEM: HBM traffic collapses to one read of the number values and
one write of the assembled preimage.

The kernel body *is* the lane-major Chunk algebra from ops/ragged.py — the
same jnp code traced under pallas_call — so byte-exactness is inherited from
the assembler the tests pin down.  Mosaic constraints shape the details:

* no i8 vector arithmetic and no i16 comparisons -> bytes are carried as
  int16 (halves VMEM vs int32); every comparison operand is int32/uint32
  (ops/ragged.render_decimal_lm's ``byte_dtype``);
* captured array constants are rejected -> const-node bytes ship as one
  int16[P, 1] input, broadcast lane-wise in the kernel; short separators are
  scalar fills;
* strided slices lower to >2D gathers -> pair splitting reshapes instead
  (ops/ragged.merge_cells_lm).

Output modes:
  "bytes"   uint8[out_w, B]    (default; feeds the XLA sponge/tests)
  "bytes16" int16[out_w, B]    (feeds another assembly kernel, e.g. the
                                triple buffers consumed by the agg preimage)
  "words"   uint32[out_w/4, B] (little-endian packed; feeds the Pallas sponge
                                without a byte-repacking pass)
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
# Byte carrier inside kernels: int32.  int16 halves VMEM but Mosaic lowers
# packed-i16 vectors to multi-op sequences that blew the remote compiler's
# memory cap (SIGKILL); int32 keeps the lowering 1:1.  VMEM is raised via
# CompilerParams (v5e has 128 MiB physical; the 16 MiB scoped default is
# far below it).
_BYTE = jnp.int32
_VMEM_LIMIT = 100 * 1024 * 1024


def _build(spec, extra_bounds, pad_to: int, output: str, interpret: bool):
    """Kernel for one PreimageSpec (+ static extra bounds, output mode)."""
    from ..interop.device_serial import _compile_spec, _number_cells_lm
    from .ragged import Chunk, fold_chunks_lm, merge_cells_lm, render_decimal_lm

    nodes = _compile_spec(spec)
    n_extras = spec.num_extras
    has_values = spec.num_numbers > 0
    out_w = max(pad_to, spec.out_max)
    if output == "words":
        out_w = -(-out_w // 4) * 4

    # Pallas kernels cannot capture array constants: all const-node bytes
    # ship as one int16[P, 1] input, broadcast lane-wise in the kernel.
    const_offs = {}
    pool = bytearray()
    for k, node in enumerate(nodes):
        if node[0] == "const":
            const_offs[k] = len(pool)
            pool.extend(node[1])
    const_pool = (
        np.frombuffer(bytes(pool), dtype=np.uint8).astype(np.int32).reshape(-1, 1)
        if pool
        else None
    )
    P = 0 if const_pool is None else const_pool.shape[0]

    def kernel(*refs):
        idx = 0
        if const_pool is not None:
            pool_ref = refs[idx]
            idx += 1
        if has_values:
            values = refs[idx][:]
            idx += 1
        extras = []
        for e in range(n_extras):
            eb = refs[idx][:]
            el = refs[idx + 1][:][0]  # [1, 128] -> [128]
            extras.append((eb, el))
            idx += 2
        buf_ref, tot_ref = refs[idx], refs[idx + 1]

        if has_values:
            field, n_start, n_len = render_decimal_lm(values, byte_dtype=_BYTE)
        out = []
        for k, node in enumerate(nodes):
            if node[0] == "const":
                L = len(node[1])
                off = const_offs[k]
                out.append(
                    Chunk(
                        buf=jnp.broadcast_to(pool_ref[off : off + L], (L, TILE)),
                        length=jnp.full((TILE,), L, jnp.int32),
                        max_len=L,
                        min_len=L,
                    )
                )
            elif node[0] == "cells":
                _, sep, i0, count = node
                cells = _number_cells_lm(
                    sep, field[i0 : i0 + count], n_start[i0 : i0 + count],
                    n_len[i0 : i0 + count], count, byte_dtype=_BYTE,
                )
                out.append(
                    merge_cells_lm(cells)
                    if count > 1
                    else Chunk(cells.buf[0], cells.length[0], cells.max_len, cells.min_len)
                )
            else:
                e = node[1]
                eb, el = extras[e]
                lo, hi = extra_bounds[e]
                out.append(Chunk(buf=eb, length=el.astype(jnp.int32), max_len=hi, min_len=lo))
        final = fold_chunks_lm(out)
        pad = out_w - final.buf.shape[0]
        buf = jnp.pad(final.buf, ((0, pad), (0, 0))) if pad > 0 else final.buf[:out_w]
        if output == "bytes":
            buf_ref[:] = buf.astype(jnp.uint8)
        elif output == "bytes16":
            buf_ref[:] = buf.astype(jnp.int16)
        else:  # words: little-endian 4-byte packing
            p = buf.reshape(out_w // 4, 4, TILE).astype(jnp.uint32)
            buf_ref[:] = (
                p[:, 0]
                | (p[:, 1] << np.uint32(8))
                | (p[:, 2] << np.uint32(16))
                | (p[:, 3] << np.uint32(24))
            )
        tot_ref[:] = final.length.reshape(1, TILE)

    out_shape = {
        "bytes": lambda B: jax.ShapeDtypeStruct((out_w, B), jnp.uint8),
        "bytes16": lambda B: jax.ShapeDtypeStruct((out_w, B), jnp.int16),  # stored i16, arith i32
        "words": lambda B: jax.ShapeDtypeStruct((out_w // 4, B), jnp.uint32),
    }[output]
    out_rows = out_w // 4 if output == "words" else out_w

    def call(values, extras):
        """values i32[K, B] or None; extras [(u8/i16[We, B], i32[B])] ->
        (buf, total i32[B])."""
        args = []
        in_specs = []
        B = values.shape[1] if has_values else extras[0][0].shape[1]
        if B % TILE:
            raise ValueError(f"batch {B} must be a multiple of {TILE}")
        if const_pool is not None:
            args.append(jnp.asarray(const_pool))
            in_specs.append(pl.BlockSpec((P, 1), lambda i: (0, 0), memory_space=pltpu.VMEM))
        if has_values:
            K = values.shape[0]
            args.append(values)
            in_specs.append(pl.BlockSpec((K, TILE), lambda i: (0, i), memory_space=pltpu.VMEM))
        for eb, el in extras:
            We = eb.shape[0]
            if eb.dtype != jnp.int32:
                eb = eb.astype(jnp.int32)  # Mosaic has no i8 arithmetic
            args.append(eb)
            in_specs.append(pl.BlockSpec((We, TILE), lambda i: (0, i), memory_space=pltpu.VMEM))
            args.append(el.reshape(1, B).astype(jnp.int32))
            in_specs.append(pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM))
        grid = (B // TILE,)
        buf, tot = pl.pallas_call(
            kernel,
            out_shape=(out_shape(B), jax.ShapeDtypeStruct((1, B), jnp.int32)),
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((out_rows, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
        )(*args)
        return buf, tot.reshape(B)

    return call


_CACHE: dict = {}


def assemble_pallas(
    spec,
    values=None,
    extras: Sequence[Tuple[jnp.ndarray, jnp.ndarray]] = (),
    extra_bounds: Optional[Sequence[Tuple[int, int]]] = None,
    pad_to: int = 0,
    output: str = "bytes",
    interpret: bool = False,
):
    """Pallas twin of assemble_chunks_lm (lane-major, zero-scratch output).

    ``pad_to`` zero-pads the output byte axis (e.g. to a keccak rate multiple)
    inside the kernel, saving a separate XLA pad of the big buffer.
    B must be a multiple of 128.  See the module docstring for ``output``.
    """
    if extra_bounds is None:
        extra_bounds = tuple((0, spec.extra_widths[e]) for e in range(spec.num_extras))
    key = (id(spec), tuple(extra_bounds), pad_to, output, interpret)
    hit = _CACHE.get(key)
    if hit is None or hit[0] is not spec:
        _CACHE[key] = (spec, _build(spec, tuple(extra_bounds), pad_to, output, interpret))
        hit = _CACHE[key]
    return hit[1](values, list(extras))
