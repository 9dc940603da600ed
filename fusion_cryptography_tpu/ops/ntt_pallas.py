"""Pallas TPU kernels: fused batched NTT / INTT.

The jnp stage-sweep in ops/ntt.py lowers to a chain of XLA ops with HBM
round-trips possible between stages; these kernels keep an entire batch tile
resident in VMEM and run all log2(d) butterfly stages in one kernel launch.

Layout: grid over batch tiles of ``TILE`` polynomials; each program loads an
``int32[TILE, d]`` block (d ∈ {64, 256} → 64–256 KB per buffer, well inside
VMEM), converts to unsigned residues, runs the unrolled stages with the same
reshape-butterfly structure as ops/ntt.py (so results are bit-identical), and
writes centered representatives back.  The flat bit-reversed twiddle tables
(stage ``m`` reads ``[m:2m]`` — the reference's table layout,
algebra/ntt.py:281) ride along as small VMEM inputs.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .field import Field
from .ntt import NTTPlan

_U32 = jnp.uint32
_I32 = jnp.int32


def _fwd_body(F: Field, d: int, x, tw, tw_sh):
    lead = x.shape[:-1]
    m = 1
    while m < d:
        t = d // (2 * m)
        x = x.reshape(lead + (m, 2, t))
        s = tw[m : 2 * m].reshape(m, 1)
        sh = tw_sh[m : 2 * m].reshape(m, 1)
        u = x[..., 0, :]
        v = F.mul_mod_shoup(x[..., 1, :], s, sh)
        x = jnp.stack([F.add_mod(u, v), F.sub_mod(u, v)], axis=-2)
        m *= 2
    return x.reshape(lead + (d,))


def _inv_body(F: Field, d: int, x, tw, tw_sh, n_inv: int, n_inv_sh: int):
    lead = x.shape[:-1]
    h = d // 2
    while h >= 1:
        t = d // (2 * h)
        x = x.reshape(lead + (h, 2, t))
        s = tw[h : 2 * h].reshape(h, 1)
        sh = tw_sh[h : 2 * h].reshape(h, 1)
        u = x[..., 0, :]
        v = x[..., 1, :]
        x = jnp.stack([F.add_mod(u, v), F.mul_mod_shoup(F.sub_mod(u, v), s, sh)], axis=-2)
        h //= 2
    x = x.reshape(lead + (d,))
    return F.mul_mod_shoup(x, np.uint32(n_inv), np.uint32(n_inv_sh))


@lru_cache(maxsize=None)
def _build(plan: NTTPlan, inverse: bool, tile: int, interpret: bool):
    F = plan.field
    d = plan.degree

    def kernel(x_ref, tw_ref, twsh_ref, o_ref):
        x = F.to_unsigned(x_ref[:])
        tw = tw_ref[:]
        tw_sh = twsh_ref[:]
        if inverse:
            y = _inv_body(F, d, x, tw, tw_sh, plan.n_inv, plan.n_inv_shoup)
        else:
            y = _fwd_body(F, d, x, tw, tw_sh)
        o_ref[:] = F.to_centered(y)

    tw_np = plan.brp_inv if inverse else plan.brp
    twsh_np = plan.brp_inv_shoup if inverse else plan.brp_shoup
    tw_c = jnp.asarray(tw_np)
    twsh_c = jnp.asarray(twsh_np)

    def call(x2d):
        n = x2d.shape[0]
        grid = (n // tile,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, d), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x2d, tw_c, twsh_c)

    return jax.jit(call)


def _run(plan: NTTPlan, x, inverse: bool, tile: int, interpret: bool):
    """Apply the kernel to int32[..., d], padding the flattened batch to a tile
    multiple."""
    d = plan.degree
    shape = x.shape
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        x2 = jnp.concatenate([x2, jnp.zeros((n_pad - n, d), jnp.int32)], axis=0)
    out = _build(plan, inverse, tile, interpret)(x2)
    if n_pad != n:
        out = out[:n]
    return out.reshape(shape)


def ntt_fwd_pallas(plan: NTTPlan, x, tile: int = 256, interpret: bool = False):
    """Fused forward NTT: centered int32[..., d] -> centered int32[..., d]
    (bit-reversed order), bit-identical to ops/ntt.ntt_fwd."""
    return _run(plan, x, inverse=False, tile=tile, interpret=interpret)


def ntt_inv_pallas(plan: NTTPlan, x, tile: int = 256, interpret: bool = False):
    """Fused inverse NTT, bit-identical to ops/ntt.ntt_inv."""
    return _run(plan, x, inverse=True, tile=tile, interpret=interpret)
