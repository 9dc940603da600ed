"""Pallas TPU kernels: fused batched NTT / INTT.

The jnp stage-sweep in ops/ntt.py lowers to a chain of XLA ops with relayouts
between stages; these kernels keep a batch tile resident in VMEM and run all
log2(d) butterfly stages in one kernel launch.

Mosaic layout note: reshapes that change the *lane* (trailing) dimension are
unsupported, so the kernel runs TRANSPOSED — the polynomial axis lives on
sublanes and the batch on lanes.  A tile is ``int32[d, TB]`` (d ∈ {64, 256}
rows, TB=128/256 batch lanes); stage reshapes then only split leading
(sublane) dimensions: ``[d, TB] -> [m, 2, t, TB]``, which Mosaic lowers as
sublane addressing.  The public wrappers transpose at the boundary (XLA fuses
these into neighbouring ops).

Twiddle tables are the flat bit-reversed layout of the reference
(algebra/ntt.py:281: stage ``m`` reads ``[m:2m]``), passed as ``(d, 1)`` VMEM
inputs.  Outputs are bit-identical to ops/ntt.py.
"""
from __future__ import annotations

from functools import lru_cache

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
    """x: uint32[d, TB]; tw/tw_sh: uint32[d, 1]."""
    TB = x.shape[-1]
    m = 1
    while m < d:
        t = d // (2 * m)
        x = x.reshape(m, 2, t, TB)
        s = tw[m : 2 * m].reshape(m, 1, 1)
        sh = tw_sh[m : 2 * m].reshape(m, 1, 1)
        u = x[:, 0]
        v = F.mul_mod_shoup(x[:, 1], s, sh)
        x = jnp.stack([F.add_mod(u, v), F.sub_mod(u, v)], axis=1)
        m *= 2
    return x.reshape(d, TB)


def _inv_body(F: Field, d: int, x, tw, tw_sh, n_inv: int, n_inv_sh: int):
    TB = x.shape[-1]
    h = d // 2
    while h >= 1:
        t = d // (2 * h)
        x = x.reshape(h, 2, t, TB)
        s = tw[h : 2 * h].reshape(h, 1, 1)
        sh = tw_sh[h : 2 * h].reshape(h, 1, 1)
        u = x[:, 0]
        v = x[:, 1]
        x = jnp.stack([F.add_mod(u, v), F.mul_mod_shoup(F.sub_mod(u, v), s, sh)], axis=1)
        h //= 2
    x = x.reshape(d, TB)
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
    tw_c = jnp.asarray(tw_np.reshape(d, 1))
    twsh_c = jnp.asarray(twsh_np.reshape(d, 1))

    def call(xT):
        """xT: int32[d, n] (transposed batch)."""
        n = xT.shape[1]
        grid = (n // tile,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((d, n), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            interpret=interpret,
        )(xT, tw_c, twsh_c)

    return jax.jit(call)


@lru_cache(maxsize=None)
def _runner(plan: NTTPlan, inverse: bool, tile: int, interpret: bool):
    inner = _build(plan, inverse, tile, interpret)

    def run2d(x2):
        """int32[n, d] -> int32[n, d] with transposes fused by XLA."""
        return inner(x2.T).T

    return jax.jit(run2d)


def _run(plan: NTTPlan, x, inverse: bool, tile: int, interpret: bool):
    d = plan.degree
    shape = x.shape
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        x2 = jnp.concatenate([x2, jnp.zeros((n_pad - n, d), jnp.int32)], axis=0)
    out = _runner(plan, inverse, tile, interpret)(x2)
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
