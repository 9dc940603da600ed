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


def _expand_stage_twiddles(tw_np: np.ndarray, d: int, inverse: bool) -> np.ndarray:
    """Per-stage twiddles pre-expanded to butterfly-slot order.

    Mosaic cannot broadcast a [m, 1, 1] vector into both sublanes and lanes
    ("Broadcast in both sublanes and lanes" is unimplemented), so instead of
    slicing ``tw[m:2m]`` in-kernel and broadcasting over (t, TB), each stage's
    twiddles are repeated ``t`` times on the host: stage s occupies rows
    [s*d/2, (s+1)*d/2) with ``tw[m + i]`` at row ``i*t + j`` — exactly the
    [m, t, 1] shape the butterfly needs, leaving only a lane broadcast.
    """
    half = d // 2
    stages = []
    m = 1 if not inverse else half
    while (m < d) if not inverse else (m >= 1):
        t = d // (2 * m)
        stages.append(np.repeat(tw_np[m : 2 * m], t))
        m = m * 2 if not inverse else m // 2
    out = np.concatenate(stages).reshape(len(stages) * half, 1)
    return out.astype(np.uint32)


def _fwd_body(F: Field, d: int, x, tw, tw_sh):
    """x: uint32[d, TB]; tw/tw_sh: uint32[log2(d)*d/2, 1] stage-expanded."""
    TB = x.shape[-1]
    half = d // 2
    m, s_idx = 1, 0
    while m < d:
        t = d // (2 * m)
        x = x.reshape(m, 2, t, TB)
        s = tw[s_idx * half : (s_idx + 1) * half].reshape(m, t, 1)
        sh = tw_sh[s_idx * half : (s_idx + 1) * half].reshape(m, t, 1)
        u = x[:, 0]
        v = F.mul_mod_shoup(x[:, 1], s, sh)
        x = jnp.stack([F.add_mod(u, v), F.sub_mod(u, v)], axis=1)
        m *= 2
        s_idx += 1
    return x.reshape(d, TB)


def _inv_body(F: Field, d: int, x, tw, tw_sh, n_inv: int, n_inv_sh: int):
    TB = x.shape[-1]
    half = d // 2
    h, s_idx = d // 2, 0
    while h >= 1:
        t = d // (2 * h)
        x = x.reshape(h, 2, t, TB)
        s = tw[s_idx * half : (s_idx + 1) * half].reshape(h, t, 1)
        sh = tw_sh[s_idx * half : (s_idx + 1) * half].reshape(h, t, 1)
        u = x[:, 0]
        v = x[:, 1]
        x = jnp.stack([F.add_mod(u, v), F.mul_mod_shoup(F.sub_mod(u, v), s, sh)], axis=1)
        h //= 2
        s_idx += 1
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
    # kept as NUMPY: a jnp constant created inside one jit trace and cached
    # here would leak into later traces (UnexpectedTracerError)
    tw_c = _expand_stage_twiddles(np.asarray(tw_np, np.uint32), d, inverse)
    twsh_c = _expand_stage_twiddles(np.asarray(twsh_np, np.uint32), d, inverse)
    rows = tw_c.shape[0]

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
                pl.BlockSpec((rows, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
