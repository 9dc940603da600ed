"""Pallas MXU dense NTT/INTT: exact bf16 limb matmuls, VMEM-resident.

The stage-sweep transforms (ops/ntt.py) fall off a per-batch cliff on TPU:
1.6 us/group at [512, 83, 256] but 4.6 us/group at [2048, 83, 256]
(benchmarks/intt_cliff_lab.py) — each radix-4 pass's in+out working set stops
fitting on-chip and every pass becomes an HBM round trip.  The XLA dense-MXU
formulation (ops/ntt.ntt_inv_u_mxu) fixed the pass count but lost to operand
materialization: the [M, 4d] bf16 limb tensor and [M, 4d] f32 product hit HBM.

This kernel keeps the whole dense transform VMEM-resident per batch tile:

  u32 tile [T, d] -> four 8-bit limb planes (bf16) -> four MXU dots against
  the prefolded transform matrix -> u32 modular fold -> u32 tile [T, d]

HBM traffic is exactly read-x + write-out (8 bytes/coefficient), and the MXU
does the O(d^2) work: at d=256 a [T, d] @ [d, 4d] dot per limb = 2*4*d^2 FLOP
per coefficient ~= 0.5 ms per million coefficients at v5e bf16 peak — below
the stage-sweep's HBM-bound floor at any batch size, and LINEAR in batch.

Exactness: every bf16 operand is an integer < 2^8 (exact); each dot's
contraction length is d <= 256, so every f32 partial sum is an integer
< 256 * 255 * 255 < 2^24 — exactly representable.  The four per-input-limb
dots are folded in u32 modular arithmetic (not f32), unlike the single-dot
XLA layout whose 4d-long contraction can round above 2^24.  Outputs are
bit-identical to ops/ntt.ntt_fwd_u / ntt_inv_u (tests/test_ntt_mxu_pallas.py).

Transform semantics reproduced: /root/reference/algebra/ntt.py:216-291
(forward CT, bit-reversed output order) and :294-377 (GS inverse including
the n^-1 scale), as dense matrices over Z_q.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .field import widening_mul
from .ntt import NTTPlan
from .numtheory import bit_reverse_indices

_U32 = jnp.uint32


@lru_cache(maxsize=None)
def _tables(plan: NTTPlan, inverse: bool):
    """Prefolded limb planes wb bf16[4, d_in, 4*d_out] with
    wb[b, in, a*d + o] = ((M[o, in] * 2^(8b) mod q) >> 8a) & 0xFF, where
    out[o] = sum_in M[o, in] * x[in] mod q is the dense transform."""
    import ml_dtypes

    q, d = plan.modulus, plan.degree
    if d > 256:
        raise NotImplementedError("exact bf16 limb dots need d <= 256")
    idx = bit_reverse_indices(d)
    M = np.empty((d, d), dtype=np.uint64)  # [out, in]
    if inverse:
        d_inv = pow(d, q - 2, q)
        for i in range(d):  # in = NTT index i (bit-reversed order)
            base = pow(plan.inv_root, 2 * int(idx[i]) + 1, q)
            col = d_inv
            for j in range(d):  # out = coefficient j
                M[j, i] = col
                col = col * base % q
    else:
        for o in range(d):  # out = NTT index o (bit-reversed order)
            base = pow(plan.root, 2 * int(idx[o]) + 1, q)
            col = 1
            for j in range(d):  # in = coefficient j
                M[o, j] = col
                col = col * base % q
    wb = np.empty((4, d, 4 * d), dtype=np.float32)
    for b in range(4):
        Mb = (M * pow(2, 8 * b, q)) % q
        for a in range(4):
            wb[b, :, a * d : (a + 1) * d] = (((Mb >> (8 * a)) & 0xFF).astype(np.float32)).T
    F = plan.field
    fold = tuple(pow(2, 8 * a, q) for a in range(4))
    fold_sh = tuple(F.shoup(c) for c in fold)
    return wb.astype(ml_dtypes.bfloat16), fold, fold_sh


@lru_cache(maxsize=None)
def _build(plan: NTTPlan, inverse: bool, tile: int, interpret: bool):
    F = plan.field
    d = plan.degree
    wb_np, fold, fold_sh = _tables(plan, inverse)
    qu = np.uint32(plan.modulus)

    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[:]  # u32[T, d] residues in [0, q)
        # Mosaic has no u32->bf16 or f32->u32 casts; hop through i32
        # (limb values < 2^8 and dot outputs < 2^24 are exact throughout)
        tbs = []
        for b in range(4):
            xb = (
                ((x >> np.uint32(8 * b)) & np.uint32(0xFF))
                .astype(jnp.int32)
                .astype(jnp.bfloat16)
            )
            tbs.append(jax.lax.dot_general(
                xb, w_ref[b],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))  # [T, 4d] exact integer f32 (< 2^24 per element)
        acc = None
        for a in range(4):
            # sum the four input-limb contributions for output limb a in i32
            # FIRST (< 4 * 2^24 = 2^26, exact) -> ONE Shoup multiply per a
            # instead of one per (a, b): the u32-emulated fold, not the MXU,
            # is this kernel's critical path
            s = None
            for b in range(4):
                p = tbs[b][:, a * d : (a + 1) * d].astype(jnp.int32)
                s = p if s is None else s + p
            pu = s.astype(_U32)
            # Shoup multiply by the static fold constant 2^(8a) mod q
            hi, _ = widening_mul(pu, np.uint32(fold_sh[a]))
            r = pu * np.uint32(fold[a]) - hi * qu
            term = jnp.where(r >= qu, r - qu, r)
            acc = term if acc is None else F.add_mod(acc, term)
        o_ref[:] = acc

    def call(x2):
        """u32[M, d] (M % tile == 0) -> u32[M, d]."""
        n = x2.shape[0]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, d), _U32),
            grid=(n // tile,),
            in_specs=[
                pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, d, 4 * d), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * 4 * d * 4 * d * tile * (n // tile),
                bytes_accessed=2 * 4 * n * d,
                transcendentals=0,
            ),
        )(x2, jnp.asarray(wb_np))

    return call


def _run_u(plan: NTTPlan, x, inverse: bool, tile: int, interpret: bool):
    d = plan.degree
    shape = x.shape
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        x2 = jnp.concatenate([x2, jnp.zeros((n_pad - n, d), _U32)], axis=0)
    out = _build(plan, inverse, tile, interpret)(x2)
    if n_pad != n:
        out = out[:n]
    return out.reshape(shape)


def ntt_inv_u_mxu_pallas(plan: NTTPlan, x, tile: int = 256,
                         interpret: bool = False):
    """MXU dense inverse NTT on unsigned residues — bit-identical to
    ops/ntt.ntt_inv_u at any batch size, linear scaling (no VMEM cliff)."""
    return _run_u(plan, x, inverse=True, tile=tile, interpret=interpret)


@lru_cache(maxsize=None)
def _build_norm_weight(plan: NTTPlan, tile: int, interpret: bool):
    """INTT + per-row norm/weight reduction in ONE kernel: the verify path
    only needs max|centered coefficient| and the nonzero count per polynomial
    (fusion.py:722-727), so the [M, d] coefficient tensor — plus its centered
    copy and the two reduction passes over it (~3.5 GB of HBM traffic per
    G=8192 verify) — stays in VMEM and only [M, 1] row statistics come out."""
    F = plan.field
    d = plan.degree
    wb_np, fold, fold_sh = _tables(plan, inverse=True)
    qu = np.uint32(plan.modulus)

    def kernel(x_ref, w_ref, nrm_ref, wgt_ref):
        x = x_ref[:]
        tbs = []
        for b in range(4):
            xb = (
                ((x >> np.uint32(8 * b)) & np.uint32(0xFF))
                .astype(jnp.int32)
                .astype(jnp.bfloat16)
            )
            tbs.append(jax.lax.dot_general(
                xb, w_ref[b],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        acc = None
        for a in range(4):
            s = None
            for b in range(4):
                p = tbs[b][:, a * d : (a + 1) * d].astype(jnp.int32)
                s = p if s is None else s + p
            pu = s.astype(_U32)
            hi, _ = widening_mul(pu, np.uint32(fold_sh[a]))
            r = pu * np.uint32(fold[a]) - hi * qu
            term = jnp.where(r >= qu, r - qu, r)
            acc = term if acc is None else F.add_mod(acc, term)
        # |centered(u)| = min(u, q - u) for residues in [0, q) (u=0 -> 0);
        # all in i32 (residues < q < 2^31): Mosaic legalizes neither
        # unsigned min nor unsigned reductions
        ai = acc.astype(jnp.int32)
        cent_abs = jnp.minimum(ai, np.int32(plan.modulus) - ai)
        nrm_ref[:] = jnp.max(cent_abs, axis=1, keepdims=True)
        wgt_ref[:] = jnp.sum((acc != 0).astype(jnp.int32), axis=1,
                             keepdims=True)

    def call(x2):
        n = x2.shape[0]
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((n, 1), jnp.int32),
                jax.ShapeDtypeStruct((n, 1), jnp.int32),
            ),
            grid=(n // tile,),
            in_specs=[
                pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, d, 4 * d), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(x2, jnp.asarray(wb_np))

    return call


def intt_norm_weight_mxu_pallas(plan: NTTPlan, x, tile: int = 256,
                                interpret: bool = False):
    """u32[..., d] NTT-domain residues -> (max |centered coef| int32[...],
    nonzero-coef count int32[...]) per polynomial — bit-identical to
    reducing ops/ntt.ntt_inv_u's centered output (reference norm/weight
    semantics, fusion.py:722-727) without materializing the coefficients."""
    d = plan.degree
    lead = x.shape[:-1]
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        x2 = jnp.concatenate([x2, jnp.zeros((n_pad - n, d), _U32)], axis=0)
    nrm, wgt = _build_norm_weight(plan, tile, interpret)(x2)
    return nrm[:n, 0].reshape(lead), wgt[:n, 0].reshape(lead)


def ntt_fwd_u_mxu_pallas(plan: NTTPlan, x, tile: int = 256,
                         interpret: bool = False):
    """MXU dense forward NTT on unsigned residues — bit-identical to
    ops/ntt.ntt_fwd_u (bit-reversed output order)."""
    return _run_u(plan, x, inverse=False, tile=tile, interpret=interpret)
