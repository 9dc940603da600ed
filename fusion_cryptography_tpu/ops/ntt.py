"""Batched negacyclic NTT / inverse NTT over Z_q as XLA-friendly tensor ops.

Reimplements the transform semantics of the reference's scalar loops
(/root/reference/algebra/ntt.py:216-291 Cooley–Tukey forward, :294-377
Gentleman–Sande inverse) as fully vectorized, statically-shaped stage sweeps:

* the polynomial axis is the trailing axis; a stage with ``m`` blocks of span
  ``2t`` is a reshape to ``(..., m, 2, t)`` followed by lane-wise butterflies —
  no scalar loops, no gathers, so XLA tiles it straight onto the VPU and fuses
  adjacent stages;
* twiddles are powers of the order-2d primitive root stored in bit-reversed
  order (identical table layout to the reference, so the forward output is in
  the same bit-reversed order and NTT-domain values serialize bit-identically:
  output[i] == f(psi**(2*bitrev(i)+1)) mod q, centered);
* twiddle tables and their Shoup companions are precomputed once per
  (modulus, degree, root) plan and closed over by the jitted function — the
  reference rebuilds them per call (algebra/polynomials.py:396-397), one of its
  dominant costs;
* all stage arithmetic runs on uint32 residues with Shoup constant-multiplies
  (see ops/field.py); inputs/outputs of the public wrappers are centered int32.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .field import Field, Q, get_field
from .numtheory import bit_reverse_indices, is_odd_prime, is_primitive_root


@dataclass(frozen=True, eq=False)  # identity hash: plans are interned by make_plan
class NTTPlan:
    """Precomputed twiddle schedule for one (modulus, degree, root) transform."""

    field: Field
    degree: int
    root: int
    inv_root: int
    root_order: int
    # Stages: tuples of (blocks, span, twiddle (blocks,1), twiddle_shoup (blocks,1)).
    fwd_stages: Tuple[Tuple[int, int, np.ndarray, np.ndarray], ...]
    inv_stages: Tuple[Tuple[int, int, np.ndarray, np.ndarray], ...]
    n_inv: int
    n_inv_shoup: int
    # Flat bit-reversed twiddle tables (stage m reads [m:2m]) — the layout the
    # reference uses (algebra/ntt.py:281), consumed by the Pallas kernels.
    brp: np.ndarray = None
    brp_shoup: np.ndarray = None
    brp_inv: np.ndarray = None
    brp_inv_shoup: np.ndarray = None

    @property
    def modulus(self) -> int:
        return self.field.q


@lru_cache(maxsize=None)
def make_plan(modulus: int = Q, degree: int = 256, root: Optional[int] = None) -> NTTPlan:
    """Build (and cache) the stage-sliced twiddle tables for one transform size.

    The table layout matches the reference exactly: ``brp`` is the bit-reversed
    list of the first ``degree`` powers of the order-``2*degree`` root, and the
    stage with ``m`` blocks consumes ``brp[m:2m]`` (algebra/ntt.py:276-290).
    """
    if root is None:
        from .numtheory import find_primitive_root

        root = find_primitive_root(modulus, 2 * degree)
    if not is_odd_prime(modulus):
        raise ValueError(f"modulus={modulus} must be an odd prime")
    root_order = 2 * degree
    if not is_primitive_root(root, modulus, root_order):
        raise ValueError(f"root={root} is not a primitive root of order {root_order}")
    field = get_field(modulus)
    inv_root = pow(root, modulus - 2, modulus)

    idx = bit_reverse_indices(degree)
    powers = [pow(root, i, modulus) for i in range(degree)]
    inv_powers = [pow(inv_root, i, modulus) for i in range(degree)]
    brp = [powers[i] for i in idx]
    brp_inv = [inv_powers[i] for i in idx]

    def stage_arrays(tbl: List[int], lo: int, hi: int):
        s = np.array(tbl[lo:hi], dtype=np.uint32).reshape(-1, 1)
        sh = np.array([field.shoup(x) for x in tbl[lo:hi]], dtype=np.uint32).reshape(-1, 1)
        return s, sh

    fwd = []
    m = 1
    while m < degree:
        fwd.append((m, degree // (2 * m)) + stage_arrays(brp, m, 2 * m))
        m *= 2

    inv = []
    h = degree // 2
    while h >= 1:
        inv.append((h, degree // (2 * h)) + stage_arrays(brp_inv, h, 2 * h))
        h //= 2

    n_inv = pow(degree, modulus - 2, modulus)
    return NTTPlan(
        field=field,
        degree=degree,
        root=root,
        inv_root=inv_root,
        root_order=root_order,
        fwd_stages=tuple(fwd),
        inv_stages=tuple(inv),
        n_inv=n_inv,
        n_inv_shoup=field.shoup(n_inv),
        brp=np.array(brp, dtype=np.uint32),
        brp_shoup=np.array([field.shoup(x) for x in brp], dtype=np.uint32),
        brp_inv=np.array(brp_inv, dtype=np.uint32),
        brp_inv_shoup=np.array([field.shoup(x) for x in brp_inv], dtype=np.uint32),
    )


def ntt_fwd_u(plan: NTTPlan, x):
    """Forward negacyclic NTT on unsigned residues, trailing axis = coefficients
    (standard order in, bit-reversed order out, like algebra/ntt.py:216)."""
    F = plan.field
    shape = x.shape
    lead = shape[:-1]
    for m, t, s, sh in plan.fwd_stages:
        x = x.reshape(lead + (m, 2, t))
        u = x[..., 0, :]
        v = F.mul_mod_shoup(x[..., 1, :], jnp.asarray(s), jnp.asarray(sh))
        x = jnp.stack([F.add_mod(u, v), F.sub_mod(u, v)], axis=-2)
    return x.reshape(shape)


def ntt_inv_u(plan: NTTPlan, x):
    """Inverse negacyclic NTT on unsigned residues (bit-reversed order in,
    standard order out, with the final n^-1 scale, like algebra/ntt.py:294)."""
    F = plan.field
    shape = x.shape
    lead = shape[:-1]
    for h, t, s, sh in plan.inv_stages:
        x = x.reshape(lead + (h, 2, t))
        u = x[..., 0, :]
        v = x[..., 1, :]
        x = jnp.stack(
            [F.add_mod(u, v), F.mul_mod_shoup(F.sub_mod(u, v), jnp.asarray(s), jnp.asarray(sh))],
            axis=-2,
        )
    x = x.reshape(shape)
    return F.mul_mod_shoup(
        x, jnp.asarray(np.uint32(plan.n_inv)), jnp.asarray(np.uint32(plan.n_inv_shoup))
    )


@lru_cache(maxsize=None)
def _jitted(plan: NTTPlan):
    """Per-plan jitted entry points (plans are interned, so this caches one
    compiled executable per transform size per input shape)."""
    import jax

    F = plan.field

    def fwd(x):
        return F.to_centered(ntt_fwd_u(plan, F.to_unsigned(x)))

    def inv(x):
        return F.to_centered(ntt_inv_u(plan, F.to_unsigned(x)))

    def polymul(f, g):
        fu = ntt_fwd_u(plan, F.to_unsigned(f))
        gu = ntt_fwd_u(plan, F.to_unsigned(g))
        prod = F.mont_mul(F.to_mont(fu), gu)
        return F.to_centered(ntt_inv_u(plan, prod))

    return jax.jit(fwd), jax.jit(inv), jax.jit(polymul)


def ntt_fwd(plan: NTTPlan, x):
    """Centered int32 coefficients -> centered int32 NTT values (bit-rev order)."""
    return _jitted(plan)[0](x)


def ntt_inv(plan: NTTPlan, x):
    """Centered int32 NTT values (bit-rev order) -> centered int32 coefficients."""
    return _jitted(plan)[1](x)


def negacyclic_poly_mult(plan: NTTPlan, f, g):
    """INTT(NTT(f) ⊙ NTT(g)) — one-shot negacyclic product of coefficient-domain
    polynomials on the trailing axis (the working part of algebra/ntt.py:380-484,
    without its side effect of INTT-ing the inputs in place)."""
    return _jitted(plan)[2](f, g)
