"""Coefficient-sharded (sequence-parallel) negacyclic NTT over a mesh axis.

The reference transform is a single-threaded scalar loop (algebra/ntt.py:216-377);
the batched butterfly kernel in ops/ntt.py is the right tool whenever a whole
polynomial fits on one chip (d ∈ {64, 256} always does).  This module covers the
remaining axis of SURVEY.md §2's parallelism table — **sp**: the polynomial
coefficient dimension itself sharded across chips — for deployments that shard
coefficient blocks (e.g. fused pipelines that keep signature tensors sharded
over both rank and coefficients, or future large-d parameter sets).

Formulation: out[i] = f(psi^(2·bitrev(i)+1)) is a d×d matrix–vector product
over Z_q.  Sharding columns of the transform matrix (inputs) and rows of the
output over the mesh axis turns it into

    partial_s = V[:, block_s] @ x[block_s]         (local, Montgomery-lifted)
    out       = psum_scatter(partial_s)            (modular, over ICI)

i.e. one reduce-scatter per transform — the canonical TPU pattern for a
distributed linear operator.  The modular reduce-scatter splits residues into
16-bit limbs so int32 collectives stay exact (same trick as
parallel/sharded._psum_mod).  Results are **bit-identical** to ops/ntt.py,
including the bit-reversed NTT-domain ordering, so sharded and unsharded
tensors interoperate freely (asserted in tests/test_distributed_ntt.py).

Cost note: O(d²/S) multiplies per device versus O(d·log d) for the local
butterfly kernel — worth it only when the coefficient axis must stay sharded
(it avoids an all_gather + re-shard round trip); for large d a stage-split
butterfly exchange (all_to_all at the shard-crossing stages) is the scaling
path, and this matmul form is the correctness oracle for it.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.field import Field
from ..ops.ntt import NTTPlan
from ..ops.numtheory import bit_reverse_indices


@lru_cache(maxsize=None)
def _transform_matrices(plan: NTTPlan) -> Tuple[np.ndarray, np.ndarray]:
    """(V, W): forward/inverse transform matrices as uint32 residues.

    V[i, j] = psi^((2·bitrev(i)+1)·j);  W[j, i] = d^{-1}·psi^(-(2·bitrev(i)+1)·j).
    """
    q, d, psi = plan.modulus, plan.degree, plan.root
    idx = bit_reverse_indices(d)
    inv_psi = plan.inv_root
    d_inv = pow(d, q - 2, q)
    V = np.empty((d, d), dtype=np.uint32)
    W = np.empty((d, d), dtype=np.uint32)
    for i in range(d):
        e = 2 * idx[i] + 1
        base = pow(psi, e, q)
        inv_base = pow(inv_psi, e, q)
        row = 1
        for j in range(d):
            V[i, j] = row
            row = row * base % q
        col = d_inv
        for j in range(d):
            W[j, i] = col
            col = col * inv_base % q
    return V, W


def _psum_scatter_mod(F: Field, x_u32, axis_name: str, n_shards: int):
    """Modular reduce-scatter along the trailing axis: residues in [0, q) are
    split into 16-bit limbs, reduce-scattered as int32 (exact for <= 2**15
    shards), then folded back mod q."""
    lo = (x_u32 & jnp.uint32(0xFFFF)).astype(jnp.int32)
    hi = (x_u32 >> 16).astype(jnp.int32)
    lo_sum = jax.lax.psum_scatter(lo, axis_name, scatter_dimension=lo.ndim - 1, tiled=True)
    hi_sum = jax.lax.psum_scatter(hi, axis_name, scatter_dimension=hi.ndim - 1, tiled=True)
    lo_sum = lo_sum.astype(jnp.uint32)
    hi_sum = hi_sum.astype(jnp.uint32)
    pow16 = np.uint32((1 << 16) % F.q)
    pow16_sh = np.uint32(F.shoup(int(pow16)))
    folded = F.mul_mod_shoup(hi_sum, jnp.asarray(pow16), jnp.asarray(pow16_sh))
    lo_red = F.mul_mod_shoup(lo_sum >> 16, jnp.asarray(pow16), jnp.asarray(pow16_sh))
    lo_red = F.add_mod(lo_red, lo_sum & jnp.uint32(0xFFFF))
    return F.add_mod(folded, lo_red)


def make_distributed_ntt(plan: NTTPlan, mesh: Mesh, axis_name: str = "sp"):
    """Build jitted sharded transforms over ``mesh[axis_name]``.

    Returns ``(fwd, inv)`` where each maps ``int32[..., d]`` -> ``int32[..., d]``
    with the trailing (coefficient) axis sharded over ``axis_name``; all leading
    axes are replicated.  Outputs are bit-identical to ops/ntt.py's
    ``ntt_fwd`` / ``ntt_inv``.
    """
    F = plan.field
    d = plan.degree
    S = mesh.shape[axis_name]
    if d % S != 0:
        raise ValueError(f"degree {d} not divisible by {S} shards")
    V, W = _transform_matrices(plan)

    # Column-block of the transform matrix per shard, Montgomery-lifted once.
    v_mont = F.to_mont(jnp.asarray(V))  # [d, d]
    w_mont = F.to_mont(jnp.asarray(W))

    def _apply_local(m_block, x_block):
        """m_block uint32[d, d/S] (this shard's columns), x_block int32[..., d/S]."""
        x_u = F.to_unsigned(x_block)
        prods = F.mont_mul(m_block, x_u[..., None, :])  # [..., d, d/S]
        partial = F.sum_mod(prods, axis=-1)  # [..., d]
        out_u = _psum_scatter_mod(F, partial, axis_name, S)  # [..., d/S]
        return F.to_centered(out_u)

    # Callers use rank-2 tensors [batch, d]; reshape higher ranks as needed.
    apply_sm = jax.jit(
        jax.shard_map(
            _apply_local,
            mesh=mesh,
            in_specs=(P(None, axis_name), P(None, axis_name)),
            out_specs=P(None, axis_name),
            check_vma=False,
        )
    )

    def fwd(x):
        """int32[batch, d] (coefficient domain) -> int32[batch, d] NTT domain."""
        return apply_sm(v_mont, x)

    def inv(x):
        """int32[batch, d] NTT domain -> int32[batch, d] coefficient domain."""
        return apply_sm(w_mont, x)

    return fwd, inv
