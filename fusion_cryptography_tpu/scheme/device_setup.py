"""On-device benchmark fleet construction: keygen -> sign -> aggregate.

Round 1 built benchmark fleets through the host object path (Python repr
rendering + per-chunk device round trips: ~236 s for 8192 keys over the
remote tunnel).  This module keeps everything on the chip:

  host:   C MT19937 sampling of the short secret coefficients
          (native/fusion_native.c — bit-exact stdlib `random` semantics),
          vk-repr rendering (C formatter) ONLY to compute the reference's
          sort-by-str(vk) aggregation order (fusion/fusion.py:661-663),
          SHA3-256 message prehash digits
  device: NTT keygen + vk = A·sk (fusion.py:338-373), the full challenge
          hash pipeline (device_pipeline.make_stages), sig = sk_l⊙c + sk_r
          (fusion.py:534-557), alpha derivation + aggregate sum
          (fusion.py:632-677)

Exactness notes:
* with integer seeds the reference's per-entry reseed makes all ``rank``
  entries of a key identical (SURVEY.md §2.13), so sk/sig tensors carry one
  polynomial per side and vk = (Σ_r A_r)·sk — mont_mul is linear mod q in its
  first argument, so this equals the rank-wise dot bit-for-bit;
* the aggregate inherits the same rank-degeneracy, so it is broadcast to the
  full int32[G, rank, d] layout the (rank-general) verifier consumes;
* tests/test_device_setup.py asserts vk/sig/aggregate equality against the
  host lifecycle path.
"""
from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..hashing.sampler import sample_short_poly_coeffs
from ..interop import serial
from ..ops.ntt import ntt_fwd_u
from ..params import Params
from .device_pipeline import make_stages, prehash_digits, use_pallas_default


def _sample_sk(params: Params, seeds: Sequence[int]) -> np.ndarray:
    """Short secret coefficients int32[B, 2, d]: left from seed, right from
    seed+1 (reference keygen, fusion.py:339-362)."""
    from .. import native

    B = len(seeds)
    d = params.degree
    if native.available():
        interleaved = [x for s in seeds for x in (s, s + 1)]
        return native.sample_short_batch(
            interleaved, d, params.beta_sk, params.omega_sk, params.modulus
        ).reshape(B, 2, d)
    out = np.empty((B, 2, d), dtype=np.int32)
    for b, s in enumerate(seeds):
        out[b, 0] = sample_short_poly_coeffs(params.modulus, d, params.beta_sk, params.omega_sk, s)
        out[b, 1] = sample_short_poly_coeffs(params.modulus, d, params.beta_sk, params.omega_sk, s + 1)
    return out


@lru_cache(maxsize=8)
def _keygen_fn(params: Params):
    plan = params.plan
    F = plan.field
    a_mont_sum = F.sum_mod(
        F.to_mont(F.to_unsigned(jnp.asarray(params.public_challenge))), axis=0
    )  # [d]: Σ_r A_r in Montgomery form — exact vs the rank-wise dot because
    # all rank entries of sk are identical (per-entry reseed quirk)

    @jax.jit
    def keygen(sk_coeffs):
        """int32/int8[B, 2, d] -> (sk_hat_u u32[B, 2, d], vk i32[B, 2, d])."""
        sk_u = ntt_fwd_u(plan, F.to_unsigned(sk_coeffs.astype(jnp.int32)))
        vk_u = F.mont_mul(a_mont_sum, sk_u)
        return sk_u, F.to_centered(vk_u)

    return keygen


@lru_cache(maxsize=16)
def _sign_agg_fn(params: Params, n_signers: int):
    plan = params.plan
    F = plan.field
    d = params.degree
    N = n_signers
    signer_stage, group_stage = make_stages(params, N, use_pallas_default())

    # Separate jits per stage: one module with every Pallas kernel inlined
    # overflows the remote compile helper (see device_pipeline._pipeline).
    # The input transposes are their own jit: fused into the signer program,
    # XLA's TPU layout propagation corrupts ~7% of lanes (see
    # device_pipeline._pipeline).
    j_lanes = jax.jit(lambda vk, pb: (vk.reshape(vk.shape[0], 2 * d).T, pb.T))

    @jax.jit
    def j_signer_core(vk2d_t, pre_t, pre_len):
        return signer_stage(vk2d_t, pre_t, pre_len)

    def j_signer(vk, pre_buf, pre_len):
        vk2d_t, pre_t = j_lanes(vk, pre_buf)
        return j_signer_core(vk2d_t, pre_t, pre_len)

    @jax.jit
    def _j_group_core(*parts):
        return group_stage.parts(list(parts[:N]), list(parts[N:]))

    j_gsplit = jax.jit(
        lambda tbuf, tlen: tuple(
            [tbuf[:, :, k] for k in range(N)] + [tlen[:, k] for k in range(N)]
        )
    )

    def j_group(tbuf, tlen):
        # producer-jit per-signer slices — see device_pipeline.group_stage_parts
        return _j_group_core(*j_gsplit(tbuf, tlen))

    @jax.jit
    def j_math(sk_hat_u, c_hat_u, al):
        """sig = sk_l⊙c + sk_r; agg = Σ α̂⊙sig (rank-degenerate layout)."""
        B = sk_hat_u.shape[0]
        G = B // N
        sig_u = F.add_mod(
            F.mont_mul(F.to_mont(c_hat_u), sk_hat_u[:, 0]), sk_hat_u[:, 1]
        )  # [B, d]
        alpha_u = ntt_fwd_u(plan, F.to_unsigned(al))
        agg_u = F.sum_mod(
            F.mont_mul(F.to_mont(alpha_u), sig_u.reshape(G, N, d)), axis=1
        )  # [G, d]
        aggs = jnp.broadcast_to(
            F.to_centered(agg_u)[:, None, :], (G, params.rank, d)
        )
        return F.to_centered(sig_u), aggs

    def sign_and_aggregate(sk_hat_u, vk, pre_buf, pre_len):
        """Sorted-order sign + aggregate, all on device.

        sk_hat_u u32[B, 2, d] (B = G*N, already in aggregation order),
        vk i32[B, 2, d], prehash digits u8[B, 78] + i32[B] ->
        (sigs i32[B, d], aggs i32[G, rank, d]).
        """
        B = sk_hat_u.shape[0]
        G = B // N
        _, c_hat_u, tbuf, tlen = j_signer(vk, pre_buf, pre_len)
        al = j_group(tbuf.reshape(-1, G, N), tlen.reshape(G, N))  # [G, N, d]
        return j_math(sk_hat_u, c_hat_u, al)

    return sign_and_aggregate


def build_fleet(
    params: Params,
    n_groups: int,
    n_signers: int,
    *,
    seed0: int = 1,
    messages: Sequence[str] = None,
    launch_chunk: int = 8192,
) -> Tuple[jnp.ndarray, List[str], jnp.ndarray]:
    """Build G aggregate-signature groups of N signers for benchmarking.

    Returns (vks int32[G, N, 2, d] sorted within groups by str(vk),
    messages flat G*N strings in that order, aggs int32[G, rank, d]) — all
    device-resident, valid under scheme.verify / device_pipeline semantics.
    """
    G, N = n_groups, n_signers
    B = G * N
    d = params.degree
    if messages is None:
        messages = [f"group{g}:msg{i}" for g in range(G) for i in range(N)]

    sk = _sample_sk(params, [seed0 + k for k in range(B)])
    sk_hat_u, vk = _keygen_fn(params)(jnp.asarray(sk))
    vk_np = np.asarray(vk)  # [B, 2, d] int32 — the one device->host pull

    # the reference sorts signer tuples by str(vk) inside each group
    reprs = [serial.vk_str(params, vk_np[i]) for i in range(B)]
    order = np.empty((G, N), dtype=np.int64)
    for g in range(G):
        idx = list(range(g * N, (g + 1) * N))
        idx.sort(key=lambda i: reprs[i])
        order[g] = idx
    flat = order.reshape(-1)
    s_msgs = [messages[i] for i in flat]
    pre_buf, pre_len = prehash_digits(params, s_msgs)

    oflat = jnp.asarray(flat)
    sk_s = jnp.take(sk_hat_u, oflat, axis=0)
    vk_s = jnp.take(vk, oflat, axis=0)

    fn = _sign_agg_fn(params, N)
    sig_parts, agg_parts = [], []
    step = max(N, (launch_chunk // N) * N)
    for lo in range(0, B, step):
        hi = min(B, lo + step)
        sigs, aggs = fn(
            sk_s[lo:hi], vk_s[lo:hi],
            jnp.asarray(pre_buf[lo:hi]), jnp.asarray(pre_len[lo:hi]),
        )
        sig_parts.append(sigs)
        agg_parts.append(aggs)
    aggs = jnp.concatenate(agg_parts) if len(agg_parts) > 1 else agg_parts[0]
    vks = vk_s.reshape(G, N, 2, d)
    return vks, s_msgs, aggs
