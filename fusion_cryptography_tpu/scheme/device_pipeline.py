"""Whole-verify-on-device pipeline: hashing, decoding, and lattice math in one jit.

The host path (scheme/lifecycle.py) keeps SHAKE on the CPU, which caps
end-to-end throughput at the host's Keccak rate (PERFORMANCE.md).  This module
moves the *entire* grouped-verify dataflow onto the chip:

  vks int32[G, N, 2, d], prehash digits, aggs int32[G, rank, d]
    -> challenge preimages  (interop/device_serial templates + render_decimal)
    -> SHAKE256 XOFs        (ops/keccak masked-absorb + squeeze)
    -> challenge coeffs     (ops/xof_decode signums/Fisher-Yates)
    -> challenge NTT        (ops/ntt)
    -> triple + aggregation preimages (nested ragged assembly)
    -> aggregation XOF + alpha decode
    -> target/observed sums, norm/weight bounds  (ops/field)

One ``jax.jit`` per (params, N, G-shape): a verify batch is a single device
launch with no host hashing, no serialization, and no per-signer transfers —
the only inputs are the key/signature tensors plus 78-byte prehash digit
fields (SHA3 of the messages stays on host: it is O(bytes of message) and
produces the ``str(int)`` rendering the wire format needs,
fusion/fusion.py:405-409).

Bit-exactness: every stage is the device twin of a host stage that is itself
KAT-verified; tests/test_device_pipeline.py asserts equality of challenge and
alpha coefficients and of verify verdicts against the host path.

The signer-parallel front half (preimage -> XOF -> decode -> NTT) is wrapped
in ``lax.map`` over fixed-size signer chunks so HBM stays bounded at large
G*N; the group-parallel back half chunks likewise over groups.
"""
from __future__ import annotations

from functools import lru_cache
from math import ceil, log2
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..interop import device_serial as ds
from ..ops import xof_decode
from ..ops.keccak import RATE, shake256_absorb_lanes, shake256_squeeze_lanes
from ..ops.ntt import ntt_fwd_u, ntt_inv_u
from ..params import Params
from ..hashing.xof import agg_block_len, challenge_xof_len, hash_message_to_int

_I32 = jnp.int32


def _pad_rate(n: int) -> int:
    return -(-(n + 1) // RATE) * RATE  # +1: the 0x1F pad byte may start a block


def _shake(buf, lens, n_out: int):
    return shake256_squeeze_lanes(shake256_absorb_lanes(buf, lens), n_out)


def prehash_digits(params: Params, messages: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
    """Host half: SHA3-256 prehash of each message rendered as ``str(int)``
    bytes (uint8[B, 78], int32[B]) for the device preimage assemblers."""
    B = len(messages)
    buf = np.zeros((B, ds.PREHASH_W), dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for k, m in enumerate(messages):
        s = str(hash_message_to_int(params.sign_pre_hash_dst, m)).encode()
        buf[k, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[k] = len(s)
    return buf, lens


@lru_cache(maxsize=16)
def _geometries(params: Params):
    bound_ch = max(1, min(params.modulus // 2, params.beta_ch))
    bound_ag = max(1, min(params.modulus // 2, params.beta_ag))
    return dict(
        ch_spec=ds.challenge_preimage_spec(params),
        tri_spec=ds.triple_spec(params),
        n_xof_ch=challenge_xof_len(
            params.secpar, params.degree, params.modulus, params.beta_ch, params.omega_ch
        ),
        block_ag=agg_block_len(
            params.secpar, params.degree, params.modulus, params.beta_ag, params.omega_ag
        ),
        geom_ch=xof_decode.geometry(
            params.secpar, params.modulus, params.degree, bound_ch, params.omega_ch
        ),
        geom_ag=xof_decode.geometry(
            params.secpar, params.modulus, params.degree, bound_ag, params.omega_ag
        ),
    )


@lru_cache(maxsize=32)
def _pipeline(params: Params, n_signers: int, signer_chunk: int, group_chunk: int):
    """Build the jitted grouped-verify function for one (params, N) shape."""
    plan = params.plan
    F = plan.field
    g = _geometries(params)
    d = params.degree
    N = n_signers
    ch_spec, tri_spec = g["ch_spec"], g["tri_spec"]
    agg_spec = ds.agg_preimage_spec(params, N, tri_spec.out_max)
    a_mont = F.to_mont(F.to_unsigned(jnp.asarray(params.public_challenge)))

    def signer_stage(xs):
        """[chunk, ...] per-signer work: preimage -> XOF -> decode -> NTT -> triple."""
        vk2d, pre_buf, pre_len = xs  # [c, 2d] i32, [c, 78] u8, [c] i32
        buf, total = ds.assemble(ch_spec, values=vk2d, extras=[(pre_buf, pre_len)])
        buf = jnp.pad(buf, ((0, 0), (0, _pad_rate(ch_spec.out_max) - buf.shape[1])))
        xof = _shake(buf, total, g["n_xof_ch"])
        cc = xof_decode.decode_coeffs(xof, g["geom_ch"])  # [c, d] int32
        c_hat_u = ntt_fwd_u(plan, F.to_unsigned(cc))
        c_hat = F.to_centered(c_hat_u)
        tvals = jnp.concatenate([vk2d, c_hat], axis=1)  # [c, 3d]
        tbuf, tlen = ds.assemble(tri_spec, values=tvals, extras=[(pre_buf, pre_len)])
        return cc, c_hat_u, tbuf, tlen

    def group_stage(xs):
        """[gc, ...] per-group work: aggregation preimage -> XOF -> alpha decode."""
        tbuf, tlen = xs  # [gc, N, Lt] u8, [gc, N] i32
        extras = [(tbuf[:, k], tlen[:, k]) for k in range(N)]
        gbuf, gtotal = ds.assemble(agg_spec, extras=extras)
        gbuf = jnp.pad(gbuf, ((0, 0), (0, _pad_rate(agg_spec.out_max) - gbuf.shape[1])))
        blob = _shake(gbuf, gtotal, N * g["block_ag"])  # [gc, N*block]
        gc = tbuf.shape[0]
        per = blob.reshape(gc, N, g["block_ag"]).reshape(gc * N, g["block_ag"])
        al = xof_decode.decode_coeffs(per, g["geom_ag"])
        return al.reshape(gc, N, d)

    def _chunked(fn, args, total: int, chunk: int):
        """lax.map ``fn`` over leading-axis chunks (exact divisor or single shot)."""
        if total <= chunk or total % chunk:
            return fn(args)
        n = total // chunk
        reshaped = tuple(a.reshape(n, chunk, *a.shape[1:]) for a in args)
        outs = jax.lax.map(fn, reshaped)
        return tuple(o.reshape(total, *o.shape[2:]) for o in outs)

    def grouped_verify(vks, pre_buf, pre_len, aggs):
        """vks i32[G, N, 2, d]; prehash digits u8[G, N, 78] + i32[G, N];
        aggs i32[G, rank, d] -> (eq, norm_ok, weight_ok) bool[G] + coeff tensors."""
        G = vks.shape[0]
        B = G * N
        vk2d = vks.reshape(B, 2 * d)
        cc, c_hat_u, tbuf, tlen = _chunked(
            signer_stage,
            (vk2d, pre_buf.reshape(B, -1), pre_len.reshape(B)),
            B,
            signer_chunk,
        )
        al = group_stage((tbuf.reshape(G, N, -1), tlen.reshape(G, N))) if (
            G <= group_chunk or G % group_chunk
        ) else jax.lax.map(
            group_stage,
            (
                tbuf.reshape(G // group_chunk, group_chunk, N, -1),
                tlen.reshape(G // group_chunk, group_chunk, N),
            ),
        ).reshape(G, N, d)

        # lattice verification (reference fusion.py:680-728 semantics)
        vk_u = F.to_unsigned(vks)  # [G, N, 2, d]
        c_u = c_hat_u.reshape(G, N, d)
        alpha_u = ntt_fwd_u(plan, F.to_unsigned(al))  # [G, N, d]
        t = F.add_mod(F.mont_mul(F.to_mont(c_u), vk_u[..., 0, :]), vk_u[..., 1, :])
        target = F.sum_mod(F.mont_mul(F.to_mont(alpha_u), t), axis=-2)  # [G, d]
        agg_u = F.to_unsigned(aggs)
        observed = F.dot_mod(a_mont, agg_u, axis=-2)  # [G, d]
        eq = jnp.all(target == observed, axis=-1)
        coef = F.to_centered(ntt_inv_u(plan, agg_u))  # [G, rank, d]
        norm = jnp.max(jnp.abs(coef), axis=(-2, -1))
        norm_ok = norm <= np.int32(min(params.beta_vf, 2**31 - 1))
        weight = jnp.max(jnp.sum((coef % np.int32(params.modulus)) != 0, axis=-1), axis=-1)
        weight_ok = weight <= np.int32(params.omega_vf)
        return eq, norm_ok, weight_ok, cc.reshape(G, N, d), al

    prod = jax.jit(lambda *a: grouped_verify(*a)[:3])
    debug = jax.jit(grouped_verify)
    return prod, debug


def verify_batch_device(
    params: Params,
    vks,
    messages: Sequence[str],
    aggs,
    *,
    signer_chunk: int = 8192,
    group_chunk: int = 4096,
):
    """Grouped verify with the full hash pipeline on device.

    vks int32[G, N, 2, d] (sorted within each group by vk repr — the
    reference's canonical order, fusion.py:661-663); messages flat G*N strings
    in the same order; aggs int32[G, rank, d].
    Returns (eq, norm_ok, weight_ok) bool[G] device arrays.
    """
    G, N = vks.shape[0], vks.shape[1]
    pre_buf, pre_len = prehash_digits(params, messages)
    fn, _ = _pipeline(params, N, signer_chunk, group_chunk)
    return fn(
        jnp.asarray(vks),
        jnp.asarray(pre_buf.reshape(G, N, -1)),
        jnp.asarray(pre_len.reshape(G, N)),
        jnp.asarray(aggs),
    )


def derive_coeffs_device(params: Params, vks, messages: Sequence[str], aggs, **kw):
    """Debug/test entry: returns (eq, norm_ok, weight_ok, challenge coeffs
    int32[G, N, d], alpha coeffs int32[G, N, d])."""
    G, N = vks.shape[0], vks.shape[1]
    pre_buf, pre_len = prehash_digits(params, messages)
    _, fn = _pipeline(
        params, N, kw.get("signer_chunk", 8192), kw.get("group_chunk", 4096)
    )
    return fn(
        jnp.asarray(vks),
        jnp.asarray(pre_buf.reshape(G, N, -1)),
        jnp.asarray(pre_len.reshape(G, N)),
        jnp.asarray(aggs),
    )
