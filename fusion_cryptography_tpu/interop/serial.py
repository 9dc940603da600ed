"""Reference-exact ``str()`` serialization of tensor-backed scheme objects.

The reference hashes object-graph ``repr`` strings straight into SHAKE256
(fusion/fusion.py:417, :586-589) and sorts signer tuples by ``str(vk)``
(fusion.py:661-663), and the KAT corpus freezes those exact strings — so the
serialization format *is* the wire format.  This module renders our dense
tensors into byte-identical strings.

Format notes (all pinned by /root/reference KAT files):
* polynomial reprs:   PolynomialNTTRepresentation(modulus=..., degree=...,
  root=..., inv_root=..., root_order=..., values=[v0, v1, ...])
  (algebra/polynomials.py:92-93, :257-258);
* matrix reprs embed the *reference's* class path, e.g.
  ``elem_class=<class 'algebra.polynomials.PolynomialNTTRepresentation'>``
  (algebra/matrices.py:40-41) — these name the reference modules by design:
  they are wire-format constants, not imports;
* byte strings render via Python's native ``bytes.__repr__`` (fusion.py:285).

Rendering large integer lists is hot (a secpar=128 signature repr is ~195
polynomials); we join pre-rendered per-value strings rather than calling
``str(list)`` on boxed numpy scalars (which would render as ``np.int32(...)``
under numpy>=2).
"""
from __future__ import annotations

from functools import lru_cache
from typing import Iterable, List, Optional, Sequence

import numpy as np

NTT_CLASS = "<class 'algebra.polynomials.PolynomialNTTRepresentation'>"
COEF_CLASS = "<class 'algebra.polynomials.PolynomialCoefficientRepresentation'>"


def _int_list(values) -> str:
    if isinstance(values, np.ndarray):
        values = values.tolist()
    return "[" + ", ".join(map(str, values)) + "]"


@lru_cache(maxsize=32)
def _ring_meta(modulus, degree, root, inv_root, root_order) -> bytes:
    return (
        f"modulus={modulus}, degree={degree}, root={root}, "
        f"inv_root={inv_root}, root_order={root_order}, "
    ).encode()


def _native_poly(class_name: bytes, field: bytes, meta: bytes, values) -> Optional[str]:
    """Render via the C formatter when values fit int32 (production tensors
    always do); returns None to fall back for arbitrary big-int lists."""
    from .. import native

    if not native.available():
        return None
    if isinstance(values, np.ndarray) and values.dtype == np.int32:
        v = values
    else:
        try:
            v64 = np.asarray(values, dtype=np.int64)
        except (OverflowError, TypeError, ValueError):
            return None
        if v64.size and (v64.max() > 2**31 - 1 or v64.min() < -(2**31)):
            return None
        v = v64.astype(np.int32)
    return native.format_poly(class_name, meta, field, v).decode("ascii")


def poly_ntt_str(modulus: int, degree: int, root: int, inv_root: int, root_order: int, values) -> str:
    meta = _ring_meta(modulus, degree, root, inv_root, root_order)
    fast = _native_poly(b"PolynomialNTTRepresentation", b"values", meta, values)
    if fast is not None:
        return fast
    return (
        f"PolynomialNTTRepresentation(modulus={modulus}, degree={degree}, root={root}, "
        f"inv_root={inv_root}, root_order={root_order}, values={_int_list(values)})"
    )


def poly_coef_str(modulus: int, degree: int, root: int, inv_root: int, root_order: int, coefficients) -> str:
    meta = _ring_meta(modulus, degree, root, inv_root, root_order)
    fast = _native_poly(b"PolynomialCoefficientRepresentation", b"coefficients", meta, coefficients)
    if fast is not None:
        return fast
    return (
        f"PolynomialCoefficientRepresentation(modulus={modulus}, degree={degree}, root={root}, "
        f"inv_root={inv_root}, root_order={root_order}, coefficients={_int_list(coefficients)})"
    )


def matrix_str(elem_class: str, rows: Iterable[Iterable[str]]) -> str:
    """GeneralMatrix repr around pre-rendered element reprs (matrices.py:40-41)."""
    body = "[" + ", ".join("[" + ", ".join(row) + "]" for row in rows) + "]"
    return f"GeneralMatrix(elem_class={elem_class}, matrix={body})"


def ntt_matrix_str(params, tensor: np.ndarray, rows: int, cols: int) -> str:
    """Render an int32[rows, cols, degree] NTT-domain tensor as a GeneralMatrix
    of PolynomialNTTRepresentation reprs."""
    t = np.asarray(tensor).reshape(rows, cols, params.degree)
    return matrix_str(
        NTT_CLASS,
        (
            (
                poly_ntt_str(
                    params.modulus, params.degree, params.root, params.inv_root,
                    params.root_order, t[i, j],
                )
                for j in range(cols)
            )
            for i in range(rows)
        ),
    )


def params_str(params) -> str:
    """Reference Params repr (fusion/fusion.py:284-285)."""
    pub = ntt_matrix_str(params, params.public_challenge[None, :, :], 1, params.rank)
    return (
        f"Params(secpar={params.secpar}, capacity={params.capacity}, modulus={params.modulus}, "
        f"degree={params.degree}, root_order={params.root_order}, root={params.root}, "
        f"inv_root={params.inv_root}, num_rows_pub_challenge={params.num_rows_pub_challenge}, "
        f"num_rows_sk={params.num_rows_sk}, num_rows_vk={params.num_rows_vk}, "
        f"num_cols_pub_challenge={params.num_cols_pub_challenge}, num_cols_sk={params.num_cols_sk}, "
        f"num_cols_vk={params.num_cols_vk}, beta_sk={params.beta_sk}, beta_ch={params.beta_ch}, "
        f"beta_ag={params.beta_ag}, beta_vf={params.beta_vf}, omega_sk={params.omega_sk}, "
        f"omega_ch={params.omega_ch}, omega_ag={params.omega_ag}, omega_vf={params.omega_vf}, "
        f"public_challenge={pub}, sign_pre_hash_dst={params.sign_pre_hash_dst!r}, "
        f"sign_hash_dst={params.sign_hash_dst!r}, agg_xof_dst={params.agg_xof_dst!r}, "
        f"bytes_for_one_coef_bdd_by_beta_ch={params.bytes_for_one_coef_bdd_by_beta_ch}, "
        f"bytes_for_one_coef_bdd_by_beta_ag={params.bytes_for_one_coef_bdd_by_beta_ag}, "
        f"bytes_for_poly_shuffle={params.bytes_for_poly_shuffle})"
    )


def vk_str(params, vk: np.ndarray) -> str:
    """OneTimeVerificationKey repr (fusion.py:328-329).  ``vk`` is int32[2, degree]
    (left, right), each being the single entry of a 1x1 NTT matrix."""
    left = ntt_matrix_str(params, vk[0][None, None, :], 1, 1)
    right = ntt_matrix_str(params, vk[1][None, None, :], 1, 1)
    return f"OneTimeVerificationKey(left_vk_hat={left}, right_vk_hat={right})"


def sk_str(params, seed: Optional[int], sk_hat: np.ndarray) -> str:
    """OneTimeSigningKey repr (fusion.py:313-314).  ``sk_hat`` is
    int32[2, rank, degree] NTT-domain (left, right), rank x 1 matrices."""
    left = ntt_matrix_str(params, sk_hat[0][:, None, :], params.rank, 1)
    right = ntt_matrix_str(params, sk_hat[1][:, None, :], params.rank, 1)
    return f"OneTimeSigningKey(seed={seed}, left_sk_hat={left}, right_sk_hat={right})"


def sig_str(params, sig: np.ndarray) -> str:
    """Signature repr (fusion.py:398-399).  ``sig`` is int32[rank, degree]."""
    return f"Signature(signature_hat={ntt_matrix_str(params, sig[:, None, :], params.rank, 1)})"


def challenge_str(params, c_hat: np.ndarray) -> str:
    """SignatureChallenge repr (fusion.py:382-383).  ``c_hat`` is int32[degree]."""
    p = poly_ntt_str(
        params.modulus, params.degree, params.root, params.inv_root, params.root_order, c_hat
    )
    return f"SignatureChallenge(c_hat={p})"


def agg_coef_str(params, alpha_hat: np.ndarray) -> str:
    """AggregationCoefficient repr (fusion.py:566-567)."""
    p = poly_ntt_str(
        params.modulus, params.degree, params.root, params.inv_root, params.root_order, alpha_hat
    )
    return f"AggregationCoefficient(alpha_hat={p})"


def keytuple_str(params, seed: Optional[int], sk_hat: np.ndarray, vk: np.ndarray) -> str:
    """str((sk, vk)) — the tuple repr the KAT generator feeds into the
    aggregation XOF when it passes key *tuples* instead of vks
    (KATs/generate_KAT_values.py:120-133)."""
    return f"({sk_str(params, seed, sk_hat)}, {vk_str(params, vk)})"


def zip_triples_str(vk_strs: Sequence[str], prehashed: Sequence[int], chall_strs: Sequence[str]) -> str:
    """str(list(zip(keys, prehashed_messages, challenges))) — the aggregation XOF
    preimage body (fusion.py:586-589)."""
    parts: List[str] = [
        f"({k}, {i}, {c})" for k, i, c in zip(vk_strs, prehashed, chall_strs)
    ]
    return "[" + ", ".join(parts) + "]"
