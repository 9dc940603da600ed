"""Object-level Fusion API: drop-in surface of the reference ``fusion.fusion``.

``fusion_setup / keygen / sign / aggregate / verify`` plus the hash pipeline
(`hash_message_to_int`, `hash_vk_and_int_to_bytes`, `hash_ch`, `hash_ag`,
`hash_vks_and_ints_and_challs_to_bytes`, `decode_bytes_to_polynomial_coefficients`,
`parse_challenge`, `decode_bytes_to_agg_coefs`) with the reference's exact wire
behavior (fusion/fusion.py:294-728), implemented on the tensor core.

Objects returned here (keys, signatures, challenges) carry both the dense
tensors used by the device kernels and reference-exact ``str`` forms, so the
two API levels interoperate: a batch lifecycle can hand keys to this layer and
vice versa.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..hashing import decode as _decode
from ..hashing import xof as _xof
from ..interop import serial
from ..params import Params, fusion_setup as _tensor_setup
from ..scheme import lifecycle as _lc

__all__ = [
    "Params",
    "fusion_setup",
    "OneTimeSigningKey",
    "OneTimeVerificationKey",
    "SignatureChallenge",
    "Signature",
    "AggregationCoefficient",
    "keygen",
    "sign",
    "aggregate",
    "verify",
    "hash_message_to_int",
    "hash_vk_and_int_to_bytes",
    "decode_bytes_to_polynomial_coefficients",
    "parse_challenge",
    "hash_ch",
    "hash_vks_and_ints_and_challs_to_bytes",
    "decode_bytes_to_agg_coefs",
    "hash_ag",
]


def fusion_setup(secpar: int, seed: Optional[int]) -> Params:
    """Parameter setup (reference fusion.py:294-295)."""
    return _tensor_setup(secpar, seed)


class OneTimeSigningKey:
    """Tensor-backed signing key with reference repr (fusion.py:298-317).

    sk_hat: int32[2, rank, degree] NTT-domain (left, right)."""

    def __init__(self, params: Params, seed: Optional[int], sk_hat: np.ndarray):
        self.params = params
        self.seed = seed
        self.sk_hat = np.asarray(sk_hat)

    def __str__(self):
        return serial.sk_str(self.params, self.seed, self.sk_hat)

    __repr__ = __str__


class OneTimeVerificationKey:
    """Tensor-backed verification key with reference repr (fusion.py:320-332).

    vk: int32[2, degree] NTT-domain (left, right), each a 1x1 matrix entry."""

    def __init__(self, params: Params, vk: np.ndarray):
        self.params = params
        self.vk = np.asarray(vk)

    def __str__(self):
        return serial.vk_str(self.params, self.vk)

    __repr__ = __str__


OneTimeKeyTuple = Tuple[OneTimeSigningKey, OneTimeVerificationKey]


class SignatureChallenge:
    """c_hat: int32[degree] NTT-domain challenge (fusion.py:376-389)."""

    def __init__(self, params: Params, c_hat: np.ndarray):
        self.params = params
        self.c_hat = np.asarray(c_hat)

    def __str__(self):
        return serial.challenge_str(self.params, self.c_hat)

    __repr__ = __str__

    def __eq__(self, other):
        return isinstance(other, SignatureChallenge) and np.array_equal(self.c_hat, other.c_hat)


class Signature:
    """sig: int32[rank, degree] NTT-domain signature (fusion.py:392-402)."""

    def __init__(self, params: Params, sig: np.ndarray):
        self.params = params
        self.signature_hat = np.asarray(sig)

    def __str__(self):
        return serial.sig_str(self.params, self.signature_hat)

    __repr__ = __str__


class AggregationCoefficient:
    """alpha_hat: int32[degree] NTT-domain aggregation coefficient
    (fusion.py:560-570)."""

    def __init__(self, params: Params, alpha_hat: np.ndarray):
        self.params = params
        self.alpha_hat = np.asarray(alpha_hat)

    def __str__(self):
        return serial.agg_coef_str(self.params, self.alpha_hat)

    __repr__ = __str__


def keygen(params: Params, seed: Optional[int]) -> OneTimeKeyTuple:
    """Single-key keygen (fusion.py:338-373) via the batched tensor kernel."""
    batch = _lc.keygen(params, [seed])
    sk_hat = np.asarray(batch.sk_hat)[0]
    vk = np.asarray(batch.vk)[0]
    return (
        OneTimeSigningKey(params, seed, sk_hat),
        OneTimeVerificationKey(params, vk),
    )


def hash_message_to_int(params: Params, message: str) -> int:
    """SHA3-256 message pre-hash (fusion.py:405-409)."""
    return _xof.hash_message_to_int(params.sign_pre_hash_dst, message)


def hash_vk_and_int_to_bytes(params: Params, key, i: int, n: int) -> bytes:
    """SHAKE256(dst + "," + str(key) + "," + str(i)).digest(n) (fusion.py:412-419).
    ``key`` may be any object whose str() is the wire form."""
    payload = params.sign_hash_dst + b"," + str(key).encode("utf-8") + b"," + str(i).encode()
    return _xof.shake_digest(payload, n)


def decode_bytes_to_polynomial_coefficients(
    b: bytes, log2_bias: int, modulus: int, degree: int, norm_bound: int, weight_bound: int
) -> List[int]:
    """Byte decoder (fusion.py:422-481); returns a plain int list like the
    reference."""
    return [
        int(x)
        for x in _decode.decode_bytes_to_coefficients(
            b, log2_bias, modulus, degree, norm_bound, weight_bound
        )
    ]


def parse_challenge(params: Params, b: bytes) -> SignatureChallenge:
    """Decode + NTT a challenge from XOF bytes (fusion.py:484-508).  Returns the
    challenge object; use ``.c_hat`` for the tensor."""
    if (
        len(b)
        < params.omega_ch * params.bytes_for_one_coef_bdd_by_beta_ch
        + params.bytes_for_poly_shuffle
    ):
        raise ValueError("hashed_vk_and_pre_hashed_message is too short")
    coefs = _decode.decode_bytes_to_coefficients(
        b,
        log2_bias=params.secpar,
        modulus=params.modulus,
        degree=params.degree,
        norm_bound=params.beta_ch,
        weight_bound=params.omega_ch,
    )
    from ..ops.ntt import ntt_fwd

    c_hat = np.asarray(ntt_fwd(params.plan, jnp.asarray(coefs)))
    return SignatureChallenge(params, c_hat)


def hash_ch(params: Params, key, message: str) -> SignatureChallenge:
    """Full challenge derivation (fusion.py:511-531)."""
    i = hash_message_to_int(params, message)
    n = _xof.challenge_xof_len(
        params.secpar, params.degree, params.modulus, params.beta_ch, params.omega_ch
    )
    return parse_challenge(params, hash_vk_and_int_to_bytes(params, key, i, n))


def sign(params: Params, key: OneTimeKeyTuple, message: str) -> Signature:
    """Sign one message (fusion.py:534-557)."""
    sk, vk = key
    chall = hash_ch(params, vk, message)
    ctx = _lc._ctx(params)
    sig = ctx["sign_from_c_hat"](jnp.asarray(sk.sk_hat)[None], jnp.asarray(chall.c_hat)[None])
    return Signature(params, np.asarray(sig)[0])


def hash_vks_and_ints_and_challs_to_bytes(
    params: Params,
    keys: Sequence,
    prehashed_messages: Sequence[int],
    challenges: Sequence,
) -> bytes:
    """Aggregation XOF (fusion.py:573-591); ``keys``/``challenges`` may be any
    objects whose str() is the wire form (the KAT generator passes key tuples)."""
    n = len(keys) * _xof.agg_block_len(
        params.secpar, params.degree, params.modulus, params.beta_ag, params.omega_ag
    )
    body = serial.zip_triples_str(
        [str(k) for k in keys], [int(i) for i in prehashed_messages], [str(c) for c in challenges]
    )
    return _xof.shake_digest(params.agg_xof_dst + b"," + body.encode("utf-8"), n)


def decode_bytes_to_agg_coefs(params: Params, b: bytes) -> List[AggregationCoefficient]:
    """Per-signer block decode + NTT (fusion.py:594-629)."""
    from ..ops.ntt import ntt_fwd

    block = _xof.agg_block_len(
        params.secpar, params.degree, params.modulus, params.beta_ag, params.omega_ag
    )
    num = len(b) // block
    coefs = np.stack(
        [
            _decode.decode_bytes_to_coefficients(
                b[i * block : (i + 1) * block],
                log2_bias=params.secpar,
                modulus=params.modulus,
                degree=params.degree,
                norm_bound=params.beta_ag,
                weight_bound=params.omega_ag,
            )
            for i in range(num)
        ]
    )
    alpha_hats = np.asarray(ntt_fwd(params.plan, jnp.asarray(coefs)))
    return [AggregationCoefficient(params, alpha_hats[i]) for i in range(num)]


def hash_ag(params: Params, keys: Sequence, messages: Sequence[str]) -> List[AggregationCoefficient]:
    """Aggregation coefficient derivation (fusion.py:632-652).  ``keys`` entries
    are hashed via str(); challenge derivation uses them directly, matching the
    reference (which hashes whatever object it is given)."""
    pre = [hash_message_to_int(params, m) for m in messages]
    challs = [hash_ch(params, k, m) for k, m in zip(keys, messages)]
    b = hash_vks_and_ints_and_challs_to_bytes(params, keys, pre, challs)
    return decode_bytes_to_agg_coefs(params, b)


def aggregate(
    params: Params,
    keys: Sequence[OneTimeVerificationKey],
    messages: Sequence[str],
    signatures: Sequence[Signature],
) -> Signature:
    """Aggregate N signatures (fusion.py:655-677)."""
    order = sorted(range(len(keys)), key=lambda i: str(keys[i]))
    s_keys = [keys[i] for i in order]
    s_msgs = [messages[i] for i in order]
    s_sigs = np.stack([signatures[i].signature_hat for i in order])
    alphas = hash_ag(params, s_keys, s_msgs)
    alpha_hats = np.stack([a.alpha_hat for a in alphas])
    agg = _lc._ctx(params)["aggregate_from_alpha_hat"](jnp.asarray(s_sigs), jnp.asarray(alpha_hats))
    return Signature(params, np.asarray(agg))


def verify(
    params: Params,
    keys: Sequence[OneTimeVerificationKey],
    messages: Sequence[str],
    aggregate_signature: Signature,
) -> Tuple[bool, str]:
    """Verify an aggregate signature (fusion.py:680-728), reference-exact
    reason strings included."""
    vks = np.stack([k.vk for k in keys])
    return _lc.verify(params, vks, list(messages), jnp.asarray(aggregate_signature.signature_hat))
