"""Host-side hash/XOF/sampling subsystem.

Hashing (SHA3-256 / SHAKE256) is inherently serial and byte-oriented; it stays on
the host CPU.  The host/device boundary of the framework sits exactly at
"bytes in -> coefficient tensor out" (the output of the byte decoder), per the
design stance in SURVEY.md §7.
"""
from .sampler import (
    sample_short_poly_coeffs,
    sample_uniform_ntt_values,
    sample_short_matrix_coeffs,
)
from .xof import (
    hash_message_to_int,
    shake_digest,
    challenge_xof_len,
    agg_block_len,
)
from .decode import decode_bytes_to_coefficients
