"""ctypes binding for the native host pipeline (native/fusion_native.c).

Builds the shared library on first use (gcc -O3, ~1 s) and caches it next to
the source; every entry point has a pure-Python fallback in hashing/, so the
framework works without a C toolchain (``available()`` reports which path is
active).  Bit-exactness of the native path against the Python path is asserted
in tests/test_native.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "fusion_native.c"
_LIB_PATH = _SRC.parent / "libfusion_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    # No global -mavx512f: the AVX-512 Keccak carries its own per-function
    # target attribute and a runtime CPU check, so the rest of the library
    # never emits AVX-512 instructions (portable to non-AVX-512 hosts).
    try:
        subprocess.run(
            ["gcc", "-O3", "-shared", "-fPIC", "-pthread", "-o", str(_LIB_PATH), str(_SRC)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SRC.exists():
            return None
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.fn_sha3_256.argtypes = [ctypes.c_char_p, ctypes.c_size_t, u8p]
        lib.fn_shake256.argtypes = [ctypes.c_char_p, ctypes.c_size_t, u8p, ctypes.c_size_t]
        lib.fn_decode_coeffs.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p,
        ]
        lib.fn_decode_coeffs.restype = ctypes.c_int
        lib.fn_decode_blocks.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p,
        ]
        lib.fn_decode_blocks.restype = ctypes.c_int
        lib.fn_derive_challenges.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,          # pre_dst
            ctypes.c_char_p, ctypes.c_size_t,          # hash_dst
            ctypes.c_char_p, u64p,                     # vk blob + offsets
            ctypes.c_char_p, u64p,                     # msg blob + offsets
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_size_t, ctypes.c_int32,
            i32p, u8p,
        ]
        lib.fn_derive_challenges.restype = ctypes.c_int
        lib.fn_sample_short_batch.argtypes = [
            u64p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int64, i32p,
        ]
        lib.fn_sample_uniform_batch.argtypes = [
            u64p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int64, i32p,
        ]
        lib.fn_format_poly.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            i32p, ctypes.c_int32, ctypes.c_char_p,
        ]
        lib.fn_format_poly.restype = ctypes.c_size_t
        lib.fn_have_avx512.restype = ctypes.c_int
        lib.fn_shake256_x8.argtypes = [
            ctypes.c_char_p, u64p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_size_t,
        ]
        lib.fn_agg_alpha_batch.argtypes = [
            ctypes.c_char_p, u64p, ctypes.c_int32, ctypes.c_int32, ctypes.c_size_t,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, i32p,
        ]
        lib.fn_agg_alpha_batch.restype = ctypes.c_int
        lib.fn_build_agg_payloads.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,          # agg_dst
            ctypes.c_char_p, u64p,                     # vk blob + offsets
            ctypes.c_char_p,                           # prehash digests
            ctypes.c_char_p, ctypes.c_size_t,          # meta
            i32p, ctypes.c_int32,                      # c_hat, degree
            ctypes.c_int32, ctypes.c_int32,            # n_groups, sigs_per_group
            u8p, u64p,                                 # out blob, out offsets
        ]
        lib.fn_build_agg_payloads.restype = ctypes.c_size_t
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.fn_ntt_fwd_batch.argtypes = [
            i32p, u32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int64, ctypes.c_int32,
        ]
        lib.fn_ntt_fwd_batch.restype = ctypes.c_int
        lib.fn_prehash_digits.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, u64p,
            ctypes.c_int32, u8p, i32p, ctypes.c_int32,
        ]
        lib.fn_prehash_digits.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def have_avx512() -> bool:
    lib = _load()
    return bool(lib is not None and lib.fn_have_avx512())


def shake256_x8(payloads: Sequence[bytes], n: int) -> list:
    """Batch up to 8 equal-block-count SHAKE256 XOFs (n output bytes each)."""
    if not 1 <= len(payloads) <= 8:
        raise ValueError("shake256_x8 takes 1..8 payloads")
    lib = _load()
    nb = {len(p) // 136 + 1 for p in payloads}
    if len(nb) != 1:
        raise ValueError("payloads must share an absorb block count")
    blob, offs = _pack_blobs(list(payloads))
    out = (ctypes.c_uint8 * (len(payloads) * n))()
    lib.fn_shake256_x8(
        blob, offs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        len(payloads), nb.pop(), out, n,
    )
    raw = bytes(out)
    return [raw[i * n : (i + 1) * n] for i in range(len(payloads))]


def sha3_256(data: bytes) -> bytes:
    lib = _load()
    out = (ctypes.c_uint8 * 32)()
    lib.fn_sha3_256(data, len(data), out)
    return bytes(out)


def shake256(data: bytes, n: int) -> bytes:
    lib = _load()
    out = (ctypes.c_uint8 * n)()
    lib.fn_shake256(data, len(data), out, n)
    return bytes(out)


def decode_coeffs(b: bytes, degree: int, weight_bound: int, bound: int,
                  bpc: int, bpi: int) -> np.ndarray:
    lib = _load()
    out = np.empty(degree, dtype=np.int32)
    if weight_bound > degree:
        raise ValueError("weight_bound must not exceed degree")
    rc = lib.fn_decode_coeffs(
        b, len(b), degree, weight_bound, bound, bpc, bpi,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise ValueError("Too few bytes to decode polynomial.")
    return out


def decode_blocks(b: bytes, block_len: int, n_blocks: int, degree: int,
                  weight_bound: int, bound: int, bpc: int, bpi: int) -> np.ndarray:
    lib = _load()
    out = np.empty((n_blocks, degree), dtype=np.int32)
    rc = lib.fn_decode_blocks(
        b, block_len, n_blocks, degree, weight_bound, bound, bpc, bpi,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise ValueError("Too few bytes to decode polynomial block.")
    return out


def pack_reprs(items) -> Tuple[bytes, np.ndarray]:
    """Pack repr strings/bytes into a (blob, offsets) pair reusable across the
    challenge and aggregation stages (avoids re-encoding + re-joining ~50 MB of
    vk reprs per derive call)."""
    return _pack_blobs([it.encode("utf-8") if isinstance(it, str) else it for it in items])


def _as_blob(items_or_packed) -> Tuple[bytes, np.ndarray]:
    if (
        isinstance(items_or_packed, tuple)
        and len(items_or_packed) == 2
        and isinstance(items_or_packed[0], bytes)
    ):
        return items_or_packed
    return _pack_blobs(list(items_or_packed))


def _pack_blobs(items: Sequence[bytes]) -> Tuple[bytes, np.ndarray]:
    offs = np.zeros(len(items) + 1, dtype=np.uint64)
    total = 0
    for i, it in enumerate(items):
        total += len(it)
        offs[i + 1] = total
    return b"".join(items), offs


def derive_challenges(
    pre_dst: bytes, hash_dst: bytes, vk_reprs: Sequence[bytes],
    messages: Sequence[bytes], degree: int, weight_bound: int, bound: int,
    bpc: int, bpi: int, xof_len: int, n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fused batched hash_ch: returns (coeffs int32[n, degree],
    prehash digests uint8[n, 32] little-endian)."""
    lib = _load()
    vk_blob, vk_off = _as_blob(vk_reprs)
    n = len(vk_off) - 1
    msg_blob, msg_off = _pack_blobs(messages)
    out = np.empty((n, degree), dtype=np.int32)
    pre = np.empty((n, 32), dtype=np.uint8)
    if n_threads <= 0:
        n_threads = min(16, os.cpu_count() or 1)
    rc = lib.fn_derive_challenges(
        pre_dst, len(pre_dst), hash_dst, len(hash_dst),
        vk_blob, vk_off.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        msg_blob, msg_off.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n, degree, weight_bound, bound, bpc, bpi, xof_len, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pre.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError("challenge derivation failed (XOF too short)")
    return out, pre


def ntt_fwd_batch(x: np.ndarray, brp: np.ndarray, q: int, n_threads: int = 0) -> np.ndarray:
    """Host-side batched forward NTT: centered int32[n, d] -> centered int32[n, d]
    (bit-reversed order), bit-identical to ops/ntt.ntt_fwd."""
    lib = _load()
    out = np.ascontiguousarray(x, dtype=np.int32).copy()
    b = np.ascontiguousarray(brp, dtype=np.uint32)
    if n_threads <= 0:
        n_threads = min(16, os.cpu_count() or 1)
    rc = lib.fn_ntt_fwd_batch(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        out.shape[0], out.shape[1], q, n_threads,
    )
    if rc != 0:
        raise ValueError("degree too large for host NTT")
    return out


def derive_alphas_fused(
    agg_dst: bytes,
    vk_reprs_sorted: Sequence[bytes],
    prehash_digests: np.ndarray,  # uint8[n_items, 32] little-endian
    ring_meta: bytes,
    c_hat: np.ndarray,  # int32[n_items, degree]
    n_groups: int,
    sigs_per_group: int,
    block_len: int,
    degree: int,
    weight_bound: int,
    bound: int,
    bpc: int,
    bpi: int,
    n_threads: int = 0,
) -> np.ndarray:
    """Fully-native hash_ag tail: build every group's zip-triples payload in C
    (vk reprs + decimal prehash + challenge reprs), then batched SHAKE + block
    decode.  Returns int32[n_groups, sigs_per_group, degree]."""
    lib = _load()
    n_items = n_groups * sigs_per_group
    vk_blob, vk_off = _as_blob(vk_reprs_sorted)
    c = np.ascontiguousarray(c_hat, dtype=np.int32)
    pre = np.ascontiguousarray(prehash_digests, dtype=np.uint8)
    # capacity bound: per item vk + 80 (dec) + chall repr + fixed punctuation
    chall_cap = len(ring_meta) + 64 + 13 * degree
    cap = n_groups * (len(agg_dst) + 4) + len(vk_blob) + n_items * (96 + chall_cap)
    blob = (ctypes.c_uint8 * cap)()
    offs = np.zeros(n_groups + 1, dtype=np.uint64)
    lib.fn_build_agg_payloads(
        agg_dst, len(agg_dst),
        vk_blob, vk_off.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        pre.ctypes.data_as(ctypes.c_char_p),
        ring_meta, len(ring_meta),
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), degree,
        n_groups, sigs_per_group,
        blob, offs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    out = np.empty((n_groups, sigs_per_group, degree), dtype=np.int32)
    if n_threads <= 0:
        n_threads = min(16, os.cpu_count() or 1)
    rc = lib.fn_agg_alpha_batch(
        ctypes.cast(blob, ctypes.c_char_p),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n_groups, sigs_per_group, block_len, degree, weight_bound, bound, bpc, bpi,
        n_threads, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise ValueError("aggregation alpha derivation failed")
    return out


def agg_alpha_batch(payloads: Sequence[bytes], sigs_per_group: int, block_len: int,
                    degree: int, weight_bound: int, bound: int, bpc: int, bpi: int,
                    n_threads: int = 0) -> np.ndarray:
    """Batched aggregation XOF + decode: one payload per group ->
    int32[n_groups, sigs_per_group, degree] alpha coefficient vectors."""
    lib = _load()
    blob, offs = _pack_blobs(list(payloads))
    G = len(payloads)
    out = np.empty((G, sigs_per_group, degree), dtype=np.int32)
    if n_threads <= 0:
        n_threads = min(16, os.cpu_count() or 1)
    rc = lib.fn_agg_alpha_batch(
        blob, offs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        G, sigs_per_group, block_len, degree, weight_bound, bound, bpc, bpi,
        n_threads, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise ValueError("aggregation alpha derivation failed")
    return out


def sample_short_batch(seeds: Sequence[int], degree: int, norm_bound: int,
                       weight_bound: int, modulus: int) -> np.ndarray:
    if max(0, min(degree, weight_bound)) > 0 and max(0, min(modulus // 2, norm_bound)) < 1:
        # mirror the stdlib path: randrange(0) raises (the C path would hit
        # undefined-width shifts instead of raising)
        raise ValueError("empty range for randrange() (0, 0, 0)")
    lib = _load()
    s = np.asarray(list(seeds), dtype=np.uint64)
    out = np.empty((len(s), degree), dtype=np.int32)

    def run(lo: int, hi: int) -> None:
        lib.fn_sample_short_batch(
            s[lo:hi].ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), hi - lo,
            degree, norm_bound, weight_bound, modulus,
            out[lo:hi].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )

    # ctypes releases the GIL for the C call, and per-seed MT19937 init
    # dominates the sampling cost, so large batches parallelize across host
    # cores (disjoint output slices; each seed's stream is independent)
    n_threads = min(os.cpu_count() or 1, max(1, len(s) // 2048))
    if n_threads > 1:
        from concurrent.futures import ThreadPoolExecutor

        step = -(-len(s) // n_threads)
        with ThreadPoolExecutor(n_threads) as ex:
            list(ex.map(lambda lo: run(lo, min(lo + step, len(s))),
                        range(0, len(s), step)))
    else:
        run(0, len(s))
    return out


def sample_uniform_batch(seeds: Sequence[int], degree: int, modulus: int) -> np.ndarray:
    lib = _load()
    s = np.asarray(list(seeds), dtype=np.uint64)
    out = np.empty((len(s), degree), dtype=np.int32)
    lib.fn_sample_uniform_batch(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(s), degree, modulus,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def format_poly(class_name: bytes, meta: bytes, field_name: bytes,
                values: np.ndarray) -> bytes:
    """Render one polynomial repr; values int32[d]."""
    lib = _load()
    d = len(values)
    cap = len(class_name) + len(meta) + len(field_name) + 16 + 13 * d
    buf = ctypes.create_string_buffer(cap)
    v = np.ascontiguousarray(values, dtype=np.int32)
    n = lib.fn_format_poly(
        class_name, meta, len(meta), field_name,
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), d, buf,
    )
    return buf.raw[:n]


def prehash_digits_batch(pre_dst: bytes, messages: Sequence[bytes],
                         n_threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Batched sha3_256(dst + "," + msg) -> (decimal digit bytes uint8[n, 78]
    zero-padded, lengths int32[n]) — the host half of the device verify
    pipeline (fusion/fusion.py:405-409 rendered as str(int))."""
    lib = _load()
    blob, offs = _pack_blobs(list(messages))
    n = len(messages)
    out = np.zeros((n, 78), dtype=np.uint8)
    lens = np.zeros(n, dtype=np.int32)
    if n_threads <= 0:
        n_threads = min(16, os.cpu_count() or 1)
    lib.fn_prehash_digits(
        pre_dst, len(pre_dst),
        blob, offs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads,
    )
    if (lens < 0).any():  # worker flags allocation failure with len = -1
        raise MemoryError(
            f"native prehash failed for {int((lens < 0).sum())} message(s)"
        )
    return out, lens
