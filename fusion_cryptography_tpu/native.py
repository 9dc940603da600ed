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
from typing import List, Optional, Sequence, Tuple

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "fusion_native.c"
_LIB_PATH = _SRC.parent / "libfusion_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["gcc", "-O3", "-shared", "-fPIC", "-pthread",
             "-o", str(_LIB_PATH), str(_SRC)],
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
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _as_u8p(buf) -> ctypes.POINTER(ctypes.c_uint8):
    return (ctypes.c_uint8 * len(buf)).from_buffer(buf)


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
    n = len(vk_reprs)
    vk_blob, vk_off = _pack_blobs(vk_reprs)
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


def sample_short_batch(seeds: Sequence[int], degree: int, norm_bound: int,
                       weight_bound: int, modulus: int) -> np.ndarray:
    lib = _load()
    s = np.asarray(list(seeds), dtype=np.uint64)
    out = np.empty((len(s), degree), dtype=np.int32)
    lib.fn_sample_short_batch(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(s), degree,
        norm_bound, weight_bound, modulus,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
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
