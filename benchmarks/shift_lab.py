#!/usr/bin/env python
"""shift_left_w variants: measure which barrel formulation XLA compiles to the
least HBM traffic on this TPU.

V0 current radix-4 (pad-created operands, select_n, broadcast i32 selector)
V1 radix-4 over ONE pre-padded buffer, operands are slices
V2 radix-16 over pre-padded buffer, slices
V3 where-chain radix-2 over pre-padded buffer (masks stay [1, B] bool)
V4 radix-16 with u8 selector
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--width", type=int, default=1800)
    ap.add_argument("--maxs", type=int, default=5200)
    args = ap.parse_args()

    import jax

    cache = Path(__file__).resolve().parents[1] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    from jax import lax

    from truebench import rate
    from fusion_cryptography_tpu.ops import ragged_words as rw

    B, W, MAXS = args.batch, args.width, args.maxs
    rng = np.random.default_rng(3)
    big = jnp.asarray(rng.integers(0, 2**32, size=(W, B), dtype=np.uint64).astype(np.uint32))
    s = jnp.asarray(rng.integers(0, MAXS, size=(B,), dtype=np.int64).astype(np.int32))
    _U32 = jnp.uint32
    _I32 = jnp.int32

    def subword(buf, sv):
        r = (sv & 3).astype(_U32)[None, :]
        sa = np.uint32(8) * r
        nxt = jnp.pad(buf[1:], ((0, 1), (0, 0)))
        hi = jnp.where(sa > 0, nxt << (np.uint32(32) - sa), np.uint32(0))
        return jnp.where(sa > 0, (buf >> sa) | hi, buf)

    max_wq = MAXS >> 2

    def v1(buf, sv):
        buf = subword(buf, sv)
        wq = sv >> 2
        step = 1
        while step <= max_wq:
            hi = min(3, max_wq // step)
            ext = jnp.pad(buf, ((0, hi * step), (0, 0)))
            sel = ((wq // step) & 3).astype(_I32)
            sel = jnp.broadcast_to(jnp.minimum(sel, hi)[None, :], buf.shape)
            buf = lax.select_n(sel, *[ext[k * step : k * step + W] for k in range(hi + 1)])
            step <<= 2
        return buf

    def v2(buf, sv):
        buf = subword(buf, sv)
        wq = sv >> 2
        step = 1
        while step <= max_wq:
            hi = min(15, max_wq // step)
            ext = jnp.pad(buf, ((0, hi * step), (0, 0)))
            sel = ((wq // step) & 15).astype(_I32)
            sel = jnp.broadcast_to(jnp.minimum(sel, hi)[None, :], buf.shape)
            buf = lax.select_n(sel, *[ext[k * step : k * step + W] for k in range(hi + 1)])
            step <<= 4
        return buf

    def v3(buf, sv):
        buf = subword(buf, sv)
        wq = sv >> 2
        bit = 1
        while bit <= max_wq:
            ext = jnp.pad(buf, ((0, bit), (0, 0)))
            take = ((wq & bit) != 0)[None, :]
            buf = jnp.where(take, ext[bit : bit + W], buf)
            bit <<= 1
        return buf

    def v4(buf, sv):
        buf = subword(buf, sv)
        wq = sv >> 2
        step = 1
        while step <= max_wq:
            hi = min(15, max_wq // step)
            ext = jnp.pad(buf, ((0, hi * step), (0, 0)))
            sel = ((wq // step) & 15).astype(jnp.uint8)
            sel = jnp.broadcast_to(jnp.minimum(sel, np.uint8(hi))[None, :], buf.shape)
            buf = lax.select_n(sel, *[ext[k * step : k * step + W] for k in range(hi + 1)])
            step <<= 4
        return buf

    def mk(fn):
        def f(c):
            (x,) = c
            return (fn(x, s),)
        return f

    rate(mk(lambda b, sv: rw.shift_left_w(b, sv, MAXS)), (big,), label="V0 current radix-4")
    rate(mk(v1), (big,), label="V1 radix-4 slices")
    rate(mk(v2), (big,), label="V2 radix-16 slices")
    rate(mk(v3), (big,), label="V3 radix-2 where slices")
    rate(mk(v4), (big,), label="V4 radix-16 u8 sel")

    # correctness spot-check vs V0
    ref = np.asarray(rw.shift_left_w(big, s, MAXS))
    for name, fn in [("v1", v1), ("v2", v2), ("v3", v3), ("v4", v4)]:
        got = np.asarray(fn(big, s))
        assert np.array_equal(got, ref), name
    print("all variants bit-exact vs V0")


if __name__ == "__main__":
    main()
