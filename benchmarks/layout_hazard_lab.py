#!/usr/bin/env python
"""Minimize the TPU layout-propagation hazard (round-4 VERDICT #1b).

Round-4 state: fusing the [G, N, 2, d] -> [2d, B] input transpose into the
signer jit silently corrupts ~7% of lanes at B=8192 (FUSION_FUSED_PREP
reproducer); the production pipeline therefore materializes transposes through
separate producer jits — ~2 launches per chunk of dispatch overhead.

This lab shrinks the repro and probes candidate workarounds:

  A. transpose -> render_decimal_cells_w        (is the render alone enough?)
  B. transpose -> render + merge_cells_w        (does the merge tree trip it?)
  C. transpose -> full vk_chunk_w fold          (the production subgraph)
  D. pre-materialized transpose, slice INSIDE the consumer jit at a static
     column offset (the launch-collapse pattern round 5 wants to use)
  E. as C but the transpose wrapped in jax.lax.optimization_barrier (known no)
  F. as C but input layout forced via jitted-transpose + donate  (probe)

Every variant is compared bitwise against the known-good two-jit path at
B=8192, secpar=256.

Usage: python benchmarks/layout_hazard_lab.py
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

cache_dir = Path(__file__).resolve().parents[1] / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import fusion_cryptography_tpu as ftpu
from fusion_cryptography_tpu.interop import device_serial as ds
from fusion_cryptography_tpu.ops import ragged_words as rw

B = 8192
D = 256


def log(m):
    print(f"[layout] {m}", flush=True)


def check(tag, got, want):
    got, want = np.asarray(got), np.asarray(want)
    if got.shape != want.shape:
        log(f"{tag:60s} SHAPE MISMATCH {got.shape} vs {want.shape}")
        return
    bad = got != want
    frac = bad.mean()
    status = "OK " if frac == 0 else f"CORRUPT {frac:.2%}"
    log(f"{tag:60s} {status}")


def main():
    params = ftpu.fusion_setup(256, 42)
    rng = np.random.default_rng(3)
    q = params.modulus
    vks = jnp.asarray(
        rng.integers(-(q // 2), q // 2 + 1, (B // 4, 4, 2, D), dtype=np.int64
        ).astype(np.int32)
    )

    # ---- known-good: transpose in its own jit, consumer takes materialized
    j_t = jax.jit(lambda v: v.reshape(-1, 2 * D).T)
    vk2d_t = j_t(vks)
    _ = np.asarray(vk2d_t)  # force materialization

    def render(v_t):
        c = rw.render_decimal_cells_w(v_t, b", ")
        return c.buf, c.length

    def render_merge(v_t):
        m = rw.merge_cells_w(rw.render_decimal_cells_w(v_t, b", "))
        return m.buf, m.length

    def vk_fold(v_t):
        ch = ds.vk_chunk_w(params, v_t)
        return ch.buf, ch.length

    for name, fn in (("render", render), ("render+merge", render_merge),
                     ("vk_chunk_w fold", vk_fold)):
        good = jax.jit(fn)(vk2d_t)
        good = tuple(np.asarray(g) for g in good)

        fused = jax.jit(lambda v: fn(v.reshape(-1, 2 * D).T))(vks)
        check(f"{name}: fused transpose", fused[0], good[0])
        check(f"{name}: fused transpose (lengths)", fused[1], good[1])

        ob = jax.jit(
            lambda v: fn(jax.lax.optimization_barrier(v.reshape(-1, 2 * D).T))
        )(vks)
        check(f"{name}: fused + optimization_barrier", ob[0], good[0])

    # ---- D: static-offset column slicing of a MATERIALIZED transpose inside
    # the consumer jit (the round-5 launch-collapse pattern)
    full_good = jax.jit(vk_fold)(vk2d_t)
    for lo, size in ((0, 2048), (2048, 2048), (4096, 4096)):
        sliced = jax.jit(
            lambda v, lo=lo, size=size: vk_fold(
                jax.lax.slice_in_dim(v, lo, lo + size, axis=1)
            )
        )(vk2d_t)
        check(
            f"slice-in-consumer [{lo}:{lo+size}]",
            sliced[0],
            np.asarray(full_good[0])[:, lo : lo + size],
        )
        check(
            f"slice-in-consumer lengths [{lo}:{lo+size}]",
            sliced[1],
            np.asarray(full_good[1])[lo : lo + size],
        )

    # ---- G: untransposed [B, 2d] input, transpose fused, but ALSO slicing
    # the batch axis first (the signer_at pattern with fused transpose)
    vks_flat = vks.reshape(-1, 2 * D)
    got = jax.jit(
        lambda v: vk_fold(jax.lax.slice_in_dim(v, 0, 2048, axis=0).T)
    )(vks_flat)
    check("slice-then-transpose fused", got[0], np.asarray(full_good[0])[:, :2048])


def probe_layout_constraint():
    """H: fused transpose + with_layout_constraint to the default row-major
    layout — if clean, producer jits become unnecessary entirely."""
    from jax.experimental.layout import Format, Layout, with_layout_constraint

    params = ftpu.fusion_setup(256, 42)
    rng = np.random.default_rng(3)
    q = params.modulus
    vks = jnp.asarray(
        rng.integers(-(q // 2), q // 2 + 1, (B // 4, 4, 2, D), dtype=np.int64
        ).astype(np.int32)
    )
    j_t = jax.jit(lambda v: v.reshape(-1, 2 * D).T)
    vk2d_t = j_t(vks)

    def vk_fold(v_t):
        ch = ds.vk_chunk_w(params, v_t)
        return ch.buf, ch.length

    good = tuple(np.asarray(g) for g in jax.jit(vk_fold)(vk2d_t))

    fmt = Layout((0, 1))

    def fused_lc(v):
        v_t = v.reshape(-1, 2 * D).T
        v_t = with_layout_constraint(v_t, fmt)
        return vk_fold(v_t)

    got = jax.jit(fused_lc)(vks)
    check("vk_chunk_w: fused + with_layout_constraint", got[0], good[0])
    check("vk_chunk_w: fused + with_layout_constraint len", got[1], good[1])

    # exact corruption count for the plain fused case
    got2 = jax.jit(lambda v: vk_fold(v.reshape(-1, 2 * D).T))(vks)
    bad = (np.asarray(got2[0]) != good[0]).sum()
    log(f"plain fused transpose: {bad} corrupt words of {good[0].size}")


if __name__ == "__main__":
    if "--layout-constraint" in sys.argv:
        probe_layout_constraint()
    else:
        main()
