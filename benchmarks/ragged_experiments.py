#!/usr/bin/env python
"""Microbenchmarks for ragged assembly + absorb strategies (group stage)."""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

cache = Path(__file__).resolve().parents[1] / ".jax_cache"
cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from fusion_cryptography_tpu.ops.keccak import shake256_absorb_lanes
from fusion_cryptography_tpu.ops.ragged import ragged_concat


def bench(name, fn, *args, reps=3):
    out = fn(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        leaf.block_until_ready()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        for leaf in jax.tree_util.tree_leaves(out):
            leaf.block_until_ready()
        ts.append(time.time() - t0)
    print(f"{name:52s} {min(ts)*1e3:9.2f} ms", file=sys.stderr, flush=True)
    return out


G, N, W = 512, 4, 10694
OUT = 42787
rng = np.random.default_rng(0)
tb = jnp.asarray(rng.integers(32, 127, (G, N, W), dtype=np.uint8))
tl = jnp.asarray(rng.integers(W // 2, W, (G, N), dtype=np.int32))

# --- 1. status quo: searchsorted + take_along_axis gather --------------------
HEAD = 6  # "dst,[" style header
TAIL = 1


def asm_gather(tb_, tl_):
    pool = jnp.concatenate(
        [jnp.broadcast_to(jnp.full((1, HEAD), 65, jnp.uint8), (G, HEAD))]
        + [tb_[:, k] for k in range(N)]
        + [jnp.broadcast_to(jnp.full((1, TAIL), 93, jnp.uint8), (G, TAIL))],
        axis=1,
    )
    offs, lens = [], []
    base = 0
    offs.append(jnp.full((G,), 0, jnp.int32)); lens.append(jnp.full((G,), HEAD, jnp.int32))
    base = HEAD
    for k in range(N):
        offs.append(jnp.full((G,), base, jnp.int32)); lens.append(tl_[:, k])
        base += W
    offs.append(jnp.full((G,), base, jnp.int32)); lens.append(jnp.full((G,), TAIL, jnp.int32))
    seg_off = jnp.stack(offs, axis=1)
    seg_len = jnp.stack(lens, axis=1)
    return ragged_concat(pool, seg_off, seg_len, OUT)


bench("gather ragged_concat [512 x 42787]", jax.jit(asm_gather), tb, tl)


# --- 2. vmapped dynamic_update_slice chain -----------------------------------
def asm_dus(tb_, tl_):
    out = jnp.zeros((G, OUT), jnp.uint8)
    out = out.at[:, :HEAD].set(65)
    pos = jnp.full((G,), HEAD, jnp.int32)

    def place(o, seg, p):
        return jax.vmap(lambda row, s, q: jax.lax.dynamic_update_slice(row, s, (q,)))(
            o, seg, p
        )

    for k in range(N):
        out = place(out, tb_[:, k], pos)
        pos = pos + tl_[:, k]
    tail = jnp.broadcast_to(jnp.full((1, TAIL), 93, jnp.uint8), (G, TAIL))
    out = place(out, tail, pos)
    return out, pos + TAIL


buf2, tot2 = bench("vmapped dynamic_update_slice chain", jax.jit(asm_dus), tb, tl)

# sanity: equality on live prefix
buf1, tot1 = jax.jit(asm_gather)(tb, tl)
b1, b2 = np.asarray(buf1), np.asarray(buf2)
t1 = np.asarray(tot1)
assert np.array_equal(t1, np.asarray(tot2))
ok = all(np.array_equal(b1[i, : t1[i]], b2[i, : t1[i]]) for i in range(0, G, 37))
print(f"DUS == gather on live prefix: {ok}", file=sys.stderr, flush=True)

# --- 3. absorb at group shapes vs signer shapes -------------------------------
pad = -(-(OUT + 1) // 136) * 136


def absorb_flat(b_, l_):
    st = shake256_absorb_lanes(b_, l_)
    return [x for p in st for x in p]


bp = jnp.zeros((G, pad), jnp.uint8).at[:, :OUT].set(buf2[:, :OUT])
bench(f"absorb [512 x {pad//136} blocks]", jax.jit(absorb_flat), bp, tot2)

b8 = jnp.asarray(rng.integers(0, 256, (2048, 54 * 136), dtype=np.uint8))
l8 = jnp.asarray(rng.integers(6000, 7219, (2048,), dtype=np.int32))
bench("absorb [2048 x 54 blocks]", jax.jit(absorb_flat), b8, l8)

b9 = jnp.asarray(rng.integers(0, 256, (4096, 315 * 136), dtype=np.uint8))
l9 = jnp.asarray(rng.integers(30000, 42787, (4096,), dtype=np.int32))
bench("absorb [4096 x 315 blocks]", jax.jit(absorb_flat), b9, l9)
