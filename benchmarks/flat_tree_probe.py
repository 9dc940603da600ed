#!/usr/bin/env python
"""Standalone probe: compile + time ONE flat-slot cells merge tree
(ops/fold_pallas._merge_cells_flat) as its own Pallas kernel, vs the XLA
merge_cells_w tree — isolates the fold-tree cost from the full signer
kernel (which also folds the wide spec nodes and takes much longer to
compile)."""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--count", type=int, default=256)
    ap.add_argument("--tile", type=int, default=128)
    args = ap.parse_args()
    B, K, tile = args.batch, args.count, args.tile

    import jax

    cache = Path(__file__).resolve().parents[1] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from truebench import rate
    from fusion_cryptography_tpu.ops import fold_pallas as fp
    from fusion_cryptography_tpu.ops import ragged_words as rw

    q = 2147465729
    rng = np.random.default_rng(7)
    vals = jnp.asarray(
        rng.integers(-(q // 2), q // 2 + 1, (K, B), dtype=np.int64).astype(np.int32)
    )
    sep = b", "
    Wout = rw.words_for(K * (len(sep) + 11))
    cw = rw.words_for(len(sep) + rw.DEC_W)
    Wslot = 4 * (1 << (K - 1).bit_length()) // 2 * 2  # flat buffer words

    def kernel(v_ref, ob_ref, ol_ref):
        fp._INTERPRET = False
        cells = fp._render_cells(v_ref[:], sep)
        out = fp._merge_cells_flat(cells)
        pad = ob_ref.shape[0] - out.buf.shape[0]
        ob_ref[:] = (
            fp._pad_rows(out.buf, pad) if pad > 0 else out.buf[: ob_ref.shape[0]]
        )
        ol_ref[:] = out.length[None, :]

    Wbuf = max(Wout, 4 * (1 << (K - 1).bit_length()))

    def flat_call(v):
        grid = (B // tile,)
        col = lambda i: (0, i)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((Wbuf, B), jnp.uint32),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
            ),
            grid=grid,
            in_specs=[pl.BlockSpec((K, tile), col, memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((Wbuf, tile), col, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(v)

    def xla_call(v):
        cells = rw.render_decimal_cells_w(v, sep)
        out = rw.merge_cells_w(cells)
        pad = Wbuf - out.buf.shape[0]
        buf = jnp.pad(out.buf, ((0, pad), (0, 0))) if pad > 0 else out.buf[:Wbuf]
        return buf, out.length[None, :]

    print(f"device={jax.devices()[0]} K={K} B={B} Wbuf={Wbuf}", flush=True)
    import time

    t0 = time.time()
    gb, gl = jax.jit(flat_call)(vals)
    gb.block_until_ready()
    np.asarray(gl)
    print(f"flat kernel compile+run: {time.time()-t0:.1f}s", flush=True)
    wb, wl = jax.jit(xla_call)(vals)
    ok = np.array_equal(np.asarray(wb), np.asarray(gb)) and np.array_equal(
        np.asarray(wl), np.asarray(gl)
    )
    print(f"parity vs XLA merge_cells_w: {'OK' if ok else 'MISMATCH'}", flush=True)

    def mk(fn):
        def f(c):
            (x,) = c
            b, l = fn(x)
            dep = (b[:1].astype(jnp.int32) + l.astype(jnp.int32)) % np.int32(97)
            return ((x + dep) % np.int32(97),)

        return f

    per = rate(mk(flat_call), (vals,), label=f"flat pallas tree [K={K},B={B}]")
    print(f"    -> {per / B * 1e6 * 4:8.3f} us/group(x4)", flush=True)
    per = rate(mk(xla_call), (vals,), label=f"XLA merge tree   [K={K},B={B}]")
    print(f"    -> {per / B * 1e6 * 4:8.3f} us/group(x4)", flush=True)


if __name__ == "__main__":
    main()
