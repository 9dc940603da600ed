#!/usr/bin/env python
"""True per-stage rates of the device pipeline primitives (see truebench.py)."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax

cache = Path(__file__).resolve().parents[1] / ".jax_cache"
cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

import fusion_cryptography_tpu as ftpu
from fusion_cryptography_tpu.interop import device_serial as ds
from fusion_cryptography_tpu.ops import xof_decode
from fusion_cryptography_tpu.ops.keccak import keccak_f_lanes, RATE
from fusion_cryptography_tpu.ops.ntt import ntt_fwd_u, ntt_inv_u
from fusion_cryptography_tpu.scheme.device_pipeline import _geometries
from truebench import rate

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
G, N = B // 4, 4
params = ftpu.fusion_setup(256, 42)
F = params.plan.field
d = params.degree
g = _geometries(params)
rng = np.random.default_rng(0)

# --- keccak permutation ------------------------------------------------------
state = tuple(
    (jnp.asarray(rng.integers(0, 2**32, B, dtype=np.uint32)),
     jnp.asarray(rng.integers(0, 2**32, B, dtype=np.uint32)))
    for _ in range(25)
)
t = rate(keccak_f_lanes, state, k1=2, k2=20, label=f"keccak_f B={B}")
print(f"  -> {B/t/1e6:.1f} M perms/s", flush=True)

# --- NTT ----------------------------------------------------------------------
x = jnp.asarray(rng.integers(0, params.modulus, (B, d), dtype=np.uint32))
t = rate(lambda a: ntt_fwd_u(params.plan, a), x, k1=2, k2=20, label=f"ntt_fwd d={d} B={B}")
print(f"  -> {B/t/1e6:.1f} M transforms/s", flush=True)

# --- verify core lattice (G groups) -------------------------------------------
rank = params.rank
aggs = jnp.asarray(rng.integers(0, params.modulus, (G, rank, d), dtype=np.uint32))
a_mont = F.to_mont(F.to_unsigned(jnp.asarray(params.public_challenge)))
def lattice(aggs):
    coef = F.to_centered(ntt_inv_u(params.plan, aggs))
    observed = F.dot_mod(a_mont, aggs, axis=-2)
    norm = jnp.max(jnp.abs(coef), axis=(-2, -1))
    return (aggs + norm[:, None, None].astype(jnp.uint32) + observed[:, None, :]) % np.uint32(params.modulus)
t = rate(lattice, aggs, k1=1, k2=5, label=f"agg INTT+obs rank={rank} G={G}")
print(f"  -> {G/t/1e3:.1f} k verifies/s lattice-side", flush=True)

# --- decode -------------------------------------------------------------------
xof = jnp.asarray(rng.integers(0, 256, (B, g["n_xof_ch"]), dtype=np.uint8))
def dec(xb):
    cc = xof_decode.decode_coeffs(xb, g["geom_ch"])
    return (xb + cc[:, :1].astype(jnp.uint8)) 
t = rate(dec, xof, k1=1, k2=3, label=f"decode ch (195 swaps) B={B}")
print(f"  -> {B/t/1e6:.2f} M decodes/s", flush=True)

# --- assemble challenge preimage (current impl) --------------------------------
ch_spec = g["ch_spec"]
vk2d = jnp.asarray(rng.integers(-(2**30), 2**30, (B, 2*d), dtype=np.int32))
pre_buf = jnp.asarray(rng.integers(48, 58, (B, ds.PREHASH_W), dtype=np.uint8))
pre_len = jnp.full((B,), 77, dtype=jnp.int32)
def asm(v):
    buf, tot = ds.assemble(ch_spec, values=v, extras=[(pre_buf, pre_len)])
    return v + buf[:, :1].astype(jnp.int32) + tot[:, None]
t = rate(asm, vk2d, k1=1, k2=3, label=f"assemble ch preimage B={B}")
print(f"  -> {B/t/1e6:.2f} M assembles/s", flush=True)
