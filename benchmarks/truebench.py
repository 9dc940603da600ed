"""Trustworthy device timing over the axon tunnel.

``jax.block_until_ready`` does NOT synchronize on this remote-TPU platform
(it returns in ~0.1 ms for multi-ms work), so any timing that relies on it is
fiction.  The only reliable sync is a host pull (``np.asarray``).

``rate(fn, args, iters)`` times ``iters`` dependency-chained applications of
``fn`` inside ONE jit, pulls one tiny slice, and differences two iteration
counts to cancel tunnel round-trip + transfer overhead:

    t(K2) - t(K1)  ≈  (K2 - K1) * t_op
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def _pull(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[:1])


def chained(fn, n_iters: int):
    """fn: args-tuple -> args-tuple (same shapes).  Returns jitted K-fold fn."""
    def body(carry):
        def step(i, a):
            return fn(a)
        return jax.lax.fori_loop(0, n_iters, step, carry)
    return jax.jit(body)


def measure(fn_jit, carry, reps=3):
    _pull(fn_jit(carry))  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        _pull(fn_jit(carry))
        ts.append(time.time() - t0)
    return min(ts)


def rate(fn, carry, k1=1, k2=9, reps=3, label=""):
    """Per-application seconds of ``fn`` (carry-pytree -> carry-pytree)."""
    f1 = chained(fn, k1)
    f2 = chained(fn, k2)
    t1 = measure(f1, carry, reps)
    t2 = measure(f2, carry, reps)
    per = (t2 - t1) / (k2 - k1)
    if label:
        print(f"{label:52s} {per*1e3:9.3f} ms/iter   (k1={t1*1e3:.1f}ms k2={t2*1e3:.1f}ms)", flush=True)
    return per
