#!/usr/bin/env python
"""Persistent TPU worker: executes job files in-process to amortize remote-TPU
init and compilation across experiments.

Watches JOB_DIR for ``*.py`` files; executes each in this process (globals
include a warm jax + fusion_cryptography_tpu), writes stdout+traceback to
``<job>.out`` and renames the job to ``<job>.done``.  Submit work by writing a
python file into JOB_DIR; poll for the ``.out``.
"""
import io
import sys
import time
import traceback
from contextlib import redirect_stdout, redirect_stderr
from pathlib import Path

JOB_DIR = Path("/tmp/tpu_jobs")
JOB_DIR.mkdir(exist_ok=True)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

cache = Path(__file__).resolve().parent.parent / ".jax_cache"
cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

print("[worker] initializing device...", flush=True)
t0 = time.time()
dev = jax.devices()[0]
print(f"[worker] device {dev} ready in {time.time()-t0:.1f}s", flush=True)

import numpy as np  # noqa — convenience for jobs
import jax.numpy as jnp  # noqa

BASE_GLOBALS = {"jax": jax, "jnp": jnp, "np": np, "time": time}

while True:
    jobs = sorted(p for p in JOB_DIR.glob("*.py"))
    if not jobs:
        time.sleep(0.5)
        continue
    job = jobs[0]
    out_path = job.with_suffix(".out")
    print(f"[worker] running {job.name}", flush=True)
    buf = io.StringIO()
    t0 = time.time()
    try:
        code = job.read_text()
        g = dict(BASE_GLOBALS)
        with redirect_stdout(buf), redirect_stderr(buf):
            exec(compile(code, str(job), "exec"), g)
        status = "OK"
    except Exception:
        buf.write("\n" + traceback.format_exc())
        status = "FAIL"
    buf.write(f"\n[worker] {status} in {time.time()-t0:.1f}s\n")
    out_path.write_text(buf.getvalue())
    job.rename(job.with_suffix(".done"))
    print(f"[worker] {job.name}: {status}", flush=True)
