"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths (mesh/pjit/shard_map, psum/all_to_all collectives) are
exercised without TPU hardware, per SURVEY.md §4's distributed-test plan.

Note: this environment pre-registers a remote-TPU PJRT plugin via sitecustomize
and sets JAX_PLATFORMS before any conftest runs, so plain env-var overrides are
too late — use jax.config directly before any backend is touched.  Running the
test suite against the remote chip would turn every eager op into an RPC.

``FUSION_TEST_BACKEND=tpu`` overrides the CPU forcing for the FAST smoke tier
(``pytest -m fast``): the real chip runs with the repo's persistent compile
cache (.jax_cache) so a warm run stays under ~2 minutes.  The full suite is a
CPU suite — multi-device tests need the virtual 8-mesh and would skip on one
chip anyway.
"""
import os
from pathlib import Path

_backend = os.environ.get("FUSION_TEST_BACKEND", "cpu")

import jax

if _backend == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
else:
    cache = Path(__file__).resolve().parents[1] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
