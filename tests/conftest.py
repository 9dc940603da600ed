"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths (mesh/pjit/shard_map, psum/all_to_all collectives) are
exercised without TPU hardware, per SURVEY.md §4's distributed-test plan.

Note: this environment pre-registers a remote-TPU PJRT plugin via sitecustomize
and sets JAX_PLATFORMS before any conftest runs, so plain env-var overrides are
too late — use jax.config directly before any backend is touched.  Running the
test suite against the remote chip would turn every eager op into an RPC.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
