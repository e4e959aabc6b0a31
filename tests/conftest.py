"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends; unit tests are
CPU-deterministic, and sharding tests get 8 virtual devices.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # unit tests are CPU-deterministic; force it

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compilation cache: repeated test runs skip recompiles.
import jax  # noqa: E402

# The environment's axon sitecustomize force-registers the TPU platform and
# overrides JAX_PLATFORMS; re-select CPU after import, before first backend use.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_executable_memory():
    """Drop compiled executables between test modules.

    A full-suite run accumulates ~500 tests' worth of jitted CPU
    executables; past ~90% of the suite the XLA CPU client has segfaulted
    inside compilation under that load.  The persistent /tmp/jax_cache
    makes re-tracing cheap, so per-module clearing costs seconds and keeps
    the process footprint flat.
    """
    yield
    import jax

    jax.clear_caches()
