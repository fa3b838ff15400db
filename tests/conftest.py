"""Test configuration: run everything on a virtual 8-device CPU mesh.

Note: in the axon TPU environment the JAX_PLATFORMS *env var* is overridden
by the platform plugin; the config knob still works, so we set both — env
vars first (before jax import), then the config update.
"""

import os

# FORCE the env var (not setdefault): the axon image exports
# JAX_PLATFORMS=axon, and cli/common.py re-applies the env var in-process —
# a leftover "axon" would flip tests onto the TPU tunnel (and hang forever
# when it is down) the moment a driver module runs before any CPU op
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: e2e driver tests otherwise spend minutes
# recompiling identical executables on every run
jax.config.update("jax_compilation_cache_dir", "/tmp/shine_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Keep the process under the kernel's vm.max_map_count (65530).

    Every XLA CPU executable holds a handful of mmap'd JIT code regions
    and jax's pjit cache never drops them, so a full-suite run
    monotonically accumulates memory maps and crossed the limit at
    ~200 executables — LLVM's JIT does not check the failed mmap and
    SEGFAULTS (diagnosed round 4: three full-suite runs crashed at the
    same ~500 s position in three different tests, maps ~50-65k and
    climbing; crash site alternated between executable.serialize and
    backend_compile_and_load).  Dropping the caches between test modules
    frees the maps; the persistent compile cache makes the cross-module
    recompiles cheap deserializations.
    """
    yield
    jax.clear_caches()
