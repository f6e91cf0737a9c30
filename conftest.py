"""Pytest config: force CPU backend with a virtual 8-device mesh and float64.

Tests validate numerics in f64 on CPU (golden behaviour); TPU execution is
exercised by ``bench.py`` and the driver's compile checks.  Environment must
be set before jax is imported anywhere.
"""

import os

# The container environment pins JAX_PLATFORMS=axon (TPU tunnel) and a
# sitecustomize eagerly registers that backend, so the env var alone is not
# enough: override through jax.config, which wins over the registered client.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NO persistent compile cache for the CPU suite: on this fleet the
# XLA:CPU AOT loader reports a machine-feature mismatch for every cache
# entry ("+prefer-no-scatter ... not supported on the host machine") and
# deserialized executables can SIGSEGV on load (observed deterministically
# at tests/test_nmpc.py's eager riccati solves, round 5, even with a
# freshly regenerated cache).  Recompiling each run costs ~2x suite time
# but is stable; the TPU-side cache (/tmp/jax_cache_tpu) is unaffected.


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    With the whole suite in one process, XLA:CPU accumulates hundreds of
    loaded JIT modules; on this fleet the compiler deterministically
    aborts (SIGABRT/SIGSEGV inside backend_compile_and_load) at
    tests/test_riccati.py's eager solves once the full prefix has run --
    the same tests pass standalone.  Dropping the dispatch/executable
    caches at module boundaries keeps the loaded-module population
    bounded; the cost is re-compilation of shared programs per module.
    """
    import jax
    jax.clear_caches()
    yield
