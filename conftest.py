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
# persistent compile cache: repeated suite runs skip XLA compilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
