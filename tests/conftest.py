"""Test config: run everything on CPU with 8 virtual devices.

Multi-chip sharding tests use a virtual 8-device mesh (the driver
validates real multi-chip separately via __graft_entry__.dryrun_multichip).

NOTE: the environment's sitecustomize imports jax at interpreter start
with JAX_PLATFORMS=axon (the remote TPU tunnel), so setting the env var
here is too late — jax already captured it. jax.config.update works
after import as long as no backend has been initialized, and forces
tests onto the local CPU (hermetic + parallel-safe; the tunnel
serializes every compile/dispatch across processes otherwise).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# NOTE: no persistent compile cache here — this jax build segfaults
# inside compilation_cache.put_executable_and_time when serializing
# some large CPU executables (observed on the MSM kernel). Tests pay
# the recompiles; the TPU-side bench keeps its own cache dir, which
# has been stable.

assert jax.devices()[0].platform == "cpu", jax.devices()


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """XLA's CPU pipeline segfaults sporadically deep into long
    single-process sessions (observed in cache-write AND in
    backend_compile after ~100 tests, at varying points). Dropping
    compiled executables between test modules bounds the accumulation."""
    yield
    jax.clear_caches()
