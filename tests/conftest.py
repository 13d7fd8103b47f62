"""Test config: run everything on CPU with 8 virtual devices.

Multi-chip sharding tests use a virtual 8-device mesh (the driver
validates real multi-chip separately via __graft_entry__.dryrun_multichip).
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
