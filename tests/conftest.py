"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests use
xla_force_host_platform_device_count (see repo instructions). Set before any
jax import so the backend picks it up.
"""

import os

# Force CPU: the shell env sets JAX_PLATFORMS=axon (TPU tunnel), which is
# slow to initialize and single-tenant; unit tests run on host CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
