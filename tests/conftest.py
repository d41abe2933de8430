"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests use
xla_force_host_platform_device_count (see repo instructions).

NOTE: this image PREIMPORTS jax at interpreter startup, so JAX_PLATFORMS in
the environment (shell or os.environ) is already snapshotted and silently
ignored — jax.config.update is the only reliable switch. Without it the
"CPU" suite runs over the axon TPU tunnel: ~1 ms dispatch per call and f64
transcendentals at float32 accuracy.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
