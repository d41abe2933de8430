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

if os.environ.get("MOLLYTPU_TEST_TPU", "0") == "1":
    # on-device fidelity tier (`MOLLYTPU_TEST_TPU=1 pytest -m tpu`): keep the
    # default backend (the real TPU) and f32 — these tests gate the
    # Mosaic-COMPILED kernel path, which the CPU suite only covers in
    # interpret mode (reference analogue: test/gpu_consistency.jl runs its
    # CUDA kernels on device)
    pass
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# persistent XLA binary cache: the fast tier is compile-bound (interpret-mode
# Pallas programs especially); repeat runs skip straight to execution
_cache_dir = os.environ.get(
    "MOLLYTPU_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "mollytpu", "jaxcache"))
if _cache_dir and _cache_dir not in ("0", "off"):
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # measured: lowering this to 0.3 s does NOT speed warm runs — the
        # fast tier's tail is tracing + pytest overhead, not XLA compiles
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def pytest_collection_modifyitems(config, items):
    import pytest
    if os.environ.get("MOLLYTPU_TEST_TPU", "0") == "1":
        return
    skip = pytest.mark.skip(reason="TPU tier: set MOLLYTPU_TEST_TPU=1 and "
                                   "run on a TPU host")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
    # a plain `pytest tests/` is the FAST tier: the heavy tiers only run
    # when explicitly selected with -m (e.g. -m protein, -m slow, -m
    # "not tpu" for the full suite)
    if config.option.markexpr:
        return
    for tier in ("protein", "conservation", "slow", "gradients"):
        skip_t = pytest.mark.skip(
            reason=f"{tier} tier: opt in with -m {tier} "
                   f"(or -m 'not tpu' for the full CPU suite)")
        for item in items:
            if tier in item.keywords:
                item.add_marker(skip_t)
