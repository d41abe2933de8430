"""Queued device timing for TPU-over-tunnel profiling.

On this platform, the FIRST device_get/host sync of a session flips every
subsequently *blocked* dispatch to a ~28 ms completion-latency floor (tunnel
round trip), so per-call `block_until_ready` timing reads ~28 ms for
everything and is useless below that. Throughput is unaffected: queued
dispatches pipeline and the device executes serially. Therefore: queue N
calls back-to-back, block ONCE, divide — that is the true per-call device
time (the method the reference uses for CUDA stage timing,
/root/reference/benchmark/gpu_profile_utils.jl:12-37, where the analogous
trap is stream-async launches).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


_regime_flipped = False


def _flip_d2h_regime():
    """On the axon tunnel, block_until_ready is a NO-OP until the process
    has performed one real device_get (measured: a 10-matmul chain 'timed'
    at 46 PFLOP/s with zero blocking before the flip). Force the flip so
    every subsequent block actually waits (with the known ~28 ms floor,
    which queued reps amortize)."""
    global _regime_flipped
    if not _regime_flipped:
        jax.device_get(jnp.zeros((), jnp.float32) + 1.0)
        _regime_flipped = True


def qtime(fn, *args, reps=20, warmup=2, inner=1):
    """Median-of-3 queued timing: per-call device ms of fn(*args).

    fn is called `reps` times back-to-back without blocking, then one
    block_until_ready on the last result's leaves. Repeat 3x, take median.
    `inner` divides the result (for fns that internally run k iterations).
    """
    _flip_d2h_regime()
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    totals = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        totals.append(time.perf_counter() - t0)
    return float(np.median(totals)) / (reps * inner) * 1e3
