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
import numpy as np


def qtime(fn, *args, reps=20, warmup=2, inner=1):
    """Median-of-3 queued timing: per-call device ms of fn(*args).

    fn is called `reps` times back-to-back without blocking, then one
    block_until_ready on the last result's leaves. Repeat 3x, take median.
    `inner` divides the result (for fns that internally run k iterations).
    """
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
