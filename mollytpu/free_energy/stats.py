"""Statistical inefficiency and autocorrelation-based subsampling.

Parity with /root/reference/src/free_energy/stats.jl: g = 1 + 2 tau_int from
the normalized autocorrelation with the standard positive-sequence truncation
(Chodera's detect-equilibration convention); `subsample_indices` yields
effectively-independent sample indices.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def statistical_inefficiency(series, mintime=1):
    """g = 1 + 2 sum_t (1 - t/T) C(t), truncated at the first non-positive
    autocorrelation after `mintime`."""
    x = np.asarray(series, dtype=np.float64)
    t_len = x.shape[0]
    x = x - x.mean()
    var = np.mean(x * x)
    if var == 0 or t_len < 3:
        return 1.0
    g = 1.0
    for t in range(1, t_len - 1):
        c = np.mean(x[: t_len - t] * x[t:]) / var
        if c <= 0.0 and t > mintime:
            break
        g += 2.0 * c * (1.0 - t / t_len)
    return max(g, 1.0)


def subsample_indices(series, g=None):
    """Indices of approximately uncorrelated samples."""
    x = np.asarray(series)
    if g is None:
        g = statistical_inefficiency(x)
    stride = max(int(np.ceil(g)), 1)
    return np.arange(0, x.shape[0], stride)


def effective_sample_size(series):
    return len(np.asarray(series)) / statistical_inefficiency(series)
