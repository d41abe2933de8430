"""MBAR: multistate Bennett acceptance ratio free-energy estimation.

Parity with /root/reference/src/free_energy/mbar.jl (MBARInput,
assemble_mbar_inputs, iterate_mbar self-consistent + Newton, mbar_weights,
mbar_pmf, pmf_with_uncertainty, PMF struct).

TPU-native design: the u_kn reduced-potential matrix lives on device and the
self-consistent / Newton iterations are jitted lax loops over logsumexp
reductions — MBAR is pure dense linear algebra and maps directly onto XLA.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..units import KB


@dataclasses.dataclass(frozen=True)
class MBARInput:
    """u_kn: (K, N) reduced potentials of every sample n evaluated in every
    state k (u = beta_k * U_k(x_n)); n_k: (K,) samples drawn from each state."""

    u_kn: jax.Array
    n_k: jax.Array


jax.tree_util.register_dataclass(MBARInput, data_fields=["u_kn", "n_k"],
                                 meta_fields=[])


def assemble_mbar_inputs(energies_per_state, betas=None, temperature=None):
    """Build MBARInput from a (K, K, S) array: energies[k, l, s] = U_l(x from
    state k, sample s), or from a list of per-state sample energies
    (reference: assemble_mbar_inputs)."""
    e = jnp.asarray(energies_per_state)
    k, l, s = e.shape
    assert k == l
    if betas is None:
        betas = 1.0 / (KB * jnp.asarray(temperature))
    u = e * betas[None, :, None]          # reduce with the evaluating state's beta
    u_kn = jnp.transpose(u, (1, 0, 2)).reshape(l, k * s)
    n_k = jnp.full((k,), s)
    return MBARInput(u_kn=u_kn, n_k=n_k)


@partial(jax.jit, static_argnames=("n_iters", "newton_iters"))
def iterate_mbar(inp: MBARInput, n_iters=200, newton_iters=20, tol=1e-10):
    """Solve the MBAR equations. Returns free energies f_k (dimensionless,
    f_1 = 0). Self-consistent sweeps followed by Newton polish
    (reference: iterate_mbar)."""
    u_kn, n_k = inp.u_kn, inp.n_k.astype(inp.u_kn.dtype)
    k = u_kn.shape[0]
    log_n = jnp.log(n_k)

    def log_denom(f):
        # log sum_k N_k exp(f_k - u_kn)  per sample -> (N,)
        return jax.scipy.special.logsumexp(
            log_n[:, None] + f[:, None] - u_kn, axis=0)

    def sc_step(_, f):
        ld = log_denom(f)
        f_new = -jax.scipy.special.logsumexp(-u_kn - ld[None, :], axis=1)
        return f_new - f_new[0]

    f = jnp.zeros((k,), dtype=u_kn.dtype)
    f = jax.lax.fori_loop(0, n_iters, sc_step, f)

    def newton_step(_, f):
        ld = log_denom(f)
        w = jnp.exp(log_n[:, None] + f[:, None] - u_kn - ld[None, :])  # (K, N)
        g = n_k - jnp.sum(w, axis=1)               # gradient of the MBAR objective
        h = jnp.diag(jnp.sum(w, axis=1)) - w @ w.T  # Hessian
        # fix gauge f_1 = 0: solve on the reduced system
        h_r = h[1:, 1:] + 1e-10 * jnp.eye(k - 1, dtype=f.dtype)
        df = jnp.linalg.solve(h_r, g[1:])
        f = f.at[1:].add(-df)
        return f - f[0]

    f = jax.lax.fori_loop(0, newton_iters, newton_step, f)
    return f


def mbar_weights(inp: MBARInput, f=None):
    """Normalized sample weights for each state: (K, N), rows sum to 1
    (reference: mbar_weights)."""
    if f is None:
        f = iterate_mbar(inp)
    log_n = jnp.log(inp.n_k.astype(inp.u_kn.dtype))
    ld = jax.scipy.special.logsumexp(
        log_n[:, None] + f[:, None] - inp.u_kn, axis=0)
    logw = -inp.u_kn - ld[None, :]
    logw = logw - jax.scipy.special.logsumexp(logw, axis=1, keepdims=True)
    return jnp.exp(logw)


def free_energy_differences(inp: MBARInput, temperature=None):
    """Delta f matrix (K, K); multiplied by kT if temperature given."""
    f = iterate_mbar(inp)
    df = f[None, :] - f[:, None]
    if temperature is not None:
        df = df * KB * temperature
    return df


@dataclasses.dataclass
class PMF:
    """Potential of mean force on a CV grid (reference: PMF struct)."""

    centers: jax.Array
    values: jax.Array           # kJ/mol, min-shifted
    uncertainties: jax.Array = None


def mbar_pmf(inp: MBARInput, cv_samples, bin_edges, temperature,
             target_state_u=None):
    """PMF along a collective variable from MBAR weights (reference:
    mbar_pmf / pmf_with_uncertainty). cv_samples: (N,) CV value per sample
    (ordered like u_kn columns); target_state_u: (N,) reduced potential of
    the unbiased target state per sample (defaults to zeros: uniform
    target)."""
    f = iterate_mbar(inp)
    log_n = jnp.log(inp.n_k.astype(inp.u_kn.dtype))
    ld = jax.scipy.special.logsumexp(
        log_n[:, None] + f[:, None] - inp.u_kn, axis=0)
    if target_state_u is None:
        target_state_u = jnp.zeros_like(ld)
    logw = -target_state_u - ld
    logw = logw - jax.scipy.special.logsumexp(logw)
    w = jnp.exp(logw)
    edges = jnp.asarray(bin_edges)
    nbins = edges.shape[0] - 1
    which = jnp.clip(jnp.searchsorted(edges, cv_samples) - 1, 0, nbins - 1)
    p = jnp.zeros((nbins,), w.dtype).at[which].add(w)
    kt = KB * temperature
    vals = -kt * jnp.log(jnp.maximum(p, 1e-300))
    vals = vals - jnp.min(vals)
    # asymptotic per-bin uncertainty ~ kT * sqrt((1 - p) / (p * n_eff))
    n_eff = 1.0 / jnp.sum(w * w)
    unc = kt * jnp.sqrt(jnp.maximum(1.0 - p, 0.0) / jnp.maximum(p * n_eff, 1e-12))
    centers = 0.5 * (edges[:-1] + edges[1:])
    return PMF(centers=centers, values=vals, uncertainties=unc)


def pmf_with_uncertainty(*args, **kw):
    return mbar_pmf(*args, **kw)
