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
    mbar_pmf). cv_samples: (N,) CV value per sample (ordered like u_kn
    columns); target_state_u: (N,) reduced potential of the unbiased target
    state per sample (defaults to zeros: uniform target). For PMF error
    bars use pmf_with_uncertainty."""
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
    centers = 0.5 * (edges[:-1] + edges[1:])
    return PMF(centers=centers, values=vals, uncertainties=None)


@partial(jax.jit, static_argnames=("nbins",))
def _pmf_cov(u_kn, n_k, f, target_state_u, which, nbins):
    """Asymptotic-covariance PMF machinery (reference: pmf_with_uncertainty,
    mbar.jl:799-935). For every bin A, augment the K x N state-weight matrix
    with the bin-indicator weights W_nA and the target weights W_na, form
    G = W_aug W_aug^T, and estimate the weight covariance Sigma via
    Sigma = pinv(pinv(G) - diag(N, 0, 0)) (pymbar Eq. D6); then
    var(p_A) = p_A^2 (Sigma_AA + Sigma_aa - 2 Sigma_Aa).

    TPU-native formulation: the K x K block of G and its target-row borders
    are bin-independent, so they are computed once as dense matmuls; only
    the bin row/column varies, assembled per bin and pinv'd under vmap
    ((K+2)^2 matrices — tiny). No per-bin python loop."""
    dt = u_kn.dtype
    log_n = jnp.log(n_k.astype(dt))
    ld = jax.scipy.special.logsumexp(
        log_n[:, None] + f[:, None] - u_kn, axis=0)        # log D_n
    w_samp = jnp.exp(f[:, None] - u_kn - ld[None, :])      # (K, N), rows sum 1
    v = -target_state_u - ld                                # log unnorm target w
    log_ca = jax.scipy.special.logsumexp(v)
    w_na = jnp.exp(v - log_ca)                              # (N,), sums to 1

    a = jax.nn.one_hot(which, nbins, dtype=dt).T            # (nbins, N)
    p = a @ w_na                                            # (nbins,)
    # per-bin normalized indicator weights (zero rows where the bin is empty)
    log_cab = jax.scipy.special.logsumexp(
        jnp.where(a > 0, v[None, :], -jnp.inf), axis=1)     # (nbins,)
    w_nab = a * jnp.exp(v[None, :] - log_cab[:, None])      # (nbins, N)
    w_nab = jnp.where(jnp.isfinite(log_cab)[:, None], w_nab, 0.0)

    k = u_kn.shape[0]
    g_kk = w_samp @ w_samp.T                                # (K, K) shared
    g_ka = w_samp @ w_na                                    # (K,) shared
    g_aa = w_na @ w_na                                      # () shared
    g_kab = w_samp @ w_nab.T                                # (K, nbins)
    g_aab = w_nab @ w_na                                    # (nbins,)
    g_aabb = jnp.sum(w_nab * w_nab, axis=1)                 # (nbins,)
    n_aug = jnp.diag(jnp.concatenate([n_k.astype(dt), jnp.zeros((2,), dt)]))

    def var_one(g_kb, g_ab, g_bb, p_b):
        g = jnp.zeros((k + 2, k + 2), dt)
        g = g.at[:k, :k].set(g_kk)
        g = g.at[:k, k].set(g_kb)
        g = g.at[k, :k].set(g_kb)
        g = g.at[:k, k + 1].set(g_ka)
        g = g.at[k + 1, :k].set(g_ka)
        g = g.at[k, k].set(g_bb)
        g = g.at[k, k + 1].set(g_ab)
        g = g.at[k + 1, k].set(g_ab)
        g = g.at[k + 1, k + 1].set(g_aa)
        sig = jnp.linalg.pinv(jnp.linalg.pinv(g) - n_aug, hermitian=True)
        return p_b * p_b * (sig[k, k] + sig[k + 1, k + 1] - 2.0 * sig[k, k + 1])

    var_p = jax.vmap(var_one)(g_kab.T, g_aab, g_aabb, p)
    var_p = jnp.where(p > 0, jnp.maximum(var_p, 0.0), jnp.nan)
    return p, var_p


def pmf_with_uncertainty(inp: MBARInput, cv_samples, bin_edges, temperature,
                         target_state_u=None):
    """PMF along a CV with asymptotic-covariance error bars (reference:
    pmf_with_uncertainty, mbar.jl:799-935 — the augmented-W estimator, NOT
    a large-N heuristic). Same arguments as mbar_pmf. Returns PMF with
    uncertainties = kT * sigma_F where sigma_F = sqrt(var p_A) / p_A (the
    delta-method standard deviation of -log p_A); empty bins get NaN."""
    f = iterate_mbar(inp)
    dt = inp.u_kn.dtype
    if target_state_u is None:
        target_state_u = jnp.zeros((inp.u_kn.shape[1],), dt)
    edges = jnp.asarray(bin_edges)
    nbins = edges.shape[0] - 1
    which = jnp.clip(jnp.searchsorted(edges, cv_samples) - 1, 0, nbins - 1)
    p, var_p = _pmf_cov(inp.u_kn, inp.n_k, f,
                        jnp.asarray(target_state_u, dt), which, int(nbins))
    kt = KB * temperature
    vals = jnp.where(p > 0, -kt * jnp.log(jnp.maximum(p, 1e-300)), jnp.nan)
    vals = vals - jnp.nanmin(vals)
    sigma = kt * jnp.sqrt(var_p) / jnp.maximum(p, 1e-300)
    centers = 0.5 * (edges[:-1] + edges[1:])
    return PMF(centers=centers, values=vals, uncertainties=sigma)
