"""Trajectory analysis: displacements, distances, RMSD, Rg, RDF, etc.

Parity with /root/reference/src/analysis.jl (displacements :18, distances
:32, rmsd Kabsch :38-97, radius_gyration :99, hydrodynamic_radius :117) and
ext/MollyKernelDensityExt.jl rdf (:9-26).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def displacements(coords_a, coords_b, boundary):
    """Minimum-image displacement vectors between two frames (N, D)."""
    return boundary.displacement(jnp.asarray(coords_a), jnp.asarray(coords_b))


def distances(coords, boundary):
    """All-pairs minimum-image distance matrix (N, N)."""
    c = jnp.asarray(coords)
    d = c.shape[1]
    diffs = tuple(c[:, k][None, :] - c[:, k][:, None] for k in range(d))
    drs = boundary.mic_parts(diffs)
    return jnp.sqrt(sum(x * x for x in drs))


def rmsd(coords, reference):
    """Kabsch-superposed RMSD (analysis.jl:38-97)."""
    p = jnp.asarray(coords)
    q = jnp.asarray(reference)
    p = p - jnp.mean(p, axis=0)
    q = q - jnp.mean(q, axis=0)
    h = p.T @ q
    u, s, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(u @ vt))
    rot = (u * jnp.asarray([1.0, 1.0, d])[None, :]) @ vt
    return jnp.sqrt(jnp.mean(jnp.sum((p @ rot - q) ** 2, axis=1)))


def radius_gyration(coords, masses):
    c = jnp.asarray(coords)
    m = jnp.asarray(masses)
    com = jnp.sum(c * m[:, None], axis=0) / jnp.sum(m)
    return jnp.sqrt(jnp.sum(m * jnp.sum((c - com) ** 2, axis=1)) / jnp.sum(m))


def hydrodynamic_radius(coords, boundary):
    """R_h = (mean of inverse pair distances)^-1 (analysis.jl:117)."""
    d = distances(coords, boundary)
    n = d.shape[0]
    eye = jnp.eye(n, dtype=bool)
    inv_sum = jnp.sum(jnp.where(eye, 0.0, 1.0 / jnp.where(eye, 1.0, d)))
    return n * n / inv_sum


def rdf(coords, boundary, n_bins=200, r_max=None):
    """Radial distribution function g(r) (MollyKernelDensityExt rdf, with a
    plain histogram instead of kernel density). Returns (centers, g)."""
    c = jnp.asarray(coords)
    n = c.shape[0]
    d = distances(c, boundary)
    iu = np.triu_indices(n, k=1)
    dv = np.asarray(d)[iu]
    if r_max is None:
        r_max = float(np.asarray(boundary.side_lengths).min()) / 2.0
    hist, edges = np.histogram(dv, bins=n_bins, range=(0.0, r_max))
    centers = 0.5 * (edges[:-1] + edges[1:])
    vol = float(boundary.volume())
    rho = n / vol
    shell = 4.0 * np.pi * centers ** 2 * (edges[1] - edges[0])
    norm = rho * shell * n * (n - 1) / 2.0 / n
    g = hist / np.maximum(norm, 1e-30)
    return centers, g


def dipole_moment(coords, charges):
    """sum q_i r_i (protein.jl:146 dipole_moment)."""
    return jnp.sum(jnp.asarray(charges)[:, None] * jnp.asarray(coords), axis=0)


def msd(coords_series, boundary=None):
    """Mean squared displacement vs the first frame of a (T, N, D) stack."""
    x = jnp.asarray(coords_series)
    d = x - x[0:1]
    return jnp.mean(jnp.sum(d * d, axis=-1), axis=-1)
