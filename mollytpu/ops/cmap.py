"""CMAP correction-map torsions (CHARMM-style 5-atom bicubic grid terms).

Parity with /root/reference/src/interactions/cmap_torsion.jl: the energy is a
bicubic-spline interpolation of a periodic (phi, psi) grid, with node
derivatives from periodic cubic splines (cmap_map_derivatives :34-90) and the
standard 16-coefficient bicubic solve (cmap_coefficients :22-32).

TPU-native design: coefficients are precomputed host-side into a
(n_maps, n, n, 4, 4) array; the jitted term evaluates both dihedrals, locates
the cell, gathers one 4x4 coefficient block and evaluates the polynomial —
fully vectorized over terms via the bonded SpecificList machinery
(kind "cmap_torsion"), forces by autodiff like every bonded term.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .bonded import SpecificList, register_term, _dihedral


def _periodic_spline_derivs(y):
    """Derivative of the periodic natural cubic spline through y at the
    nodes. y: (n,) periodic samples on a uniform grid of spacing h=2pi/n;
    returns dy/dx at nodes."""
    n = y.shape[0]
    h = 2.0 * np.pi / n
    # cyclic tridiagonal system: d_{i-1} + 4 d_i + d_{i+1} = 3 (y_{i+1} - y_{i-1}) / h
    A = np.zeros((n, n))
    rhs = np.zeros(n)
    for i in range(n):
        A[i, (i - 1) % n] = 1.0
        A[i, i] = 4.0
        A[i, (i + 1) % n] = 1.0
        rhs[i] = 3.0 * (y[(i + 1) % n] - y[(i - 1) % n]) / h
    return np.linalg.solve(A, rhs)


# Standard bicubic coefficient matrix (Numerical Recipes wt matrix applied
# via the A_inv kron formulation): c = M @ f @ M.T with Hermite basis.
_HERMITE = np.array([
    [1.0, 0.0, 0.0, 0.0],
    [0.0, 0.0, 1.0, 0.0],
    [-3.0, 3.0, -2.0, -1.0],
    [2.0, -2.0, 1.0, 1.0],
])


def cmap_coefficients(grid):
    """Bicubic patch coefficients for a periodic (n, n) energy grid.

    Returns (n, n, 4, 4) c where E(t, u) within cell (i, j) =
    sum_{a,b} c[i, j, a, b] t^a u^b with t, u in [0, 1) the in-cell fractions
    along phi (first index) and psi (second).
    """
    grid = np.asarray(grid, dtype=np.float64)
    n = grid.shape[0]
    h = 2.0 * np.pi / n
    # node derivatives along each axis + cross derivative
    dphi = np.stack([_periodic_spline_derivs(grid[:, j]) for j in range(n)], axis=1)
    dpsi = np.stack([_periodic_spline_derivs(grid[i, :]) for i in range(n)], axis=0)
    dcross = np.stack([_periodic_spline_derivs(dpsi[:, j]) for j in range(n)], axis=1)
    coeffs = np.zeros((n, n, 4, 4))
    for i in range(n):
        i1 = (i + 1) % n
        for j in range(n):
            j1 = (j + 1) % n
            # Hermite data matrix (values, u-derivs; t-derivs, cross) scaled
            # to the unit cell (multiply derivatives by h)
            F = np.array([
                [grid[i, j], grid[i, j1], h * dpsi[i, j], h * dpsi[i, j1]],
                [grid[i1, j], grid[i1, j1], h * dpsi[i1, j], h * dpsi[i1, j1]],
                [h * dphi[i, j], h * dphi[i, j1], h * h * dcross[i, j], h * h * dcross[i, j1]],
                [h * dphi[i1, j], h * dphi[i1, j1], h * h * dcross[i1, j], h * h * dcross[i1, j1]],
            ])
            coeffs[i, j] = _HERMITE @ F @ _HERMITE.T
    return coeffs


def make_cmap_list(i, j, k, l, m, map_index, coeff_table, n_grid):
    """Build a SpecificList for CMAP terms.

    coeff_table: (n_maps, n, n, 4, 4) jnp array; map_index: (K,) int32.
    """
    idx = jnp.stack([jnp.asarray(x, jnp.int32) for x in (i, j, k, l, m)], axis=1)
    kterms = idx.shape[0]
    params = {
        "map_index": jnp.asarray(map_index, jnp.int32),
        "weight": jnp.ones((kterms,), jnp.float32),
    }
    kind = f"cmap_torsion_{n_grid}"

    coeffs = jnp.asarray(coeff_table)

    def term_fn(c, boundary, p):
        phi = _dihedral(c[0], c[1], c[2], c[3], boundary)
        psi = _dihedral(c[1], c[2], c[3], c[4], boundary)
        n = n_grid
        h = 2.0 * jnp.pi / n
        # map angle in (-pi, pi] to grid coordinate in [0, n)
        gphi = (phi + jnp.pi) / h
        gpsi = (psi + jnp.pi) / h
        i0 = jnp.clip(jnp.floor(gphi).astype(jnp.int32), 0, n - 1)
        j0 = jnp.clip(jnp.floor(gpsi).astype(jnp.int32), 0, n - 1)
        t = gphi - i0
        u = gpsi - j0
        cblock = coeffs[p["map_index"], i0, j0]  # (4, 4)
        tv = jnp.stack([jnp.ones_like(t), t, t * t, t * t * t])
        uv = jnp.stack([jnp.ones_like(u), u, u * u, u * u * u])
        return tv @ cblock @ uv

    register_term(kind, term_fn)
    return SpecificList(kind=kind, atom_idx=idx, params=params)


