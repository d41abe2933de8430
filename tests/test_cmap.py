"""CMAP torsion tests: spline interpolates grid nodes exactly, is periodic
and smooth, and forces match finite differences (strategy of
test/interactions.jl for CMAPTorsion)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mollytpu as mt
from mollytpu.ops.cmap import cmap_coefficients, make_cmap_list
from mollytpu.ops.bonded import specific_energy, specific_forces

B = mt.rectangular([100.0, 100.0, 100.0], dtype=jnp.float64)


def chain_coords(phi_target=None):
    """5-atom chain with adjustable first dihedral."""
    return np.array([
        [0.00, 0.10, 0.02],
        [0.00, 0.00, 0.00],
        [0.15, 0.00, 0.00],
        [0.20, 0.10, 0.05],
        [0.32, 0.12, 0.02],
    ])


def test_coefficients_interpolate_nodes():
    rng = np.random.default_rng(0)
    n = 12
    grid = rng.normal(size=(n, n))
    c = cmap_coefficients(grid)
    # value at cell corner (t=u=0) equals the node value
    for i in range(n):
        for j in range(n):
            assert c[i, j, 0, 0] == pytest.approx(grid[i, j], abs=1e-10)
    # continuity across cells: value at t=1 of cell i equals cell i+1 at t=0
    tv = np.array([1.0, 1.0, 1.0, 1.0])
    uv = np.array([1.0, 0.0, 0.0, 0.0])
    for i in range(n):
        v_end = tv @ c[i, 0] @ uv
        assert v_end == pytest.approx(grid[(i + 1) % n, 0], abs=1e-9)


def test_cmap_energy_and_forces():
    n = 24
    rng = np.random.default_rng(1)
    # smooth periodic surface
    ph = np.linspace(-np.pi, np.pi, n, endpoint=False)
    PH, PS = np.meshgrid(ph, ph, indexing="ij")
    grid = 3.0 * np.cos(PH) * np.sin(PS) + 1.5 * np.cos(2 * PS)
    coeffs = cmap_coefficients(grid)[None]  # one map
    sl = make_cmap_list([0], [1], [2], [3], [4], [0],
                        jnp.asarray(coeffs), n)
    coords = jnp.asarray(chain_coords(), dtype=jnp.float64)
    e = float(specific_energy(sl, coords, B))
    # compare with the analytic surface at the actual dihedrals
    from mollytpu.ops.bonded import _dihedral
    phi = float(_dihedral(coords[0], coords[1], coords[2], coords[3], B))
    psi = float(_dihedral(coords[1], coords[2], coords[3], coords[4], B))
    e_exact = 3.0 * np.cos(phi) * np.sin(psi) + 1.5 * np.cos(2 * psi)
    assert e == pytest.approx(e_exact, abs=0.02)  # spline vs analytic
    # force = -grad by finite differences
    f, _ = specific_forces(sl, coords, B)
    h = 1e-6
    c0 = np.asarray(coords)
    for a in [0, 2, 4]:
        for d in range(3):
            cp, cm = c0.copy(), c0.copy()
            cp[a, d] += h
            cm[a, d] -= h
            fd = -(float(specific_energy(sl, jnp.asarray(cp), B))
                   - float(specific_energy(sl, jnp.asarray(cm), B))) / (2 * h)
            assert float(f[a, d]) == pytest.approx(fd, abs=1e-4)
