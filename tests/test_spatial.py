"""Boundary / minimum-image / velocity tests.

Ports the behavior checks of /root/reference/test/basic.jl (boundaries, MIC
vectors, wrapping, velocity sampling, DoF)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mollytpu as mt
from mollytpu.units import KB


def test_orthorhombic_basic():
    b = mt.cubic(2.0, dtype=jnp.float64)
    assert float(b.volume()) == pytest.approx(8.0)
    assert np.allclose(np.asarray(b.box_matrix()), np.diag([2.0, 2.0, 2.0]))
    c = b.center()
    assert np.allclose(np.asarray(c), [1.0, 1.0, 1.0])


def test_minimum_image_orthorhombic():
    b = mt.rectangular([2.0, 3.0, 4.0], dtype=jnp.float64)
    x1 = jnp.array([0.1, 0.1, 0.1])
    x2 = jnp.array([1.9, 2.9, 3.9])
    dr = b.displacement(x1, x2)
    assert np.allclose(np.asarray(dr), [-0.2, -0.2, -0.2], atol=1e-12)
    # wrap
    w = b.wrap(jnp.array([2.1, -0.1, 4.5]))
    assert np.allclose(np.asarray(w), [0.1, 2.9, 0.5], atol=1e-12)


def test_infinite_boundary():
    b = mt.rectangular([jnp.inf, jnp.inf, jnp.inf])
    x1 = jnp.array([0.0, 0.0, 0.0])
    x2 = jnp.array([100.0, -50.0, 3.0])
    dr = b.displacement(x1, x2)
    assert np.allclose(np.asarray(dr), [100.0, -50.0, 3.0])
    assert np.allclose(np.asarray(b.wrap(x2)), np.asarray(x2))


def test_triclinic():
    basis = jnp.array([[2.2, 0.0, 0.0], [1.0, 1.8, 0.0], [1.0, 0.5, 1.6]],
                      dtype=jnp.float64)
    b = mt.Triclinic(basis)
    assert float(b.volume()) == pytest.approx(2.2 * 1.8 * 1.6)
    x1 = jnp.array([0.1, 0.1, 0.1], dtype=jnp.float64)
    x2 = jnp.array([2.1, 1.7, 1.5], dtype=jnp.float64)
    dr_approx = b.displacement(x1, x2)
    b_exact = mt.Triclinic(basis, approx_images=False)
    dr_exact = b_exact.displacement(x1, x2)
    # exact distance is never longer than approximate
    assert float(jnp.linalg.norm(dr_exact)) <= float(jnp.linalg.norm(dr_approx)) + 1e-12
    # wrap puts coordinates inside the box (fractional in [0,1))
    w = b.wrap(jnp.array([5.0, 5.0, 5.0], dtype=jnp.float64))
    f = b.fractional(w)
    assert np.all(np.asarray(f) >= -1e-9) and np.all(np.asarray(f) < 1.0 + 1e-9)


def test_triclinic_from_angles():
    b = mt.triclinic_from_lengths_angles(
        [2.0, 2.0, 2.0], [np.pi / 2, np.pi / 2, np.pi / 2], dtype=jnp.float64)
    assert np.allclose(np.asarray(b.basis), np.diag([2.0, 2.0, 2.0]), atol=1e-12)


def test_random_velocities_temperature():
    key = jax.random.PRNGKey(1)
    masses = jnp.full((20000,), 10.0, dtype=jnp.float64)
    temp = 300.0
    v = mt.random_velocities(key, masses, temp, dtype=jnp.float64)
    t_est = mt.temperature(masses, v, n_dof=3 * 20000)
    assert abs(float(t_est) - temp) / temp < 0.02


def test_place_atoms_min_dist():
    key = jax.random.PRNGKey(0)
    b = mt.cubic(2.0, dtype=jnp.float64)
    coords = mt.place_atoms(key, b, 50, min_dist=0.3, dtype=jnp.float64)
    assert coords.shape == (50, 3)
    for i in range(50):
        for j in range(i + 1, 50):
            d = float(mt.distance(b, coords[i], coords[j]))
            assert d > 0.3 - 1e-9


def test_remove_cm_motion():
    key = jax.random.PRNGKey(2)
    masses = jnp.asarray(np.random.default_rng(0).uniform(1, 20, 100))
    v = jax.random.normal(key, (100, 3), dtype=jnp.float64)
    v2 = mt.remove_cm_motion(masses, v)
    p = jnp.sum(masses[:, None] * v2, axis=0)
    assert np.allclose(np.asarray(p), 0.0, atol=1e-9)


def test_n_dof():
    assert mt.n_dof(100) == 297
    assert mt.n_dof(100, n_constraints=10) == 287
    assert mt.n_dof(100, n_dims=2) == 198


def test_kinetic_tensor_trace():
    key = jax.random.PRNGKey(3)
    masses = jnp.full((50,), 2.0, dtype=jnp.float64)
    v = jax.random.normal(key, (50, 3), dtype=jnp.float64)
    kt = mt.kinetic_energy_tensor(masses, v)
    assert float(jnp.trace(kt)) == pytest.approx(float(mt.kinetic_energy(masses, v)), rel=1e-12)
