"""Bonded term checks: energies at known geometries and force = -grad via
finite differences on coordinates (strategy of test/interactions.jl)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mollytpu as mt
from mollytpu.ops.bonded import specific_energy, specific_forces

B = mt.rectangular([100.0, 100.0, 100.0], dtype=jnp.float64)


def fd_forces(slist, coords, h=1e-6):
    # jit: XLA CPU's eager (op-by-op) path evaluates f64 transcendentals with
    # float32-level accuracy, which swamps central differences; the compiled
    # path is bit-accurate.
    e_fn = jax.jit(specific_energy)
    c = np.asarray(coords, dtype=np.float64)
    out = np.zeros_like(c)
    for i in range(c.shape[0]):
        for d in range(3):
            cp, cm = c.copy(), c.copy()
            cp[i, d] += h
            cm[i, d] -= h
            ep = float(e_fn(slist, jnp.asarray(cp), B))
            em = float(e_fn(slist, jnp.asarray(cm), B))
            out[i, d] = -(ep - em) / (2 * h)
    return out


def check_forces(slist, coords, tol=1e-5):
    f, _ = specific_forces(slist, jnp.asarray(coords), B)
    fd = fd_forces(slist, coords)
    assert np.allclose(np.asarray(f), fd, atol=tol), (np.asarray(f), fd)


def test_harmonic_bond():
    sl = mt.harmonic_bonds([0], [1], k=jnp.asarray([100.0]), r0=jnp.asarray([0.2]))
    coords = jnp.asarray([[0.0, 0.0, 0.0], [0.3, 0.0, 0.0]], dtype=jnp.float64)
    e = specific_energy(sl, coords, B)
    assert float(e) == pytest.approx(0.5 * 100 * 0.1 ** 2)
    check_forces(sl, coords)


def test_harmonic_bond_across_pbc():
    b = mt.rectangular([1.0, 1.0, 1.0], dtype=jnp.float64)
    sl = mt.harmonic_bonds([0], [1], k=jnp.asarray([100.0]), r0=jnp.asarray([0.2]))
    coords = jnp.asarray([[0.05, 0.5, 0.5], [0.95, 0.5, 0.5]], dtype=jnp.float64)
    e = specific_energy(sl, coords, b)
    # MIC distance is 0.1
    assert float(e) == pytest.approx(0.5 * 100 * 0.1 ** 2, rel=1e-9)


def test_morse_and_fene():
    sl = mt.morse_bonds([0], [1], D=jnp.asarray([5.0]), a=jnp.asarray([2.0]),
                        r0=jnp.asarray([0.2]))
    coords = np.array([[0.0, 0.0, 0.0], [0.05, 0.25, 0.1]])
    check_forces(sl, coords)
    sl = mt.fene_bonds([0], [1], k=jnp.asarray([100.0]), r0=jnp.asarray([0.5]),
                       sigma=jnp.asarray([0.2]), epsilon=jnp.asarray([0.3]))
    check_forces(sl, coords)


def test_harmonic_angle():
    sl = mt.harmonic_angles([0], [1], [2], k=jnp.asarray([50.0]),
                            theta0=jnp.asarray([np.pi / 2]))
    # 90 degree angle -> zero energy
    coords = jnp.asarray([[0.1, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.1, 0.0]],
                         dtype=jnp.float64)
    assert float(specific_energy(sl, coords, B)) == pytest.approx(0.0, abs=1e-10)
    coords2 = np.array([[0.1, 0.02, 0.01], [0.0, 0.0, 0.0], [0.01, 0.12, 0.03]])
    check_forces(sl, coords2)


def test_cosine_angle_and_urey_bradley():
    coords = np.array([[0.1, 0.02, 0.01], [0.0, 0.0, 0.0], [0.01, 0.12, 0.03]])
    sl = mt.cosine_angles([0], [1], [2], k=jnp.asarray([20.0]),
                          theta0=jnp.asarray([1.9]))
    check_forces(sl, coords)
    sl = mt.urey_bradleys([0], [1], [2], kangle=jnp.asarray([20.0]),
                          theta0=jnp.asarray([1.9]), kbond=jnp.asarray([15.0]),
                          r0=jnp.asarray([0.2]))
    check_forces(sl, coords)


def test_periodic_torsion():
    sl = mt.periodic_torsions([0], [1], [2], [3],
                              periodicity=jnp.asarray([2.0]),
                              phase=jnp.asarray([jnp.pi / 3]),
                              k=jnp.asarray([10.0]))
    coords = np.array([[0.0, 0.1, 0.0], [0.0, 0.0, 0.0], [0.15, 0.0, 0.0],
                       [0.18, 0.05, 0.08]])
    check_forces(sl, coords)


def test_rb_and_harmonic_torsion():
    coords = np.array([[0.0, 0.1, 0.02], [0.0, 0.0, 0.0], [0.15, 0.0, 0.0],
                       [0.18, 0.05, 0.08]])
    sl = mt.rb_torsions([0], [1], [2], [3],
                        coeffs=jnp.asarray([[9.28, 12.16, -13.12, -3.06, 26.24, -31.5]]))
    check_forces(sl, coords)
    sl = mt.harmonic_torsions([0], [1], [2], [3], k=jnp.asarray([10.0]),
                              theta0=jnp.asarray([0.5]))
    check_forces(sl, coords)


def test_torsion_trans_cis():
    # trans (phi = pi) vs cis (phi = 0) for periodicity 1, phase 0:
    # V = k (1 + cos(phi)) -> 2k at cis, 0 at trans
    k = 7.0
    sl = mt.periodic_torsions([0], [1], [2], [3], periodicity=jnp.asarray([1.0]),
                              phase=jnp.asarray([0.0]), k=jnp.asarray([k]))
    trans = jnp.asarray([[0.0, 0.1, 0.0], [0.0, 0.0, 0.0], [0.1, 0.0, 0.0],
                         [0.1, -0.1, 0.0]], dtype=jnp.float64)
    cis = jnp.asarray([[0.0, 0.1, 0.0], [0.0, 0.0, 0.0], [0.1, 0.0, 0.0],
                       [0.1, 0.1, 0.0]], dtype=jnp.float64)
    assert float(specific_energy(sl, trans, B)) == pytest.approx(0.0, abs=1e-9)
    assert float(specific_energy(sl, cis, B)) == pytest.approx(2 * k, rel=1e-9)


def test_position_restraint():
    x0 = jnp.asarray([[0.1, 0.2, 0.3]], dtype=jnp.float64)
    sl = mt.position_restraints([0], k=jnp.asarray([100.0]), x0=x0)
    coords = np.array([[0.15, 0.22, 0.28]])
    e = specific_energy(sl, jnp.asarray(coords), B)
    assert float(e) == pytest.approx(0.5 * 100 * (0.05 ** 2 + 0.02 ** 2 + 0.02 ** 2))
    check_forces(sl, coords)


def test_weight_column_padding():
    sl = mt.harmonic_bonds([0, 0], [1, 1], k=jnp.asarray([100.0, 100.0]),
                           r0=jnp.asarray([0.2, 0.2]),
                           weight=jnp.asarray([1.0, 0.0]))
    coords = jnp.asarray([[0.0, 0.0, 0.0], [0.3, 0.0, 0.0]], dtype=jnp.float64)
    e = specific_energy(sl, coords, B)
    assert float(e) == pytest.approx(0.5 * 100 * 0.1 ** 2)
