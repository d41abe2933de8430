"""Ewald / PME tests: PME matches the O(N^2 k) Ewald oracle, forces match
-grad(E), Madelung-style sanity, exclusion handling, virial consistency.

Reference strategy: test/protein.jl PME golden comparisons + the
differentiable-PME gradient test (test/gradients.jl:37-60).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mollytpu as mt
from mollytpu.ops.ewald import Ewald, PME, bspline_weights
from mollytpu.units import COULOMB_CONST


def nacl_like(n_side=2, spacing=0.4, dtype=jnp.float64):
    """Alternating +/- charges on a cubic lattice, neutral."""
    box = n_side * spacing
    boundary = mt.cubic(box, dtype=dtype)
    pts = []
    charges = []
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                pts.append([(i + 0.25) * spacing, (j + 0.25) * spacing,
                            (k + 0.25) * spacing])
                charges.append(1.0 if (i + j + k) % 2 == 0 else -1.0)
    coords = jnp.asarray(np.array(pts), dtype=dtype)
    n = len(pts)
    atoms = mt.make_atoms(n=n, mass=10.0, charge=jnp.asarray(charges, dtype=dtype),
                          sigma=0.3, epsilon=0.1, dtype=dtype)
    return coords, boundary, atoms


def random_charges(n=12, box=2.0, seed=0, dtype=jnp.float64, neutral=True):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    boundary = mt.cubic(box, dtype=dtype)
    coords = mt.place_atoms(k1, boundary, n, min_dist=0.25, dtype=dtype)
    q = jax.random.uniform(k2, (n,), dtype=dtype, minval=-1.0, maxval=1.0)
    if neutral:
        q = q - jnp.mean(q)
    atoms = mt.make_atoms(n=n, mass=10.0, charge=q, sigma=0.3, epsilon=0.1,
                          dtype=dtype)
    return coords, boundary, atoms


def test_bspline_weights_partition_of_unity():
    w = jnp.asarray(np.linspace(0.0, 0.999, 13), dtype=jnp.float64)
    theta, dtheta = bspline_weights(w, order=5)
    assert theta.shape == (13, 5)
    assert np.allclose(np.asarray(jnp.sum(theta, axis=-1)), 1.0, atol=1e-12)
    assert np.allclose(np.asarray(jnp.sum(dtheta, axis=-1)), 0.0, atol=1e-12)
    assert np.all(np.asarray(theta) >= -1e-12)


def test_pme_matches_ewald_oracle():
    coords, boundary, atoms = random_charges(n=12, box=2.0)
    ew = Ewald(dist_cutoff=0.9, error_tol=1e-5, kmax=18)
    pme = PME.setup(boundary, dist_cutoff=0.9, error_tol=1e-5, dtype=jnp.float64)
    e_ew = float(ew.energy(coords, boundary, atoms))
    e_pme = float(pme.energy(coords, boundary, atoms))
    assert e_pme == pytest.approx(e_ew, rel=2e-4), (e_ew, e_pme)


def test_pme_total_electrostatics_vs_direct_sum():
    """recip + real-space erfc + self must equal the bare Coulomb lattice sum
    for a well-separated neutral system (alpha-independence of Ewald)."""
    coords, boundary, atoms = random_charges(n=8, box=4.0, seed=3)
    rc = 1.9
    for tol in (1e-5,):
        pme = PME.setup(boundary, dist_cutoff=rc, error_tol=tol, dtype=jnp.float64)
        pme2 = PME.setup(boundary, dist_cutoff=rc * 0.8, error_tol=tol,
                         dtype=jnp.float64)
        real = mt.CoulombEwald(dist_cutoff=rc, error_tol=tol,
                               approximate_erfc=False)
        real2 = mt.CoulombEwald(dist_cutoff=rc * 0.8, error_tol=tol,
                                approximate_erfc=False)
        def total(pme_i, real_i):
            sys = mt.System(atoms=atoms, coords=coords, boundary=boundary,
                            pairwise_inters=(real_i,), general_inters=(pme_i,))
            return float(mt.potential_energy(sys))
        # different alpha/cutoff must give the same total
        assert total(pme, real) == pytest.approx(total(pme2, real2), abs=2e-3)


def test_pme_forces_match_grad():
    coords, boundary, atoms = random_charges(n=10, box=2.0, seed=1)
    pme = PME.setup(boundary, dist_cutoff=0.9, error_tol=1e-5, dtype=jnp.float64)
    f, _ = pme.force_virial(coords, boundary, atoms)
    g = jax.grad(lambda c: pme.energy(c, boundary, atoms))(coords)
    assert np.allclose(np.asarray(f), -np.asarray(g), atol=1e-6)


def test_pme_exclusions():
    coords, boundary, atoms = random_charges(n=10, box=2.0, seed=2)
    excl = [(0, 1), (2, 3)]
    pme_x = PME.setup(boundary, dist_cutoff=0.9, error_tol=1e-5,
                      excl_pairs=excl, dtype=jnp.float64)
    pme_0 = PME.setup(boundary, dist_cutoff=0.9, error_tol=1e-5,
                      dtype=jnp.float64)
    q = np.asarray(atoms.charge)
    c = np.asarray(coords)
    e_x = float(pme_x.energy(coords, boundary, atoms))
    e_0 = float(pme_0.energy(coords, boundary, atoms))
    # the difference must be the -erf terms
    import math
    from scipy.special import erf as scipy_erf  # available via numpy? fallback below
    diff = 0.0
    for (i, j) in excl:
        dr = np.asarray(boundary.displacement(coords[i], coords[j]))
        r = np.linalg.norm(dr)
        diff += -COULOMB_CONST * q[i] * q[j] * float(
            jax.scipy.special.erf(pme_x.alpha * r)) / r
    assert e_x - e_0 == pytest.approx(diff, rel=1e-9)
    # forces remain -grad with exclusions
    f, _ = pme_x.force_virial(coords, boundary, atoms)
    g = jax.grad(lambda cc: pme_x.energy(cc, boundary, atoms))(coords)
    assert np.allclose(np.asarray(f), -np.asarray(g), atol=1e-6)


def test_ewald_exclusion_list_matches_in_pme_correction():
    """The model builders route Ewald exclusion corrections through the fused
    bonded engine (ewald_exclusion_list); energy, forces AND virial must
    match the in-PME sparse correction exactly."""
    from mollytpu.ops.ewald import ewald_exclusion_list
    from mollytpu.ops.bonded import specific_energy, specific_forces

    coords, boundary, atoms = random_charges(n=10, box=2.0, seed=3)
    excl = [(0, 1), (2, 3), (4, 7)]
    pme_x = PME.setup(boundary, dist_cutoff=0.9, error_tol=1e-5,
                      excl_pairs=excl, dtype=jnp.float64)
    pme_0 = PME.setup(boundary, dist_cutoff=0.9, error_tol=1e-5,
                      dtype=jnp.float64)
    sl = ewald_exclusion_list(excl, np.asarray(atoms.charge), pme_x.alpha,
                              COULOMB_CONST, dtype=jnp.float64)
    assert sl.kind == "ewald_exclusion" and sl.n_terms == len(excl)

    e_b = float(specific_energy(sl, coords, boundary))
    e_x = float(pme_x.energy(coords, boundary, atoms))
    e_0 = float(pme_0.energy(coords, boundary, atoms))
    assert e_0 + e_b == pytest.approx(e_x, rel=1e-12, abs=1e-12)

    f_x, v_x = pme_x.force_virial(coords, boundary, atoms, needs_virial=True)
    f_0, v_0 = pme_0.force_virial(coords, boundary, atoms, needs_virial=True)
    f_b, v_b = specific_forces(sl, coords, boundary, needs_virial=True)
    assert np.allclose(np.asarray(f_0) + np.asarray(f_b), np.asarray(f_x),
                       atol=1e-10)
    assert np.allclose(np.asarray(v_0) + np.asarray(v_b), np.asarray(v_x),
                       atol=1e-10)


@pytest.mark.slow
def test_windowed_exclusion_correction_matches_sparse_list():
    """EwaldExclusionCorrection (the builders' windowed dense form) must
    reproduce the sparse ewald_exclusion_list exactly — energy, forces,
    virial — including a far (|i - j| > 31) pair on the remainder path."""
    from mollytpu.ops.ewald import (EwaldExclusionCorrection,
                                    ewald_exclusion_list)
    from mollytpu.ops.bonded import specific_energy, specific_forces

    coords, boundary, atoms = random_charges(n=40, box=2.0, seed=6)
    pairs = [(0, 1), (0, 2), (2, 3), (4, 7), (10, 41 % 40), (5, 36),
             (1, 39)]  # (1, 39): |d| = 38 > 31 -> far remainder path
    pairs = [(min(a, b), max(a, b)) for a, b in pairs if a != b]
    pairs = sorted(set(pairs))
    alpha = 3.12
    corr = EwaldExclusionCorrection.setup(40, pairs, alpha, COULOMB_CONST)
    assert corr.far.shape[0] == 1  # (1, 39) fell outside the window
    sl = ewald_exclusion_list(pairs, np.asarray(atoms.charge), alpha,
                              COULOMB_CONST, dtype=jnp.float64)

    e_w = float(corr.energy(coords, boundary, atoms))
    e_s = float(specific_energy(sl, coords, boundary))
    assert e_w == pytest.approx(e_s, rel=1e-12, abs=1e-12)

    f_w, v_w = corr.force_virial(coords, boundary, atoms, needs_virial=True)
    f_s, v_s = specific_forces(sl, coords, boundary, needs_virial=True)
    assert np.allclose(np.asarray(f_w), np.asarray(f_s), atol=1e-10)
    assert np.allclose(np.asarray(v_w), np.asarray(v_s), atol=1e-10)

    # autodiff consistency: forces are -grad(E)
    g = jax.grad(lambda cc: corr.energy(cc, boundary, atoms))(coords)
    assert np.allclose(np.asarray(f_w), -np.asarray(g), atol=1e-10)


def test_pme_virial_matches_strain_derivative():
    coords, boundary, atoms = random_charges(n=10, box=2.0, seed=4)
    pme = PME.setup(boundary, dist_cutoff=0.9, error_tol=1e-5, dtype=jnp.float64)
    _, vir = pme.force_virial(coords, boundary, atoms, needs_virial=True)
    # W_ab = -dE/deps_ab under x -> (1+eps)x, box -> (1+eps)box (isotropic
    # check on the trace)
    def scaled_e(eps):
        b = boundary.scale(1.0 + eps)
        return pme.energy(coords * (1.0 + eps), b, atoms)

    dE = float(jax.grad(scaled_e)(jnp.zeros((), dtype=jnp.float64)))
    assert float(jnp.trace(vir)) == pytest.approx(-dE, rel=1e-5, abs=1e-6)


def test_charged_system_background_correction():
    coords, boundary, atoms = random_charges(n=6, box=2.0, seed=5, neutral=False)
    ew = Ewald(dist_cutoff=0.9, error_tol=1e-5, kmax=14)
    pme = PME.setup(boundary, dist_cutoff=0.9, error_tol=1e-5, dtype=jnp.float64)
    assert float(pme.energy(coords, boundary, atoms)) == pytest.approx(
        float(ew.energy(coords, boundary, atoms)), rel=2e-4)
