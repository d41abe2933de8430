"""Barostats, minimizer, Metropolis MC, MTS, REMD (reference strategies:
test/coupling.jl, test/minimization.jl, test/simulation.jl REMD section)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mollytpu as mt
from tests.test_simulation import lj_fluid


def test_minimizer_reduces_energy():
    sys = lj_fluid(n_atoms=24, box=1.6, min_dist=0.25)
    mini = mt.SteepestDescentMinimizer(step_size=0.01, max_steps=60, tol=1.0)
    out, info = mini.minimize(sys)
    assert float(info["energy_final"]) < float(info["energy_initial"])
    # forces reduced substantially
    f0 = np.linalg.norm(np.asarray(mt.forces(sys)), axis=1).max()
    f1 = np.linalg.norm(np.asarray(mt.forces(out)), axis=1).max()
    assert f1 < f0


def test_metropolis_mc():
    sys = lj_fluid(n_atoms=16, box=2.0)
    mc = mt.MetropolisMonteCarlo(temperature=120.0,
                                 trial_move=mt.random_normal_translation(0.02))
    out, info = mc.simulate(sys, 200, key=jax.random.PRNGKey(40))
    rate = float(info["acceptance_rate"])
    assert 0.05 < rate <= 1.0
    assert np.all(np.isfinite(np.asarray(out.coords)))


def test_mts_integrator():
    """MTS with bonded fast / nonbonded slow conserves energy on diatomics."""
    key = jax.random.PRNGKey(41)
    boundary = mt.cubic(2.2, dtype=jnp.float64)
    n_mol = 6
    coords = mt.place_diatomics(key, boundary, n_mol, bond_length=0.2,
                                min_dist=0.4, dtype=jnp.float64)
    n = 2 * n_mol
    atoms = mt.make_atoms(n=n, mass=10.0, sigma=0.3, epsilon=0.2, dtype=jnp.float64)
    bonds = mt.harmonic_bonds(np.arange(0, n, 2), np.arange(1, n, 2),
                              k=jnp.full((n_mol,), 5000.0),
                              r0=jnp.full((n_mol,), 0.2))
    excl = mt.Exclusions.build(n, excl_pairs=[(2*i, 2*i+1) for i in range(n_mol)])
    vels = mt.remove_cm_motion(atoms.mass, mt.random_velocities(
        jax.random.PRNGKey(42), atoms.mass, 100.0, dtype=jnp.float64))
    sys = mt.System(atoms=atoms, coords=coords, boundary=boundary,
                    velocities=vels,
                    pairwise_inters=(mt.LennardJones(
                        cutoff=mt.ShiftedForceCutoff(0.9)),),
                    specific_lists=(bonds,), exclusions=excl)
    e0 = float(mt.total_energy(sys))
    final, _ = mt.simulate(sys, mt.MTSIntegrator(dt=0.002, n_substeps=4), 100,
                           key=jax.random.PRNGKey(43))
    e1 = float(mt.total_energy(final))
    assert abs(e1 - e0) / n < 5e-3
    final2, _ = mt.simulate(sys, mt.MTSLangevinIntegrator(
        dt=0.002, temperature=100.0, friction=1.0, n_substeps=4), 50,
        key=jax.random.PRNGKey(44))
    assert np.all(np.isfinite(np.asarray(final2.coords)))


def test_monte_carlo_barostat_npt():
    """MC barostat adjusts the box; system stays finite (reference:
    test/coupling.jl barostat convergence, shortened)."""
    sys = lj_fluid(n_atoms=32, box=2.2, temp=120.0,
                   cutoff=mt.ShiftedForceCutoff(0.8))
    from mollytpu.units import BAR
    baro = mt.MonteCarloBarostat(pressure=1.0 * BAR, temperature=120.0,
                                 n_steps=10, scale_molecules=False)
    sim = mt.Langevin(dt=0.002, temperature=120.0, friction=1.0,
                      coupling=(baro,))
    v0 = float(sys.boundary.volume())
    final, _ = mt.simulate(sys, sim, 200, key=jax.random.PRNGKey(45))
    v1 = float(final.boundary.volume())
    assert np.isfinite(v1) and v1 > 0
    assert v1 != v0  # some volume moves accepted
    assert np.all(np.isfinite(np.asarray(final.coords)))


def test_crescale_and_berendsen_barostats():
    sys = lj_fluid(n_atoms=32, box=2.2, temp=120.0,
                   cutoff=mt.ShiftedForceCutoff(0.8))
    from mollytpu.units import BAR
    for baro in (mt.CRescaleBarostat(pressure=1.0 * BAR, temperature=120.0,
                                     coupling_const=1.0, n_steps=5),
                 mt.BerendsenBarostat(pressure=1.0 * BAR, coupling_const=1.0,
                                      n_steps=5)):
        sim = mt.Langevin(dt=0.002, temperature=120.0, friction=1.0,
                          coupling=(baro,))
        final, _ = mt.simulate(sys, sim, 100, key=jax.random.PRNGKey(46))
        assert np.isfinite(float(final.boundary.volume()))
        assert np.all(np.isfinite(np.asarray(final.coords)))


def test_remd():
    """T-REMD over 4 replicas: exchanges happen; hotter replicas have higher
    mean PE (reference: test/simulation.jl REMD)."""
    sys = lj_fluid(n_atoms=16, box=1.8, temp=100.0,
                   cutoff=mt.ShiftedForceCutoff(0.8))
    temps = jnp.asarray([100.0, 140.0, 196.0, 274.0], dtype=jnp.float64)
    remd = mt.ReplicaExchangeMD(
        temperatures=temps,
        simulator=mt.Langevin(dt=0.002, temperature=100.0, friction=5.0),
        cycle_length=25)
    ens, info = remd.simulate(sys, 8, key=jax.random.PRNGKey(47), jitter=0.01)
    assert ens.coords.shape == (4, 16, 3)
    assert np.all(np.isfinite(np.asarray(ens.coords)))
    assert 0.0 <= info["exchange_rate"] <= 1.0
    pes = np.asarray(info["pes"])  # (cycles, R)
    assert np.all(np.isfinite(pes))


def test_mc_barostat_anisotropic_modes():
    """Aniso/semi-iso MC barostat relax a LJ fluid without blowing up and
    produce a rectangular box (coupling.jl:768-1054 coupling modes)."""
    import mollytpu as mt

    n = 64
    key = jax.random.PRNGKey(0)
    boundary = mt.rectangular((1.6, 1.6, 1.6))
    coords = mt.place_atoms(key, boundary, n, min_dist=0.25)
    atoms = mt.make_atoms(n=n, mass=40.0, sigma=0.3, epsilon=1.0)
    vels = mt.random_velocities(jax.random.PRNGKey(1), atoms.mass, 100.0)
    for mode in ("anisotropic", "semiisotropic"):
        baro = mt.MonteCarloBarostat(
            pressure=1.0 * 0.0602214076, temperature=100.0, n_steps=5,
            scale_molecules=False, coupling=mode)
        sim = mt.Langevin(dt=0.002, temperature=100.0, friction=2.0,
                          coupling=(baro,))
        sys = mt.System(atoms=atoms, coords=coords, boundary=boundary,
                        velocities=vels,
                        pairwise_inters=(mt.LennardJones(
                            cutoff=mt.ShiftedForceCutoff(0.7)),))
        final, _ = mt.simulate(sys, sim, 60, key=jax.random.PRNGKey(2))
        sides = jax.device_get(final.boundary.side_lengths)
        assert jnp.all(jnp.isfinite(final.coords))
        assert (sides > 0.5).all() and (sides < 5.0).all()
        if mode == "semiisotropic":
            # xy stay equal under semi-isotropic coupling
            assert abs(sides[0] - sides[1]) < 1e-5


def test_mts_per_interaction_fractions():
    """Arbitrary per-interaction evaluation fractions (simulators.jl
    :1616-1940): three-level ladder conserves energy; all-ones reduces to
    velocity Verlet; invalid fraction sets are rejected."""
    key = jax.random.PRNGKey(47)
    boundary = mt.cubic(2.2, dtype=jnp.float64)
    n_mol = 6
    coords = mt.place_diatomics(key, boundary, n_mol, bond_length=0.2,
                                min_dist=0.4, dtype=jnp.float64)
    n = 2 * n_mol
    atoms = mt.make_atoms(n=n, mass=10.0, sigma=0.3, epsilon=0.2,
                          charge=0.0, dtype=jnp.float64)
    bonds = mt.harmonic_bonds(np.arange(0, n, 2), np.arange(1, n, 2),
                              k=jnp.full((n_mol,), 5000.0),
                              r0=jnp.full((n_mol,), 0.2))
    excl = mt.Exclusions.build(n, excl_pairs=[(2*i, 2*i+1)
                                              for i in range(n_mol)])
    vels = mt.remove_cm_motion(atoms.mass, mt.random_velocities(
        jax.random.PRNGKey(48), atoms.mass, 100.0, dtype=jnp.float64))
    lj = mt.LennardJones(cutoff=mt.ShiftedForceCutoff(0.9))
    coul = mt.Coulomb(cutoff=mt.DistanceCutoff(0.9))
    sys = mt.System(atoms=atoms, coords=coords, boundary=boundary,
                    velocities=vels, pairwise_inters=(lj, coul),
                    specific_lists=(bonds,), exclusions=excl)

    # three-level ladder: Coulomb every outer step, LJ twice, bonds 4x
    sim = mt.MTSIntegrator(dt=0.002, pi_fractions=(2, 1), si_fractions=(4,))
    e0 = float(mt.total_energy(sys))
    final, _ = mt.simulate(sys, sim, 100, key=jax.random.PRNGKey(49))
    e1 = float(mt.total_energy(final))
    assert abs(e1 - e0) / n < 5e-3

    # all fractions 1 == velocity Verlet step for step
    sim1 = mt.MTSIntegrator(dt=0.002, pi_fractions=(1, 1),
                            si_fractions=(1,))
    out_mts, _ = mt.simulate(sys, sim1, 25, key=jax.random.PRNGKey(50))
    out_vv, _ = mt.simulate(sys, mt.VelocityVerlet(dt=0.002), 25,
                            key=jax.random.PRNGKey(50))
    assert np.allclose(np.asarray(out_mts.coords),
                       np.asarray(out_vv.coords), atol=1e-10)

    # BAOAB-RESPA with fractions runs finite
    siml = mt.MTSLangevinIntegrator(dt=0.002, temperature=100.0,
                                    friction=1.0, pi_fractions=(1, 1),
                                    si_fractions=(4,))
    outl, _ = mt.simulate(sys, siml, 50, key=jax.random.PRNGKey(51))
    assert np.all(np.isfinite(np.asarray(outl.coords)))

    # validation
    with pytest.raises(ValueError):
        mt.simulate(sys, mt.MTSIntegrator(
            dt=0.002, pi_fractions=(2, 2), si_fractions=(4,)), 1)
    with pytest.raises(ValueError):
        mt.simulate(sys, mt.MTSIntegrator(
            dt=0.002, pi_fractions=(2, 1), si_fractions=(3,)), 1)
    with pytest.raises(ValueError):
        mt.simulate(sys, mt.MTSIntegrator(
            dt=0.002, pi_fractions=(1,), si_fractions=(2,)), 1)


def test_simulate_shortcut_and_progress(capsys):
    """simulate() contract conveniences: the `shortcut` host hook ends the
    run early at a chunk boundary (simulators.jl:23) and show_progress
    prints a step meter; run_loggers="skipstart" drops the step-0 record."""
    sys = lj_fluid(n_atoms=16, box=2.0)
    sim = mt.VelocityVerlet(dt=0.002)
    calls = []

    def stop_after_first(s, nbs, step_n):
        calls.append(step_n)
        return True

    out, logs = mt.simulate(sys, sim, 500, jax.random.PRNGKey(0),
                            loggers={"t": mt.TemperatureLogger(50)},
                            run_loggers="skipstart",
                            shortcut=stop_after_first, show_progress=True)
    assert len(calls) == 1 and calls[0] == 50   # stopped at first boundary
    assert len(np.asarray(logs["t"])) == 1      # step-0 record skipped
    assert np.all(np.isfinite(np.asarray(out.coords)))
    err = capsys.readouterr().err
    assert "step" in err and "50/500" in err
