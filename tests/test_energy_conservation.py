"""Energy-conservation matrix across cutoff types (port of
/root/reference/test/energy_conservation.jl:10-95, scaled for the 1-core CPU
tier: 256 atoms / 2000 steps instead of 2000 atoms / 10k). Catches
cutoff-discontinuity energy leaks the smoke tests cannot."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mollytpu as mt

N_ATOMS = 256
BOX = 2.5
RC = 0.9
N_STEPS = 1000
LOG_EVERY = 100


def _build(cutoff, use_neighbors):
    key = jax.random.PRNGKey(7)
    boundary = mt.cubic(BOX, dtype=jnp.float64)
    coords = mt.place_atoms(key, boundary, N_ATOMS, min_dist=0.1,
                            dtype=jnp.float64)
    atoms = mt.make_atoms(n=N_ATOMS, mass=40.0, sigma=0.05, epsilon=0.2,
                          dtype=jnp.float64)
    vels = mt.random_velocities(jax.random.PRNGKey(8), atoms.mass, 1.0,
                                dtype=jnp.float64)
    finder = None
    if use_neighbors:
        finder = mt.DistanceNeighborFinder(dist_cutoff=RC + 0.3, n_steps=10,
                                           max_neighbors=256)
    lj = mt.LennardJones(cutoff=cutoff, use_neighbors=use_neighbors)
    return mt.System(atoms=atoms, coords=coords, boundary=boundary,
                     velocities=vels, pairwise_inters=(lj,),
                     neighbor_finder=finder)


CUTOFFS = [
    ("distance", mt.DistanceCutoff(RC)),
    ("shifted_potential", mt.ShiftedPotentialCutoff(RC)),
    ("shifted_force", mt.ShiftedForceCutoff(RC)),
    ("cubic_spline", mt.CubicSplineCutoff(RC, RC + 0.3)),
]


@pytest.mark.parametrize("name,cutoff", CUTOFFS)
@pytest.mark.parametrize("use_neighbors", [False, True])
@pytest.mark.conservation
def test_lj_nve_drift(name, cutoff, use_neighbors):
    sys = _build(cutoff, use_neighbors)
    sim = mt.VelocityVerlet(dt=0.001, remove_cm=False)
    nbs = None
    if use_neighbors:
        nbs = sys.neighbor_finder.find(sys.coords, sys.boundary,
                                       sys.exclusions)
    e0 = float(mt.total_energy(sys, nbs))
    out, logs = mt.simulate(
        sys, sim, N_STEPS, key=jax.random.PRNGKey(9),
        loggers={"E": mt.TotalEnergyLogger(interval=LOG_EVERY)})
    es = np.asarray(logs["E"], dtype=np.float64)
    assert abs(es[0] - e0) < 1e-7
    max_drift = np.max(np.abs(es - e0))
    # reference bound 5e-4 kJ/mol at 2000 atoms; per-atom equivalent here
    assert max_drift < 5e-4 * N_ATOMS / 2000.0 * 4.0, (name, max_drift)
    final = np.asarray(out.boundary.wrap(out.coords))
    assert np.all(final >= 0.0) and np.all(final <= BOX)
