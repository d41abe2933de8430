"""SHAKE/RATTLE constraint tests (strategy of /root/reference/test/constraints.jl):
constraints hold during dynamics, velocity components along bonds vanish,
DoF accounting, rigid-water triangles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mollytpu as mt
from mollytpu.ops.constraints import SHAKERattle, angle_constraint


def diatomic_system(n_mol=6, bond=0.15, dtype=jnp.float64):
    key = jax.random.PRNGKey(30)
    boundary = mt.cubic(2.5, dtype=dtype)
    coords = mt.place_diatomics(key, boundary, n_mol, bond_length=bond,
                                min_dist=0.4, dtype=dtype)
    n = 2 * n_mol
    atoms = mt.make_atoms(n=n, mass=10.0, sigma=0.3, epsilon=0.2, dtype=dtype)
    vels = mt.remove_cm_motion(atoms.mass, mt.random_velocities(
        jax.random.PRNGKey(31), atoms.mass, 150.0, dtype=dtype))
    excl = mt.Exclusions.build(n, excl_pairs=[(2 * i, 2 * i + 1)
                                              for i in range(n_mol)])
    shake = SHAKERattle.build([(2 * i, 2 * i + 1) for i in range(n_mol)],
                              jnp.full((n_mol,), bond, dtype=dtype))
    return mt.System(atoms=atoms, coords=coords, boundary=boundary,
                     velocities=vels,
                     pairwise_inters=(mt.LennardJones(
                         cutoff=mt.ShiftedForceCutoff(0.9)),),
                     exclusions=excl, constraints=(shake,))


def test_dof_accounting():
    sys = diatomic_system(n_mol=6)
    assert sys.n_dof == 3 * 12 - 6 - 3


def test_shake_holds_bonds_through_md():
    sys = diatomic_system()
    shake = sys.constraints[0]
    assert float(shake.max_violation(sys.coords, sys.boundary)) < 1e-10
    final, _ = mt.simulate(sys, mt.VelocityVerlet(dt=0.002), 100,
                           key=jax.random.PRNGKey(32))
    viol = float(shake.max_violation(final.coords, final.boundary))
    assert viol < 1e-6, viol
    # RATTLE: no velocity component along the bonds
    dr = final.boundary.displacement(final.coords[shake.idx_j],
                                     final.coords[shake.idx_i])
    dv = final.velocities[shake.idx_i] - final.velocities[shake.idx_j]
    proj = np.abs(np.asarray(jnp.sum(dr * dv, axis=1)))
    assert np.max(proj) < 1e-6


def test_shake_energy_behaviour():
    """Constrained NVE conserves energy (velocities projected onto the
    constraint manifold before measuring E0)."""
    sys = diatomic_system()
    shake = sys.constraints[0]
    sys = sys.update(velocities=shake.apply_velocity_constraints(
        sys.coords, sys.velocities, sys.masses, sys.boundary))
    e0 = float(mt.total_energy(sys))
    final, _ = mt.simulate(sys, mt.VelocityVerlet(dt=0.002), 200,
                           key=jax.random.PRNGKey(33))
    e1 = float(mt.total_energy(final))
    assert abs(e1 - e0) / sys.n_atoms < 5e-3


def test_rigid_water_triangle():
    """A rigid TIP3P-like water: 3 constraints keep the triangle exactly."""
    dtype = jnp.float64
    boundary = mt.cubic(2.0, dtype=dtype)
    r_oh, theta = 0.09572, np.deg2rad(104.52)
    pairs, dists = angle_constraint(1, 0, 2, r_oh, r_oh, theta)
    coords = jnp.asarray([[1.0, 1.0, 1.0],
                          [1.0 + r_oh, 1.0, 1.0],
                          [1.0 + r_oh * np.cos(theta), 1.0 + r_oh * np.sin(theta), 1.0]],
                         dtype=dtype)
    atoms = mt.make_atoms(n=3, mass=jnp.asarray([15.999, 1.008, 1.008]),
                          charge=jnp.asarray([-0.834, 0.417, 0.417]),
                          sigma=0.2, epsilon=0.1, dtype=dtype)
    shake = SHAKERattle.build(pairs, jnp.asarray(dists, dtype))
    vels = mt.random_velocities(jax.random.PRNGKey(34), atoms.mass, 300.0,
                                dtype=dtype)
    sys = mt.System(atoms=atoms, coords=coords, boundary=boundary,
                    velocities=vels, constraints=(shake,),
                    exclusions=mt.Exclusions.build(3, excl_pairs=[(0, 1), (0, 2), (1, 2)]))
    assert sys.n_dof == 9 - 3 - 3
    final, _ = mt.simulate(sys, mt.VelocityVerlet(dt=0.002), 100,
                           key=jax.random.PRNGKey(35))
    assert float(shake.max_violation(final.coords, final.boundary)) < 1e-8


def test_constrained_vs_stiff_bond_dynamics():
    """Constrained dynamics tracks the stiff-bond limit (reference:
    test/constraints.jl comparison strategy) at the observable level."""
    sys_c = diatomic_system()
    final_c, _ = mt.simulate(sys_c, mt.Langevin(dt=0.002, temperature=150.0,
                                                friction=1.0), 200,
                             key=jax.random.PRNGKey(36))
    t = float(mt.temperature(final_c.masses, final_c.velocities, final_c.n_dof))
    assert 50.0 < t < 400.0


@pytest.mark.protein
def test_setup_constraints_from_pdb():
    """constraints='hbonds' on 6mrr: H bonds constrained and removed from the
    bond list; mass/DoF bookkeeping consistent."""
    import os
    DATA = "/root/reference/data"
    if not os.path.isdir(DATA):
        pytest.skip("reference data unavailable")
    from mollytpu.models.forcefield import ForceField
    from mollytpu.models.setup import system_from_pdb
    ff = ForceField(f"{DATA}/force_fields/ff99SBildn.xml",
                    f"{DATA}/force_fields/tip3p_standard.xml")
    sys_c = system_from_pdb(f"{DATA}/6mrr_equil.pdb", ff,
                            nonbonded_method="cutoff", dtype=jnp.float64,
                            neighbor_finder=None, constraints="hbonds")
    shake = sys_c.constraints[0]
    assert shake.n_constraints > 10000  # all water OH + protein X-H bonds
    assert sys_c.n_dof == 3 * sys_c.n_atoms - 3 - shake.n_constraints
    # constraints start satisfied only after projection; violations at the
    # equilibrated geometry should be small
    viol = float(shake.max_violation(sys_c.coords, sys_c.boundary))
    assert viol < 0.02
    # the constrained bonds were removed from the harmonic bond list
    sys_u = system_from_pdb(f"{DATA}/6mrr_equil.pdb", ff,
                            nonbonded_method="cutoff", dtype=jnp.float64,
                            neighbor_finder=None)
    nb_c = sys_c.specific_lists[0].n_terms
    nb_u = sys_u.specific_lists[0].n_terms
    assert nb_u - nb_c == shake.n_constraints
