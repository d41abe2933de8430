"""LINCS constraint solver vs SHAKE/RATTLE (reference lincs.jl parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mollytpu as mt
from mollytpu.ops.lincs import LINCS
from mollytpu.ops.constraints import SHAKERattle


def chain_system(n_heavy=6, key=0):
    """An ethane-like chain: heavy atoms with hydrogens, constraints on H
    bonds (star clusters, LINCS's domain)."""
    rng = np.random.RandomState(key)
    coords, masses, pairs, dists = [], [], [], []
    idx = 0
    for h in range(n_heavy):
        cpos = np.array([0.35 * h, 0.0, 0.0])
        coords.append(cpos)
        masses.append(12.0)
        c_idx = idx
        idx += 1
        for k in range(3):
            d = rng.randn(3)
            d /= np.linalg.norm(d)
            coords.append(cpos + 0.109 * d)
            masses.append(1.008)
            pairs.append((c_idx, idx))
            dists.append(0.109)
            idx += 1
    return (np.array(coords), np.array(masses), pairs, dists)


def test_lincs_positions_match_shake():
    coords, masses, pairs, dists = chain_system()
    n = len(coords)
    boundary = mt.cubic(10.0)
    masses_j = jnp.asarray(masses, jnp.float32)
    prev = jnp.asarray(coords, jnp.float32)
    # perturb like one MD step
    key = jax.random.PRNGKey(1)
    new = prev + 0.004 * jax.random.normal(key, prev.shape)

    lincs = LINCS.build(pairs, dists, masses_j, order=6, n_iters=3)
    shake = SHAKERattle.build(pairs, jnp.asarray(dists, jnp.float32))

    cl, _ = lincs.apply_position_constraints(prev, new, None, masses_j,
                                             boundary, 0.002)
    cs, _ = shake.apply_position_constraints(prev, new, None, masses_j,
                                             boundary, 0.002)
    assert float(lincs.max_violation(cl, boundary)) < 2e-5
    assert float(shake.max_violation(cs, boundary)) < 1e-6
    # both project to (nearly) the same manifold point
    assert float(jnp.max(jnp.abs(cl - cs))) < 2e-4


def test_lincs_velocity_projection():
    coords, masses, pairs, dists = chain_system(n_heavy=3, key=3)
    boundary = mt.cubic(10.0)
    masses_j = jnp.asarray(masses, jnp.float32)
    pos = jnp.asarray(coords, jnp.float32)
    vels = jax.random.normal(jax.random.PRNGKey(2), pos.shape)

    lincs = LINCS.build(pairs, dists, masses_j, order=8, n_iters=2)
    v = lincs.apply_velocity_constraints(pos, vels, masses_j, boundary)
    ii = jnp.asarray([p[0] for p in pairs])
    jj = jnp.asarray([p[1] for p in pairs])
    dr = boundary.displacement(pos[jj], pos[ii])
    proj = jnp.sum(dr * (v[ii] - v[jj]), axis=1)
    assert float(jnp.max(jnp.abs(proj))) < 1e-5


def test_lincs_in_md_conserves_constraints():
    coords, masses, pairs, dists = chain_system(n_heavy=4, key=5)
    n = len(coords)
    boundary = mt.cubic(5.0)
    atoms = mt.make_atoms(n=n, mass=jnp.asarray(masses), sigma=0.2,
                          epsilon=0.1)
    lincs = LINCS.build(pairs, dists, atoms.mass, order=6, n_iters=3)
    vels = mt.random_velocities(jax.random.PRNGKey(0), atoms.mass, 150.0)
    # constrained pairs (and the H-H pairs inside each CH3 group) must not
    # feel LJ, as in the reference's disable_constrained_interactions!
    group = {}
    for (c, h) in pairs:
        group.setdefault(c, []).append(h)
    excl = list(pairs)
    for c, hs in group.items():
        excl += [(a, b) for ai, a in enumerate(hs) for b in hs[ai + 1:]]
    sys = mt.System(atoms=atoms, coords=jnp.asarray(coords, jnp.float32),
                    boundary=boundary, velocities=vels,
                    pairwise_inters=(mt.LennardJones(
                        cutoff=mt.DistanceCutoff(1.0)),),
                    exclusions=mt.Exclusions.build(n, excl_pairs=excl),
                    constraints=(lincs,),
                    n_dof=3 * n - len(pairs) - 3)
    sim = mt.VelocityVerlet(dt=0.0005)
    final, _ = mt.simulate(sys, sim, 200, key=jax.random.PRNGKey(7))
    assert float(lincs.max_violation(final.coords, boundary)) < 2e-5
    assert bool(jnp.all(jnp.isfinite(final.coords)))


@pytest.mark.protein
def test_setup_lincs_partitions_triangles():
    """Water triangles must stay on SHAKE when algorithm='lincs'."""
    import os
    ref = "/root/reference/data"
    pdb = os.path.join(ref, "6mrr_equil.pdb")
    if not os.path.exists(pdb):
        pytest.skip("reference data not available")
    ff = mt.ForceField(os.path.join(ref, "force_fields", "ff99SBildn.xml"),
                       os.path.join(ref, "force_fields", "tip3p_standard.xml"))
    sys = mt.system_from_pdb(pdb, ff, nonbonded_method="cutoff",
                             constraints="hbonds", rigid_water=True,
                             constraint_algorithm="lincs")
    kinds = [type(c).__name__ for c in sys.constraints]
    assert "LINCS" in kinds and "SHAKERattle" in kinds
    total = sum(c.n_constraints for c in sys.constraints)
    assert total > 0
