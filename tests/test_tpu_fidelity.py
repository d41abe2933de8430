"""On-device f32 fidelity tier (`MOLLYTPU_TEST_TPU=1 pytest -m tpu`).

The CPU suite exercises the Pallas kernel only in interpreter mode; this
tier gates the Mosaic-COMPILED f32 path on the real chip — the path
bench.py runs, with the hand-tuned rsqrt Newton steps and the
HIGHEST-precision MXU moment accumulation — against the OpenMM goldens and
an NVE drift bound (reference analogues: test/protein.jl f32 gates at
ftol 1e-3, test/energy_conservation.jl GPU runs)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mollytpu as mt

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="needs the real TPU backend"),
]

DATA = "/root/reference/data"
GOLD = f"{DATA}/openmm_6mrr/amber"


def test_compiled_pallas_6mrr_forces_vs_golden():
    """Full 6mrr PME forces through the COMPILED Pallas block-pair kernel at
    f32, vs the OpenMM golden forces. Budget: f32 pair summation (~1e-5
    relative), f32 PME spread/FFT (~1e-4 of the recip part)."""
    from mollytpu.models.forcefield import ForceField
    from mollytpu.models.setup import system_from_pdb
    from mollytpu.ops.blockpairs import BlockPairFinder

    ff = ForceField(f"{DATA}/force_fields/ff99SBildn.xml",
                    f"{DATA}/force_fields/tip3p_standard.xml")
    sys = system_from_pdb(f"{DATA}/6mrr_equil.pdb", ff,
                          nonbonded_method="pme", approximate_pme=False,
                          dtype=jnp.float32, dist_neighbors=1.02)
    finder = BlockPairFinder.setup(sys.boundary, 1.02, sys.n_atoms,
                                   coords=sys.coords, atoms=sys.atoms)
    sys = sys.update(neighbor_finder=finder)
    nbs = mt.find_neighbors(finder, sys.coords, sys.boundary, sys.exclusions)
    assert int(jax.device_get(nbs.overflow)) == 0

    f = np.asarray(jax.device_get(
        jax.jit(lambda s, n: mt.forces_virial(s, n)[0])(sys, nbs)))
    e = float(jax.device_get(
        jax.jit(lambda s, n: mt.potential_energy(s, n))(sys, nbs)))
    f_ref = np.loadtxt(f"{GOLD}/forces_all_pme_exact.txt")
    e_ref = float(open(f"{GOLD}/energy_all_pme_exact.txt").read())

    fdiff = np.max(np.linalg.norm(f - f_ref, axis=1))
    fscale = np.max(np.linalg.norm(f_ref, axis=1))
    ediff = abs(e - e_ref)
    print(f"TPU f32 all_pme: max force diff {fdiff:.4f} kJ/mol/nm "
          f"(max |f| {fscale:.1f}), energy diff {ediff:.4f} kJ/mol")
    # reference f64 gates: ftol 1e-3, etol 0.2 (test/protein.jl:267,274);
    # f32 budget is ~100x looser
    assert fdiff < 1.0, f"compiled-path force error {fdiff}"
    assert ediff < 5.0, f"compiled-path energy error {ediff}"


def test_compiled_nve_drift_on_device():
    """2048-atom LJ fluid, 600 VV steps at f32 on the chip: total-energy
    drift per atom bounded (energy_conservation.jl:10-60 analogue; short
    enough that the whole tier fits the <10 min budget)."""
    from mollytpu.ops.blockpairs import BlockPairFinder

    dtype = jnp.float32
    n = 2048
    boundary = mt.cubic(6.0, dtype=dtype)
    # jittered lattice instead of place_atoms: rejection sampling dispatches
    # thousands of tiny programs, each paying the tunnel's post-device_get
    # dispatch tax (~0.5-2.5 ms) — minutes of pure host-loop overhead
    side = 13  # 13^3 = 2197 >= n
    lin = (np.arange(side) + 0.5) * (6.0 / side)
    grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"),
                    axis=-1).reshape(-1, 3)[:n]
    jit_r = np.random.default_rng(0).uniform(-0.05, 0.05, (n, 3))
    coords = jnp.asarray(grid + jit_r, dtype)
    atoms = mt.make_atoms(n=n, mass=40.0, sigma=0.34, epsilon=1.0,
                          dtype=dtype)
    vels = mt.random_velocities(jax.random.PRNGKey(1), atoms.mass, 100.0,
                                dtype=dtype)
    finder = BlockPairFinder.setup(boundary, 1.0, n, n_steps=10,
                                   coords=coords)
    sys = mt.System(atoms=atoms, coords=coords, boundary=boundary,
                    velocities=vels,
                    pairwise_inters=(mt.LennardJones(
                        cutoff=mt.ShiftedForceCutoff(0.85),
                        use_neighbors=True),),
                    neighbor_finder=finder)
    sim = mt.VelocityVerlet(dt=0.002)

    def total_e(s, nbs):
        return (mt.potential_energy(s, nbs)
                + mt.kinetic_energy(s.masses, s.velocities))

    nbs = mt.find_neighbors(finder, sys.coords, sys.boundary, sys.exclusions)
    e0 = float(jax.device_get(jax.jit(total_e)(sys, nbs)))
    out, _ = mt.simulate(sys, sim, 600, jax.random.PRNGKey(2))
    nbs1 = mt.find_neighbors(finder, out.coords, out.boundary,
                             out.exclusions)
    e1 = float(jax.device_get(jax.jit(total_e)(out, nbs1)))
    drift = abs(e1 - e0) / n
    print(f"TPU f32 NVE drift: {drift:.2e} kJ/mol/atom over 600 steps")
    assert np.isfinite(e1)
    assert drift < 3e-3, f"NVE drift {drift} kJ/mol/atom"
