"""Golden-file gates: 6mrr solvated protein vs OpenMM Reference platform.

Port of the reference's test strategy (/root/reference/test/protein.jl:
264-330): per-term and total energies/forces against the checked-in OpenMM
outputs (ff99SBildn + TIP3P, cutoff reaction field and PME).

Tolerances: the reference's thresholds throughout (1e-5 kJ/mol energy, 1e-7
force), including exact PME — with OpenMM's exact mesh dims and exact erfc
our SPME reproduces the Reference platform to float64 accuracy (measured
2e-11 force). The 100-step trajectory gate adjudicates the integrated
dynamics (CM-removal schedule, constraint order, force timing) at the
reference's 1e-10 nm / 1e-7 nm/ps thresholds (protein.jl:290-330).
"""

import os

import jax
import numpy as np
import pytest
import jax.numpy as jnp

import mollytpu as mt
from mollytpu.models.forcefield import ForceField
from mollytpu.models.setup import system_from_pdb

DATA = "/root/reference/data"
GOLD = f"{DATA}/openmm_6mrr/amber"

pytestmark = [pytest.mark.protein, pytest.mark.skipif(
    not os.path.isdir(GOLD), reason="reference golden data not available")]


@pytest.fixture(scope="module")
def ff():
    return ForceField(f"{DATA}/force_fields/ff99SBildn.xml",
                      f"{DATA}/force_fields/tip3p_standard.xml")


@pytest.fixture(scope="module")
def sys_cut(ff):
    return system_from_pdb(f"{DATA}/6mrr_equil.pdb", ff,
                           nonbonded_method="cutoff", dtype=jnp.float64,
                           dist_neighbors=1.02)


@pytest.fixture(scope="module")
def neighbors(sys_cut):
    nbs = mt.find_neighbors(sys_cut.neighbor_finder, sys_cut.coords,
                            sys_cut.boundary, sys_cut.exclusions)
    assert int(nbs.overflow) == 0
    return nbs


def golden(name):
    e = float(open(f"{GOLD}/energy_{name}.txt").read())
    f = np.loadtxt(f"{GOLD}/forces_{name}.txt")
    return e, f


def check(sys_part, neighbors, name, etol=1e-5, ftol=1e-7):
    e = float(mt.potential_energy(sys_part, neighbors))
    f, _ = mt.forces_virial(sys_part, neighbors)
    e_ref, f_ref = golden(name)
    assert abs(e - e_ref) < etol, f"{name}: {e} vs {e_ref}"
    fdiff = np.max(np.linalg.norm(np.asarray(f) - f_ref, axis=1))
    assert fdiff < ftol, f"{name}: max force diff {fdiff}"


def test_system_assembly(sys_cut):
    assert sys_cut.n_atoms == 15954
    assert abs(float(jnp.sum(sys_cut.atoms.charge))) < 1e-10
    kinds = [s.kind for s in sys_cut.specific_lists]
    assert kinds == ["harmonic_bond", "harmonic_angle", "periodic_torsion",
                     "periodic_torsion"]
    # topology: 4929 molecules, largest = 1170-atom protein (protein.jl:154-157)
    assert sys_cut.n_molecules == 4929
    counts = np.bincount(np.asarray(sys_cut.molecule_ids))
    assert counts[0] == 1170
    # masses (protein.jl:188-191)
    m = np.asarray(sys_cut.masses)
    assert np.allclose(m[:7], [14.01, 1.008, 1.008, 1.008, 12.01, 1.008, 1.008])


def test_bonded_terms_vs_openmm(sys_cut, neighbors):
    empty = sys_cut.update(pairwise_inters=(), general_inters=(),
                           neighbor_finder=None)
    for idx, name in [(0, "bond_only"), (1, "angle_only"), (2, "proptor_only"),
                      (3, "improptor_only")]:
        part = empty.update(specific_lists=(sys_cut.specific_lists[idx],))
        check(part, None, name)


def test_nonbonded_cutoff_vs_openmm(sys_cut, neighbors):
    lj, crf = sys_cut.pairwise_inters
    disp = sys_cut.general_inters
    check(sys_cut.update(pairwise_inters=(lj,), specific_lists=(),
                         general_inters=disp), neighbors, "lj_only")
    check(sys_cut.update(pairwise_inters=(crf,), specific_lists=(),
                         general_inters=()), neighbors, "coul_only")
    check(sys_cut, neighbors, "all_cut")


def test_pme_vs_openmm(ff):
    sys_pme = system_from_pdb(f"{DATA}/6mrr_equil.pdb", ff,
                              nonbonded_method="pme", approximate_pme=False,
                              dtype=jnp.float64, dist_neighbors=1.02)
    nbs = mt.find_neighbors(sys_pme.neighbor_finder, sys_pme.coords,
                            sys_pme.boundary, sys_pme.exclusions)
    # reference tolerances (protein.jl:264-275): exact mesh dims + exact
    # erfc reproduce OpenMM's PME discretization to float64 accuracy
    check(sys_pme, nbs, "all_pme_exact", etol=1e-5, ftol=1e-7)


def test_starting_velocities_energies(ff):
    """Kinetic energy / temperature with the checked-in 300 K velocities
    (protein.jl:283-287)."""
    vels = np.loadtxt(f"{DATA}/openmm_6mrr/velocities_300K.txt")
    sys = system_from_pdb(f"{DATA}/6mrr_equil.pdb", ff,
                          nonbonded_method="cutoff", dtype=jnp.float64,
                          neighbor_finder=None,
                          velocities=jnp.asarray(vels))
    ke = float(mt.kinetic_energy(sys.masses, sys.velocities))
    assert ke == pytest.approx(65521.87288132431, rel=1e-9)
    t = float(mt.temperature(sys.masses, sys.velocities, sys.n_dof))
    assert t == pytest.approx(329.3202932884933, rel=1e-9)


def test_hydrogen_mass_repartitioning(ff):
    sys_hmr = system_from_pdb(f"{DATA}/6mrr_equil.pdb", ff,
                              nonbonded_method="cutoff", dtype=jnp.float64,
                              neighbor_finder=None, hydrogen_mass=2.0)
    m = np.asarray(sys_hmr.masses)
    # protein.jl:185-196 expected HMR masses
    assert np.allclose(m[[0, 1, 2, 3, 4, 5, 6]],
                       [11.034, 2.0, 2.0, 2.0, 10.026, 2.0, 2.0], atol=1e-6)
    assert np.allclose(m[[15951, 15952, 15953]], [14.015324, 2.0, 2.0], atol=1e-5)
    sys_ref = system_from_pdb(f"{DATA}/6mrr_equil.pdb", ff,
                              nonbonded_method="cutoff", dtype=jnp.float64,
                              neighbor_finder=None)
    assert float(jnp.sum(sys_hmr.masses)) == pytest.approx(
        float(jnp.sum(sys_ref.masses)), rel=1e-12)


@pytest.mark.parametrize("model", ["obc2", "gbn2"])
def test_implicit_solvent_vs_openmm(model):
    """GBSA implicit solvent on 6mrr_nowater vs OpenMM (reference:
    openmm_implicit_solvent.py — NoCutoff, kappa = 1/nm; data in
    data/openmm_6mrr/amber/)."""
    ff_vac = ForceField(f"{DATA}/force_fields/ff99SBildn.xml")
    sys = system_from_pdb(f"{DATA}/6mrr_nowater.pdb", ff_vac,
                          nonbonded_method="none", dtype=jnp.float64,
                          neighbor_finder=None, dispersion_correction=False,
                          implicit_solvent=model,
                          implicit_solvent_kwargs={"kappa": 1.0})
    e = float(mt.potential_energy(sys))
    f, _ = mt.forces_virial(sys)
    e_ref, f_ref = golden(model)
    assert abs(e - e_ref) < 5e-3
    assert np.max(np.linalg.norm(np.asarray(f) - f_ref, axis=1)) < 2e-2


def test_a99sb_disp_forces_vs_openmm():
    """a99SB-disp (separate LennardJonesForce + NBFix backbone H-bond pair,
    graph-matched termini, disulfide CYX disambiguation) against OpenMM
    forces (reference: test/protein.jl:717-759, gate mean diff < 0.15)."""
    import dataclasses
    ff2 = ForceField(f"{DATA}/force_fields/a99SB-disp.xml",
                     f"{DATA}/force_fields/a99SB-disp_water.xml")
    for name in ["5AWL_A_noHET", "bpti"]:
        sys = system_from_pdb(f"{DATA}/a99SB-disp_refs/{name}.pdb", ff2,
                              nonbonded_method="pme", approximate_pme=False,
                              dist_cutoff=1.0, dtype=jnp.float64,
                              neighbor_finder=None)
        pin = tuple(dataclasses.replace(p, use_neighbors=False)
                    for p in sys.pairwise_inters)
        sys = sys.update(pairwise_inters=pin)
        f, _ = mt.forces_virial(sys)
        ref = np.array([[float(v.split(" ")[0]) for v in line.strip().split(",")]
                        for line in open(f"{DATA}/a99SB-disp_refs/{name}.dat")])
        diff = np.linalg.norm(np.asarray(f) - ref, axis=1)
        assert diff.mean() < 0.15, (name, diff.mean())


def test_gromacs_gro_top_peptide():
    """5XER peptide from Gromacs files (reference: test/protein.jl:1-60):
    atom/molecule/box bookkeeping and a short stable simulation."""
    from mollytpu.models.gromacs import system_from_gromacs
    sys = system_from_gromacs(f"{DATA}/5XER/gmx_coords.gro",
                              f"{DATA}/5XER/gmx_top_ff.top",
                              nonbonded_method="cutoff", dtype=jnp.float64)
    assert sys.n_atoms == 5191
    assert sys.n_molecules == 1678
    assert int(np.bincount(np.asarray(sys.molecule_ids))[0]) == 164
    assert np.allclose(np.asarray(sys.boundary.side_lengths), 3.7146)
    assert len(sys.pairwise_inters) == 2
    nbs = mt.find_neighbors(sys.neighbor_finder, sys.coords, sys.boundary,
                            sys.exclusions)
    assert int(nbs.overflow) == 0
    # density (protein.jl:42: ~1016 kg/m^3 = 611.7 u/nm^3)
    dens = float(jnp.sum(sys.masses) / sys.boundary.volume())
    assert 580 < dens < 640
    sim = mt.VelocityVerlet(dt=0.0002,
                            coupling=(mt.AndersenThermostat(298.0, 10.0),))
    vels = mt.random_velocities(jax.random.PRNGKey(70), sys.masses, 298.0,
                                dtype=jnp.float64) * 0.01
    sys = sys.update(velocities=vels)
    final, _ = mt.simulate(sys, sim, 20, key=jax.random.PRNGKey(71))
    assert np.all(np.isfinite(np.asarray(final.coords)))


def test_tip4p_virtual_site_golden():
    """TIP4P-FB water box vs OpenMM golden data: virtual-site placement,
    force redistribution, exclusions through the massless site
    (reference: test/simulation.jl:1306-1360, data/openmm_tip4pfb)."""
    import numpy as np

    ff = mt.ForceField(DATA + "/force_fields/tip4pfb.xml")
    sys = mt.system_from_pdb(DATA + "/tip4pew.pdb", ff,
                             nonbonded_method="cutoff", center_coords=False,
                             dtype=jnp.float64)
    from mollytpu.ops.neighbors import find_neighbors
    nbs = find_neighbors(sys.neighbor_finder, sys.coords, sys.boundary,
                         sys.exclusions, 0)
    e = float(mt.potential_energy(sys, nbs))
    gold = float(np.loadtxt(DATA + "/openmm_tip4pfb/energy_nocons.txt"))
    assert abs(e - gold) < 2e-3

    f = np.asarray(mt.forces(sys, nbs))
    fg = np.loadtxt(DATA + "/openmm_tip4pfb/forces_nocons.txt")
    fg[3::4] = 0.0  # distributed site forces are zero on the site itself
    assert np.max(np.linalg.norm(f - fg, axis=1)) < 1e-4

    # constrained variant: hbond constraints remove the OH bond terms
    sys_c = mt.system_from_pdb(DATA + "/tip4pew.pdb", ff,
                               nonbonded_method="cutoff", center_coords=False,
                               constraints="hbonds", dtype=jnp.float64)
    nbs_c = find_neighbors(sys_c.neighbor_finder, sys_c.coords,
                           sys_c.boundary, sys_c.exclusions, 0)
    e_c = float(mt.potential_energy(sys_c, nbs_c))
    gold_c = float(np.loadtxt(DATA + "/openmm_tip4pfb/energy_cons.txt"))
    assert abs(e_c - gold_c) < 2e-3
    f_c = np.asarray(mt.forces(sys_c, nbs_c))
    fgc = np.loadtxt(DATA + "/openmm_tip4pfb/forces_cons.txt")
    fgc[3::4] = 0.0
    assert np.max(np.linalg.norm(f_c - fgc, axis=1)) < 1e-4


def test_mts_trajectory_10steps_vs_openmm():
    """MTS rRESPA 10-step trajectory vs OpenMM MTSIntegrator goldens
    (reference: test/simulation.jl:1306-1369, data/openmm_tip4pfb;
    generator test/openmm_mts.py — groups nonbonded x1 / angles x4 /
    bonds x8 at dt = 1 fs, virtual-site TIP4P-FB water). Adjudicates the
    multi-level substep schedule, constraint placement inside the inner
    loop, and virtual-site handling under MTS — single-point force gates
    cannot."""
    ff = mt.ForceField(DATA + "/force_fields/tip4pfb.xml")
    for cons_label, constraints in (("nocons", "none"),
                                    ("cons", "hbonds")):
        sys = mt.system_from_pdb(DATA + "/tip4pew.pdb", ff,
                                 nonbonded_method="cutoff",
                                 center_coords=False,
                                 constraints=constraints,
                                 dtype=jnp.float64)
        # OpenMM groups: bonds x8, angles x4 (with hbonds constrained the
        # bond list is empty and its fraction is irrelevant)
        si_fr = tuple(8 if s.kind == "harmonic_bond" else 4
                      for s in sys.specific_lists)
        sim = mt.MTSIntegrator(dt=0.001, pi_fractions=(1, 1),
                               si_fractions=si_fr,
                               gi_fractions=(1,) * len(sys.general_inters),
                               remove_cm=False)
        final, _ = mt.simulate(sys, sim, 10, key=jax.random.PRNGKey(0))
        gc = np.loadtxt(
            DATA + f"/openmm_tip4pfb/coordinates_10steps_{cons_label}.txt")
        gv = np.loadtxt(
            DATA + f"/openmm_tip4pfb/velocities_10steps_{cons_label}.txt")
        # MIC difference: atoms sitting exactly on the box face wrap to 0
        # on one side and L on the other — a raw difference reads as L
        cdiff = np.linalg.norm(np.asarray(sys.boundary.displacement(
            final.coords, jnp.asarray(gc))), axis=1)
        vdiff = np.linalg.norm(np.asarray(final.velocities) - gv, axis=1)
        assert cdiff.max() < 1e-3, (cons_label, cdiff.max())
        assert vdiff.max() < 0.1, (cons_label, vdiff.max())


def test_openmm_refs_neighbor_path():
    """openmm_refs protein gate (reference: test/basic.jl:400-462): exact
    PME + the production cell-list neighbor path, mean force diff < 0.15.
    sgpb_omtky3 exercises disulfide detection; this gate also guards the
    trial-sized neighbor capacities (mean-density sizing overflowed on
    protein-in-vacuum boxes and silently truncated forces)."""
    from mollytpu.ops.neighbors import find_neighbors

    ff = mt.ForceField(DATA + "/force_fields/ff99SBildn.xml",
                       DATA + "/force_fields/tip3p_standard.xml")
    for name in ["bpti", "sgpb_omtky3"]:
        sys = mt.system_from_pdb(DATA + f"/openmm_refs/{name}.pdb", ff,
                                 nonbonded_method="pme",
                                 approximate_pme=False, dtype=jnp.float64)
        nbs = find_neighbors(sys.neighbor_finder, sys.coords, sys.boundary,
                             sys.exclusions, 0)
        assert int(nbs.overflow) == 0
        f = np.asarray(mt.forces(sys, nbs))
        gold = np.asarray(
            [[float(v.split(" ")[0]) for v in line.strip().split(",")]
             for line in open(DATA + f"/openmm_refs/{name}.dat")])
        d = np.linalg.norm(f - gold, axis=1)
        assert d.mean() < 0.15, (name, d.mean())


def test_trajectory_100steps_vs_openmm(ff):
    """The reference's strongest end-to-end fidelity gate (protein.jl:
    290-330): 100 velocity-Verlet steps (dt = 0.5 fs) of solvated 6mrr with
    exact PME from the checked-in 300 K velocities must reproduce OpenMM's
    final coordinates to 1e-10 nm and velocities to 1e-7 nm/ps. This
    adjudicates the integrated dynamics — CM-removal schedule, force timing,
    wrap placement — which single-point gates cannot."""
    from mollytpu.sim.simulate import simulate
    from mollytpu.spatial import kinetic_energy, temperature

    vels = jnp.asarray(np.loadtxt(f"{DATA}/openmm_6mrr/velocities_300K.txt"))
    sys = system_from_pdb(f"{DATA}/6mrr_equil.pdb", ff,
                          nonbonded_method="pme", approximate_pme=False,
                          dtype=jnp.float64, velocities=vels)
    # starting-state checks (protein.jl:283-287)
    ke = float(kinetic_energy(sys.masses, sys.velocities))
    assert ke == pytest.approx(65521.87288132431, rel=1e-9)
    t = float(temperature(sys.masses, sys.velocities, sys.n_dof))
    assert t == pytest.approx(329.3202932884933, rel=1e-9)

    sim = mt.VelocityVerlet(dt=0.0005)
    sys2, _ = simulate(sys, sim, 100)

    gold_c = np.loadtxt(f"{DATA}/openmm_6mrr/amber/coordinates_100steps.txt")
    gold_v = np.loadtxt(f"{DATA}/openmm_6mrr/amber/velocities_100steps.txt")
    wrap_gold = np.asarray(sys.boundary.wrap(jnp.asarray(gold_c)))
    coords = np.asarray(sys2.coords)
    cdiff = np.linalg.norm(coords - wrap_gold, axis=1)
    vdiff = np.linalg.norm(np.asarray(sys2.velocities) - gold_v, axis=1)
    assert cdiff.max() < 1e-10, cdiff.max()
    assert vdiff.max() < 1e-7, vdiff.max()
