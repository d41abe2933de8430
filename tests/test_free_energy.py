"""Free energy & enhanced sampling tests (strategy of reference test/bias.jl,
test/tss.jl, and the MBAR unit checks): MBAR on an analytic harmonic-oscillator
ladder, bias potentials steering CVs, lambda hamiltonians, AWH/TSS drivers,
statistical inefficiency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mollytpu as mt
from tests.test_simulation import lj_fluid


def test_mbar_harmonic_oscillators():
    """MBAR recovers the analytic free-energy differences of 1D harmonic
    oscillators with different spring constants: f_k = 0.5 ln(k_k)."""
    rng = np.random.default_rng(0)
    kT = 1.0
    ks = np.array([1.0, 2.0, 4.0])
    n_samp = 4000
    # samples x ~ N(0, kT/k) from each state
    xs = [rng.normal(0.0, np.sqrt(kT / k), n_samp) for k in ks]
    # u_kn: reduced energy of every sample in every state
    all_x = np.concatenate(xs)
    u_kn = 0.5 * ks[:, None] * all_x[None, :] ** 2 / kT
    inp = mt.MBARInput(u_kn=jnp.asarray(u_kn),
                       n_k=jnp.asarray([n_samp] * 3))
    f = np.asarray(mt.iterate_mbar(inp))
    f_exact = 0.5 * np.log(ks / ks[0])  # relative free energies
    assert np.allclose(f - f[0], f_exact, atol=0.05), (f, f_exact)
    w = np.asarray(mt.mbar_weights(inp))
    assert np.allclose(w.sum(axis=1), 1.0, atol=1e-6)


def test_mbar_pmf():
    """PMF of a single harmonic state reproduces the parabola."""
    rng = np.random.default_rng(1)
    kT = 1.0
    n = 20000
    x = rng.normal(0.0, 1.0, n)
    u_kn = (0.5 * x ** 2 / kT)[None, :]
    inp = mt.MBARInput(u_kn=jnp.asarray(u_kn), n_k=jnp.asarray([n]))
    from mollytpu.units import KB
    temp = 1.0 / KB  # kT = 1 in internal units
    edges = np.linspace(-4.0, 4.0, 41)
    pmf = mt.mbar_pmf(inp, jnp.asarray(x), edges, temp,
                      target_state_u=jnp.asarray(u_kn[0]))
    c = np.asarray(pmf.centers)
    v = np.asarray(pmf.values)
    v_exact = 0.5 * c ** 2 - (0.5 * c ** 2).min()
    core = np.abs(c) < 2.0  # edge bins collect the clipped tails
    assert np.max(np.abs(v[core] - v_exact[core])) < 0.15


def test_pmf_uncertainty_matches_multinomial():
    """Analytic gate for the asymptotic-covariance estimator: with a single
    sampled state reweighted to itself, MBAR weights are uniform, p_i is the
    bin count fraction, and the augmented-W variance must reduce to the
    multinomial var(p_i) = p_i(1-p_i)/N (reference estimator: mbar.jl
    pmf_with_uncertainty)."""
    rng = np.random.default_rng(7)
    n = 5000
    x = rng.normal(0.0, 1.0, n)
    u_kn = (0.5 * x ** 2)[None, :].astype(np.float64)
    inp = mt.MBARInput(u_kn=jnp.asarray(u_kn), n_k=jnp.asarray([n]))
    from mollytpu.units import KB
    temp = 1.0 / KB
    edges = np.linspace(-2.5, 2.5, 11)
    pmf = mt.pmf_with_uncertainty(inp, jnp.asarray(x), edges, temp,
                                  target_state_u=jnp.asarray(u_kn[0]))
    which = np.clip(np.searchsorted(edges, x) - 1, 0, 9)
    counts = np.bincount(which, minlength=10)
    p = counts / n
    sigma_f_exact = np.sqrt(p * (1.0 - p) / n) / p     # delta method on -log p
    unc = np.asarray(pmf.uncertainties)
    assert np.isfinite(unc).all(), unc
    assert np.allclose(unc, sigma_f_exact, rtol=0.02), (unc, sigma_f_exact)


def test_pmf_uncertainty_shrinks_sqrt_n():
    """Error bars from the covariance estimator shrink as 1/sqrt(N) and the
    PMF converges to the analytic parabola (two harmonic umbrella windows)."""
    rng = np.random.default_rng(8)
    ks = np.array([1.0, 4.0])
    centers = np.array([0.0, 1.0])
    from mollytpu.units import KB
    temp = 1.0 / KB
    edges = np.linspace(-1.0, 2.0, 13)

    def run(n_samp):
        xs = [rng.normal(c, np.sqrt(1.0 / k), n_samp)
              for k, c in zip(ks, centers)]
        x = np.concatenate(xs)
        u_kn = 0.5 * ks[:, None] * (x[None, :] - centers[:, None]) ** 2
        # unbiased target: flat potential, so the PMF along x is the sum of
        # the two umbrellas' unbiased densities -> uniform target state u=0
        inp = mt.MBARInput(u_kn=jnp.asarray(u_kn),
                           n_k=jnp.asarray([n_samp] * 2))
        return mt.pmf_with_uncertainty(inp, jnp.asarray(x), edges, temp)

    small = run(500)
    big = run(8000)   # 16x samples -> 4x smaller error bars
    u_s = np.asarray(small.uncertainties)
    u_b = np.asarray(big.uncertainties)
    core = np.isfinite(u_s) & np.isfinite(u_b)
    assert core.sum() >= 8
    ratio = np.median(u_s[core] / u_b[core])
    assert 2.0 < ratio < 8.0, ratio     # ~4 expected
    assert np.nanmax(u_b[core]) < 0.2   # converged bars are small


def test_statistical_inefficiency():
    rng = np.random.default_rng(2)
    white = rng.normal(size=4000)
    g_white = mt.statistical_inefficiency(white)
    assert g_white < 1.5
    # AR(1) with correlation time tau: g ~ (1+rho)/(1-rho)
    rho = 0.9
    ar = np.zeros(20000)
    for i in range(1, len(ar)):
        ar[i] = rho * ar[i - 1] + rng.normal()
    g_ar = mt.statistical_inefficiency(ar)
    assert 10.0 < g_ar < 30.0  # exact: 19


def test_cv_values_and_gradients():
    key = jax.random.PRNGKey(60)
    boundary = mt.cubic(3.0, dtype=jnp.float64)
    coords = mt.place_atoms(key, boundary, 10, min_dist=0.3, dtype=jnp.float64)
    masses = jnp.full((5,), 2.0)
    cvs = [
        mt.CalcSingleDist(0, 5),
        mt.CalcDist(group1=jnp.arange(3), group2=jnp.arange(5, 8)),
        mt.CalcMinDist(group1=jnp.arange(3), group2=jnp.arange(5, 8)),
        mt.CalcCMDist(group1=jnp.arange(5), group2=jnp.arange(5, 10),
                      masses1=masses, masses2=masses),
        mt.CalcRg(group=jnp.arange(10), masses=jnp.full((10,), 1.5)),
        mt.CalcRMSD(reference=coords[:6] + 0.02, group=jnp.arange(6)),
        mt.CalcTorsion(0, 1, 2, 3),
    ]
    for cv in cvs:
        v = float(cv.value(coords, boundary))
        assert np.isfinite(v), type(cv).__name__
        g = mt.cv_gradient(cv, coords, boundary)
        assert np.all(np.isfinite(np.asarray(g))), type(cv).__name__
        # finite-difference check on one coordinate
        h = 1e-6
        cp = coords.at[1, 0].add(h)
        cm = coords.at[1, 0].add(-h)
        fd = (float(cv.value(cp, boundary)) - float(cv.value(cm, boundary))) / (2 * h)
        assert float(g[1, 0]) == pytest.approx(fd, abs=1e-4), type(cv).__name__


def test_bias_potential_steers_cv():
    """An umbrella on the 0-1 distance pulls it toward the target."""
    sys = lj_fluid(n_atoms=12, box=2.4, temp=50.0)
    cv = mt.CalcSingleDist(0, 1)
    d0 = float(cv.value(sys.coords, sys.boundary))
    target = 0.45
    bias = mt.BiasPotential(bias=mt.SquareBias(k=5000.0, cv0=target), cv=cv)
    sys = sys.update(general_inters=(bias,))
    final, _ = mt.simulate(sys, mt.Langevin(dt=0.001, temperature=50.0,
                                            friction=5.0), 300,
                           key=jax.random.PRNGKey(61))
    d1 = float(cv.value(final.coords, final.boundary))
    assert abs(d1 - target) < abs(d0 - target) or abs(d1 - target) < 0.05


def test_flat_bottom_and_periodic_biases():
    fb = mt.FlatBottomSquareBias(k=100.0, cv0=1.0, width=0.2)
    assert float(fb(1.05)) == 0.0
    assert float(fb(1.3)) == pytest.approx(0.5 * 100 * 0.2 ** 2)
    pb = mt.PeriodicFlatBottomBias(k=100.0, cv0=3.1, width=0.2)
    assert float(pb(-3.1)) == pytest.approx(float(pb(3.1 + 2 * (np.pi - 3.1))), abs=1e-6)


def test_lambda_hamiltonian_and_partition():
    """Soft-core energy interpolates monotonically-ish in lambda; the
    partition's cross energies match direct evaluation."""
    key = jax.random.PRNGKey(62)
    boundary = mt.cubic(2.0, dtype=jnp.float64)
    coords = mt.place_atoms(key, boundary, 10, min_dist=0.3, dtype=jnp.float64)
    atoms = mt.make_atoms(n=10, mass=10.0, sigma=0.3, epsilon=0.2, lam=1.0,
                          alch_role=jnp.asarray([2] * 3 + [0] * 7), dtype=jnp.float64)
    sc = mt.LennardJonesSoftCoreBeutler(alpha=0.5)
    sys = mt.System(atoms=atoms, coords=coords, boundary=boundary,
                    pairwise_inters=(sc, mt.LennardJones(use_neighbors=False)))
    lh = mt.LambdaHamiltonian()
    lams = jnp.asarray([0.0, 0.25, 0.5, 0.75, 1.0])
    es = np.asarray(lh.energies(sys, lams))
    assert np.all(np.isfinite(es))
    part = mt.AlchemicalPartition()
    es2 = np.asarray(part.cross_energies(sys, lams))
    direct = np.array([float(lh.energy(sys, float(l))) for l in lams])
    assert np.allclose(es2, direct, atol=1e-9)


def test_grid_awh_runs():
    sys = lj_fluid(n_atoms=10, box=2.2, temp=80.0)
    cv = mt.CalcSingleDist(0, 1)
    awh = mt.GridAWH(cv=cv,
                     simulator=mt.Langevin(dt=0.002, temperature=80.0,
                                           friction=5.0),
                     temperature=80.0, lo=0.2, hi=1.2, n_bins=10,
                     n_steps_per_update=20)
    final, state = awh.simulate(sys, 10, key=jax.random.PRNGKey(63))
    assert state.n_updates == 10
    centers, pmf = awh.pmf(state)
    assert np.all(np.isfinite(pmf))
    assert np.all(np.isfinite(np.asarray(final.coords)))


def _dimer_system(k_bond=500.0, r0=0.5, temp=120.0, dtype=jnp.float64):
    """Two atoms joined by a harmonic bond in a periodic box; the distance
    CV has an analytically integrable Boltzmann distribution."""
    from mollytpu.ops.bonded import harmonic_bonds
    boundary = mt.cubic(4.0, dtype=dtype)
    coords = jnp.asarray([[1.8, 2.0, 2.0], [2.3, 2.0, 2.0]], dtype=dtype)
    atoms = mt.make_atoms(n=2, mass=10.0, sigma=0.3, epsilon=0.0, dtype=dtype)
    vels = mt.random_velocities(jax.random.PRNGKey(9), atoms.mass, temp,
                                dtype=dtype)
    bond = harmonic_bonds([0], [1], k=jnp.asarray([k_bond], dtype),
                          r0=jnp.asarray([r0], dtype))
    return mt.System(atoms=atoms, coords=coords, boundary=boundary,
                     velocities=vels, specific_lists=(bond,))


def _window_free_energies_quadrature(k_bond, r0, temp, biases):
    """F_i = -ln Z_i in kBT units by radial quadrature:
    Z_i = int exp(-beta (U0(r) + b_i(r))) 4 pi r^2 dr."""
    from mollytpu.units import KB
    beta = 1.0 / (KB * temp)
    r = np.linspace(1e-4, 1.5, 40000)
    u0 = 0.5 * k_bond * (r - r0) ** 2
    fs = []
    for b in biases:
        ub = np.asarray([float(b.bias(x)) for x in r])
        z = np.trapezoid(np.exp(-beta * (u0 + ub)) * 4 * np.pi * r ** 2, r)
        fs.append(-np.log(z))
    fs = np.asarray(fs)
    return fs - fs[0]


@pytest.mark.slow
def test_awh_reference_class_free_energy_recovery():
    """Windowed AWH over umbrella states recovers the analytic per-window
    free energies of a harmonic dimer (the reference's test/tss.jl-style
    recovery assertion, applied to AWH.jl's estimator)."""
    temp = 120.0
    k_bond, r0 = 500.0, 0.5
    cv = mt.CalcSingleDist(0, 1)
    centers = [0.40, 0.50, 0.60]
    biases = tuple(mt.BiasPotential(bias=mt.SquareBias(k=400.0, cv0=c),
                                    cv=cv) for c in centers)
    space = mt.ExtendedStateSpace.umbrella_windows(biases, temperature=temp)
    state = mt.AWHState.create(space, first_state=1, n_bias=20.0)
    awh = mt.AWHSimulation(
        state=state,
        simulator=mt.Langevin(dt=0.002, temperature=temp, friction=5.0),
        n_md_steps=25, update_freq=1, well_tempered_factor=np.inf,
        significant_weight=0.1)
    sys = _dimer_system(k_bond, r0, temp)
    awh.simulate(sys, 25 * 400, seed=3)

    f_ref = _window_free_energies_quadrature(
        k_bond, r0, temp, biases)
    f_est = awh.free_energies()
    # statistical agreement: ~400 samples -> a few tenths of kBT
    assert np.all(np.isfinite(f_est))
    assert np.max(np.abs(f_est - f_ref)) < 0.8, (f_est, f_ref)
    # stage machinery exercised
    st = awh.state
    assert st.n_samples_total == 400
    assert st.ref_size > 20.0 or not st.covering_stage


@pytest.mark.slow
def test_awh_pmf_deconvolution_recovers_unbiased_pmf():
    """The sampled PMF deconvolution backend (Lindahl eq. 9) removes the
    umbrella biases: the recovered PMF matches -ln(p0(r)) of the unbiased
    harmonic dimer."""
    from mollytpu.units import KB
    temp = 120.0
    k_bond, r0 = 500.0, 0.5
    cv = mt.CalcSingleDist(0, 1)
    centers = [0.40, 0.50, 0.60]
    biases = tuple(mt.BiasPotential(bias=mt.SquareBias(k=400.0, cv0=c),
                                    cv=cv) for c in centers)
    space = mt.ExtendedStateSpace.umbrella_windows(biases, temperature=temp)
    state = mt.AWHState.create(space, n_bias=20.0)
    backend = mt.AWHPMFBackend(state, grid=(0.35, 0.65, 12), cv=cv)
    awh = mt.AWHSimulation(
        state=state,
        simulator=mt.Langevin(dt=0.002, temperature=temp, friction=5.0),
        n_md_steps=25, update_freq=1, well_tempered_factor=np.inf,
        pmf=backend)
    sys = _dimer_system(k_bond, r0, temp)
    awh.simulate(sys, 25 * 500, seed=5)

    res = backend.pmf(zero="min")
    got = res.values()
    cs = res.centers
    beta = 1.0 / (KB * temp)
    ref = beta * 0.5 * k_bond * (cs - r0) ** 2 - 2.0 * np.log(cs / r0)
    ref = ref - ref.min()
    ok = np.isfinite(got)
    assert ok.sum() >= 8
    # center-of-grid bins (well sampled) agree within ~0.7 kBT
    mid = ok & (np.abs(cs - r0) < 0.08)
    assert np.max(np.abs(got[mid] - ref[mid])) < 0.7, (got, ref)


def test_tss_simulation_runs():
    """Smoke: windowed TSS over a soft-core lambda ladder (the full
    reference-class driver lives in tests/test_tss.py)."""
    key = jax.random.PRNGKey(64)
    boundary = mt.cubic(2.0, dtype=jnp.float64)
    coords = mt.place_atoms(key, boundary, 8, min_dist=0.35, dtype=jnp.float64)
    atoms = mt.make_atoms(n=8, mass=10.0, sigma=0.3, epsilon=0.3, lam=1.0,
                          alch_role=jnp.asarray([2, 2] + [0] * 6),
                          dtype=jnp.float64)
    vels = mt.random_velocities(jax.random.PRNGKey(65), atoms.mass, 80.0,
                                dtype=jnp.float64)
    sc = mt.LennardJonesSoftCoreBeutler(alpha=0.5)
    sys = mt.System(atoms=atoms, coords=coords, boundary=boundary,
                    velocities=vels, pairwise_inters=(sc,))
    space = mt.ExtendedStateSpace.lambda_grid(np.linspace(0.0, 1.0, 4),
                                              temperature=80.0)
    state = mt.TSSState(space, graph=mt.tss_grid_graph((4,), window_size=2))
    sim = mt.TSSSimulation(state, sys,
                           mt.Langevin(dt=0.002, temperature=80.0,
                                       friction=5.0),
                           n_md_steps=10, n_cycles=12)
    sim.run(key=jax.random.PRNGKey(66))
    f = mt.tss_free_energies(state)
    assert np.all(np.isfinite(f))
    assert 0 <= state.active_state_index < 4


def test_checkpoint_roundtrip(tmp_path):
    sys = lj_fluid(n_atoms=8, box=2.0)
    key = jax.random.PRNGKey(67)
    path = str(tmp_path / "ckpt.npz")
    mt.save_checkpoint(path, sys, step_n=42, key=key)
    sys2, step, key2, _ = mt.load_checkpoint(path, sys.update(
        coords=jnp.zeros_like(sys.coords)))
    assert step == 42
    assert np.allclose(np.asarray(sys2.coords), np.asarray(sys.coords))
    # resumed runs reproduce
    a, _ = mt.simulate(sys, mt.Langevin(dt=0.001, temperature=50.0, friction=1.0),
                       10, key=key)
    b, _ = mt.simulate(sys2, mt.Langevin(dt=0.001, temperature=50.0, friction=1.0),
                       10, key=key2)
    assert np.allclose(np.asarray(a.coords), np.asarray(b.coords))


def test_trajectory_writer_roundtrip(tmp_path):
    sys = lj_fluid(n_atoms=6, box=2.0)
    for fmt in ("xyz", "pdb", "dcd"):
        path = str(tmp_path / f"traj.{fmt}")
        writer = mt.TrajectoryWriter(5, path)
        final, _ = mt.simulate(sys, mt.VelocityVerlet(dt=0.001), 20,
                               key=jax.random.PRNGKey(68),
                               loggers={"traj": writer})
        ens = mt.EnsembleSystem.from_file(sys, path)
        assert len(ens) == writer.n_written
        # last written frame should be recoverable within format precision
        frame = ens.frame(len(ens) - 1)
        assert frame.coords.shape == sys.coords.shape


def test_analysis_functions():
    sys = lj_fluid(n_atoms=20, box=2.0)
    d = mt.distances(sys.coords, sys.boundary)
    assert float(d[0, 0]) == 0.0
    r = float(mt.rmsd(sys.coords, sys.coords + 0.1))
    assert r == pytest.approx(0.0, abs=1e-6)  # rigid translation removed
    rg = float(mt.radius_gyration(sys.coords, sys.masses))
    assert 0.1 < rg < 2.0
    rh = float(mt.hydrodynamic_radius(sys.coords, sys.boundary))
    assert np.isfinite(rh)
    centers, g = mt.rdf(sys.coords, sys.boundary)
    assert np.all(np.isfinite(g))
    dm = mt.dipole_moment(sys.coords, jnp.ones(20))
    assert dm.shape == (3,)


def test_hremd_runs_and_exchanges():
    """H-REMD over a soft-core LJ lambda ladder: exchanges occur, energies
    ordered with lambda (simulators.jl:2044-2057 parity)."""
    import mollytpu as mt

    n = 24
    key = jax.random.PRNGKey(0)
    boundary = mt.cubic(2.2)
    coords = mt.place_atoms(key, boundary, n, min_dist=0.3)
    atoms = mt.make_atoms(n=n, mass=10.0, sigma=0.3, epsilon=0.5,
                          lam=jnp.ones(n))
    vels = mt.random_velocities(jax.random.PRNGKey(1), atoms.mass, 120.0)
    sys = mt.System(
        atoms=atoms, coords=coords, boundary=boundary, velocities=vels,
        pairwise_inters=(mt.LennardJonesSoftCoreBeutler(
            alpha=0.5, cutoff=mt.DistanceCutoff(1.0)),))
    mask = jnp.arange(n) < 4  # perturb a 4-atom subset
    remd = mt.HamiltonianReplicaExchangeMD(
        lambdas=jnp.asarray([1.0, 0.8, 0.6, 0.4]),
        simulator=mt.Langevin(dt=0.002, temperature=120.0, friction=2.0),
        cycle_length=20, atom_mask=mask)
    ens, info = remd.simulate(sys, 6, key=jax.random.PRNGKey(2))
    assert ens.coords.shape == (4, n, 3)
    assert info["energies"].shape == (6, 4)
    assert jnp.all(jnp.isfinite(info["energies"]))
    assert 0.0 <= info["exchange_rate"] <= 1.0
