"""Reference-class TSS tests (ports of /root/reference/test/tss.jl: local
estimator construction/update :108, history forgetting :148, single-window
simulation :168, windowed graph + visit control + CovDet :236, windowed
simulation and replicas :284, jackknife :373, PMF deconvolution :421-614).
All indices 0-based."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mollytpu as mt
from mollytpu.free_energy.tss import (
    TSSCovDetAdaptiveGamma, TSSEpoch, conditional_state_weights)
from mollytpu.units import KB

from tests.test_free_energy import (_dimer_system,
                                    _window_free_energies_quadrature)


# -- fixtures ---------------------------------------------------------------

def _lambda_space(n_states=3, temp=298.0):
    return mt.ExtendedStateSpace.lambda_grid(
        np.linspace(1.0, 0.6, n_states), temperature=temp)


def _softcore_system(n_atoms=6, temp=298.0):
    key = jax.random.PRNGKey(31)
    boundary = mt.cubic(2.0, dtype=jnp.float64)
    coords = mt.place_atoms(key, boundary, n_atoms, min_dist=0.3,
                            dtype=jnp.float64)
    atoms = mt.make_atoms(n=n_atoms, mass=10.0, sigma=0.3, epsilon=0.2,
                          lam=1.0,
                          alch_role=jnp.asarray([2] * 2 + [0] * (n_atoms - 2)),
                          dtype=jnp.float64)
    vels = mt.random_velocities(jax.random.PRNGKey(32), atoms.mass, temp,
                                dtype=jnp.float64)
    sc = mt.LennardJonesSoftCoreBeutler(alpha=0.3)
    return mt.System(atoms=atoms, coords=coords, boundary=boundary,
                     velocities=vels, pairwise_inters=(sc,))


# -- graph machinery --------------------------------------------------------

def test_tss_grid_graph_1d():
    g = mt.tss_grid_graph((4,), window_size=(2,), periodic=False)
    assert [list(w.state_indices) for w in g.windows] == \
        [[0], [0, 1], [1, 2], [2, 3], [3]]
    assert [list(x) for x in g.state_to_windows] == \
        [[0, 1], [1, 2], [2, 3], [3, 4]]
    # swap window: from window 2 at state 1 -> window 1
    from mollytpu.free_energy.tss_graph import tss_swap_window
    assert tss_swap_window(g, 2, 1) == 1
    assert tss_swap_window(g, 1, 1) == 2
    # boundary rung volumes are halved; rung neighbors are symmetric
    assert g.rung_volumes == (0.5, 1.0, 1.0, 0.5)
    assert g.rung_neighbors[1] == (((0, 2, 2),))
    assert g.rung_neighbors[0][0][2] == 1      # one real neighbor at the edge


def test_tss_grid_graph_periodic_and_2d():
    gp = mt.tss_grid_graph((4,), window_size=(2,), periodic=True)
    # periodic: no partial boundary windows, 2 + 2 overlapping
    assert len(gp.windows) == 4
    assert all(len(w.state_indices) == 2 for w in gp.windows)
    assert all(len(gp.state_to_windows[s]) == 2 for s in range(4))
    g2 = mt.tss_grid_graph((4, 4), window_size=(2, 2))
    assert g2.n_states == 16
    assert all(len(g2.state_to_windows[s]) == 2 for s in range(16))
    # every rung has 2 lambda dimensions
    assert all(len(n) == 2 for n in g2.rung_neighbors)


def test_tss_graph_validation():
    with pytest.raises(ValueError):
        mt.tss_grid_graph((5,), window_size=(2,))        # not divisible
    with pytest.raises(ValueError):
        mt.tss_grid_graph((9,), window_size=(3,))        # odd overlap size
    with pytest.raises(ValueError):
        mt.TSSWindow(0, [0, 2])                          # not contiguous


def test_tss_multi_edge_graph_merges_partials():
    """Two edges sharing a named corner node merge their boundary partial
    windows into one (windows.jl merge_tss_window_specs)."""
    b = mt.TSSGraphBuilder()
    mt.add_tss_edge(b, ["a", "b"], (4,), window_size=2)
    mt.add_tss_edge(b, ["b", "c"], (4,), window_size=2)
    g = mt.build_tss_graph(b)
    assert g.n_states == 8
    # the b-end partials of both edges merged: one window {3, 4}
    merged = [w for w in g.windows if set(w.state_indices) == {3, 4}]
    assert len(merged) == 1
    assert all(len(g.state_to_windows[s]) == 2 for s in range(8))


# -- local estimator --------------------------------------------------------

def test_local_estimator_construction_and_update():
    est = mt.TSSLocalEstimator(3, gamma=[2.0, 1.0, 1.0],
                               initial_f=[10.0, 11.0, 12.0],
                               ETA=2.0, dens_reg=1e-4)
    assert np.allclose(est.gamma, [0.5, 0.25, 0.25])
    assert np.allclose(est.f, [0.0, 1.0, 2.0])
    assert np.allclose(est.density, est.gamma)
    with pytest.raises(ValueError):
        mt.TSSLocalEstimator(3, gamma=[1.0, 0.0, 1.0])

    est.density = np.array([0.2, 0.3, 0.5])
    est.log_dens = np.log(est.density)
    est.reduced_pot = np.array([1.0, 2.0, 0.5])
    w = conditional_state_weights(est.f + est.log_dens, est.reduced_pot)
    assert abs(w.sum() - 1.0) < 1e-12
    assert np.all(w >= 0)

    est.weights = np.array([0.2, 0.5, 0.3])
    est.reduced_pot = est.f + est.log_dens - np.log(est.weights)
    max_df = est.update_estimates(visited_state=1)
    assert est.iteration == 1
    assert np.isfinite(max_df)
    assert np.all(np.isfinite(est.f)) and np.all(np.isfinite(est.tilts))
    assert abs(est.density.sum() - 1.0) < 1e-12
    with pytest.raises(ValueError):
        est.update_estimates(visited_state=-1)


def test_history_forgetting():
    est = mt.TSSLocalEstimator(
        3, ETA=1.0, dens_reg=1e-4,
        history_forgetting=mt.TSSHistoryForgetting(alpha=0.5, phi=1.2))
    for step in range(1, 11):
        est.weights = np.full(3, 1 / 3)
        est.reduced_pot = np.array([0.1 * step, -0.05 * step, 0.2])
        est.update_estimates(visited_state=step % 3)
    assert est.iteration == 10
    assert 0 < est.recent_count() < est.iteration
    assert np.all(np.isfinite(est.f))
    assert np.all(est.density > 0)
    assert abs(est.density.sum() - 1.0) < 1e-12


def test_history_epoch_boundaries_and_weights():
    h = mt.TSSHistoryForgetting(alpha=0.0, phi=2.0)
    from mollytpu.free_energy.tss import TSSEpochHistory
    hist = TSSEpochHistory.create(h, 2)
    hist.ensure_bounds(4)
    assert hist.taus == [0, 1, 2, 4]
    assert hist.retained_epoch_indices(4) == [1, 2, 3]
    assert np.allclose(hist.epoch_weights([1, 2, 3], 4), [0.25, 0.25, 0.5])


# -- single-window simulation ----------------------------------------------

def test_single_window_simulation():
    space = _lambda_space()
    state = mt.TSSState(space, first_state=0, gamma=np.full(3, 1 / 3),
                        initial_f=[1.0, 2.0, 4.0], ETA=2.0, dens_reg=1e-4)
    sys = _softcore_system()
    sim = mt.TSSSimulation(
        state, sys, mt.Langevin(dt=0.002, temperature=298.0, friction=5.0),
        n_md_steps=2, n_cycles=3, log_freq=1)
    sim.run(seed=1)
    est = state.active_estimator()
    assert state.iteration == 3
    assert est.iteration == 3
    assert est.stats["iterations"] == [1, 2, 3]
    assert all(0 <= s < 3 for s in est.stats["active_state"])
    assert all(np.isfinite(x) for x in est.stats["max_abs_delta_f"])
    assert est.f[0] == 0.0
    assert sim.current_step == 6
    with pytest.raises(ValueError):
        mt.TSSSimulation(state, sys, None, n_md_steps=0, n_cycles=1)
    with pytest.raises(ValueError):
        mt.TSSSimulation(state, sys, None, n_md_steps=1, n_cycles=1,
                         initial_step=-1)


# -- windowed graph, visit control, CovDet ----------------------------------

def test_windowed_visit_control_recovers_true_f():
    """With local estimates initialized at the true free energies, the
    visit-control solve and the reported stitching both reproduce them
    exactly (test/tss.jl:236-258)."""
    space = _lambda_space(4)
    graph = mt.tss_grid_graph((4,), window_size=(2,))
    true_f = np.array([0.0, 1.0, 3.0, 6.0])
    state = mt.TSSState(space, graph=graph, first_state=1, first_window=2,
                        initial_f=true_f, ETA=1.0, dens_reg=1e-4,
                        visit_control_tolerance=1e-10)
    assert state.other_window_for_state(1) == 1
    assert state.coupling.converged
    assert state.coupling.max_abs_residual <= state.coupling.tolerance
    state.update_window_probabilities()
    state.solve_visit_control()
    vcf = state.coupling.visit_control_f - state.coupling.visit_control_f[0]
    assert np.allclose(vcf, true_f, atol=1e-8)
    assert np.allclose(mt.tss_free_energies(state), true_f, atol=1e-8)
    with pytest.raises(ValueError):
        mt.TSSState(space, graph=graph, first_state=1, first_window=0)


def test_covdet_adaptive_gamma():
    space = _lambda_space(4)
    graph = mt.tss_grid_graph((4,), window_size=(2,))
    state = mt.TSSState(space, graph=graph, first_state=0, first_window=0,
                        ETA=0.0, dens_reg=1e-4, adaptive_gamma="covdet",
                        global_visit_control=False)
    assert all(e.adaptive_gamma is not None for e in state.estimators)
    for e in state.estimators:
        assert abs(e.gamma.sum() - 1.0) < 1e-12 and np.all(e.gamma > 0)
    est = state.estimators[2]
    u_by_state = {0: 0.0, 1: 1.0, 2: 4.0, 3: 9.0}
    u_eval = np.array([u_by_state[s] for s in est.evaluation_state_indices])
    vals = est.covdet_moment_values(u_eval)
    assert vals.shape[0] == est.n_local
    assert np.all(np.isfinite(vals))
    with pytest.raises(ValueError):
        mt.TSSState(space, ETA=0.0, adaptive_gamma="covdet")  # needs graph


# -- windowed simulation + replicas -----------------------------------------

def test_windowed_simulation_two_replicas():
    space = _lambda_space(4)
    graph = mt.tss_grid_graph((4,), window_size=(2,))
    state = mt.TSSState(
        space, graph=graph, first_state=0, first_window=0, ETA=1.0,
        dens_reg=1e-4,
        history_forgetting=mt.TSSHistoryForgetting(alpha=0.0, phi=1.2))
    sys = _softcore_system()
    sim = mt.TSSSimulation(
        state, sys, mt.Langevin(dt=0.002, temperature=298.0, friction=5.0),
        n_md_steps=1, n_cycles=4, self_adjustment_steps=2, log_freq=1,
        n_replicas=2, first_states=[0, 2])
    sim.run(seed=14)
    assert len(sim.replicas) == 2
    assert state.iteration == 4
    assert sum(e.iteration for e in state.estimators) == 8
    assert sum(state.window_update_counts) == 8
    for r in sim.replicas:
        assert r.state_index in state.windows[r.window].state_indices
    assert sim.current_step == 8
    assert np.all(np.isfinite(mt.tss_free_energies(state,
                                                   visited_only=True)))
    # multi-replica without history forgetting is rejected
    state2 = mt.TSSState(space, graph=graph, first_state=0, first_window=0)
    with pytest.raises(ValueError):
        mt.TSSSimulation(state2, sys, None, n_md_steps=1, n_cycles=1,
                         n_replicas=2, first_states=[0, 2])


# -- jackknife ---------------------------------------------------------------

def test_windowed_jackknife_uncertainty():
    space = _lambda_space(4)
    graph = mt.tss_grid_graph((4,), window_size=(2,))
    true_f = np.array([0.0, 1.0, 3.0, 6.0])
    window_offsets = [10.0, -2.0, 5.0, 8.0, -4.0]
    state = mt.TSSState(
        space, graph=graph, first_state=0, first_window=0, ETA=0.0,
        dens_reg=1e-4,
        history_forgetting=mt.TSSHistoryForgetting(alpha=0.0, phi=2.0))
    state.iteration = 4
    for wi, est in enumerate(state.estimators):
        local_f = true_f[list(state.windows[wi].state_indices)] + \
            window_offsets[wi]
        est.f = local_f.copy()
        est.tilts = np.ones(est.n_local)
        est.density = est.gamma.copy()
        est.log_dens = np.log(est.density)
        h = est.history
        h.epochs = []
        h.ensure_bounds(state.iteration)
        for ei in range(1, 4):
            ep = TSSEpoch.create(ei, est.n_local)
            ep.count = 1
            ep.f = local_f.copy()
            ep.tilts = np.ones(est.n_local)
            h.epochs.append(ep)
    jk = mt.tss_free_energy_uncertainties(state)
    assert np.allclose(jk.free_energies, true_f, atol=1e-8)
    assert jk.epoch_indices == [1, 2, 3]
    assert np.allclose(jk.epoch_weights, [0.25, 0.25, 0.5])
    assert jk.replicates.shape == (4, 3)
    for col in jk.replicates.T:
        assert np.allclose(col, true_f, atol=1e-8)
    # perturb one epoch -> positive standard errors
    state.estimators[1].history.epochs[0].f[1] += 0.5
    noisy = mt.tss_free_energy_uncertainties(state)
    assert np.all(np.isfinite(noisy.standard_errors))
    assert np.any(noisy.standard_errors[1:] > 0)


# -- end-to-end free-energy recovery ----------------------------------------

import dataclasses


@dataclasses.dataclass(frozen=True)
class _ConstCV:
    def value(self, coords, boundary):
        return jnp.asarray(1.0, dtype=coords.dtype)


jax.tree_util.register_dataclass(_ConstCV, data_fields=[], meta_fields=[])


def test_tss_recovers_constant_state_offsets():
    """States differing by constant energy shifts c_k have exact free
    energies beta*c_k; the full windowed TSS loop (MD + Gibbs sampling +
    estimator + stitching) must recover them."""
    temp = 298.0
    beta = 1.0 / (KB * temp)

    cs = np.array([0.0, 1.0, 2.0, 3.5])   # kJ/mol
    biases = tuple(mt.BiasPotential(bias=mt.LinearBias(k=c), cv=_ConstCV())
                   for c in cs)
    space = mt.ExtendedStateSpace.umbrella_windows(biases, temperature=temp)
    graph = mt.tss_grid_graph((4,), window_size=(2,))
    state = mt.TSSState(space, graph=graph, first_state=0, first_window=0,
                        ETA=1.0, dens_reg=1e-4)
    sys = _softcore_system(temp=temp)
    sim = mt.TSSSimulation(
        state, sys, mt.Langevin(dt=0.002, temperature=temp, friction=5.0),
        n_md_steps=1, n_cycles=60, log_freq=10)
    sim.run(seed=3)
    f_est = mt.tss_free_energies(state)
    f_ref = beta * cs
    assert np.max(np.abs(f_est - f_ref)) < 0.05, (f_est, f_ref)


@pytest.mark.slow
def test_tss_umbrella_windows_recover_dimer_free_energies():
    """Windowed TSS over umbrella states of the harmonic dimer recovers the
    quadrature window free energies (analogue of the AWH recovery test)."""
    temp = 120.0
    k_bond, r0 = 500.0, 0.5
    cv = mt.CalcSingleDist(0, 1)
    centers = [0.40, 0.50, 0.55, 0.60]
    biases = tuple(mt.BiasPotential(bias=mt.SquareBias(k=400.0, cv0=c),
                                    cv=cv) for c in centers)
    space = mt.ExtendedStateSpace.umbrella_windows(biases, temperature=temp)
    graph = mt.tss_grid_graph((4,), window_size=(2,))
    state = mt.TSSState(space, graph=graph, first_state=0, first_window=0,
                        ETA=2.0, dens_reg=1e-4)
    sim = mt.TSSSimulation(
        state, _dimer_system(k_bond, r0, temp),
        mt.Langevin(dt=0.002, temperature=temp, friction=5.0),
        n_md_steps=25, n_cycles=400)
    sim.run(seed=7)
    f_ref = _window_free_energies_quadrature(k_bond, r0, temp, biases)
    f_est = mt.tss_free_energies(state)
    assert np.all(np.isfinite(f_est))
    assert np.max(np.abs(f_est - f_ref)) < 0.8, (f_est, f_ref)


# -- PMF deconvolution -------------------------------------------------------

def test_tss_pmf_deconvolution_arithmetic():
    space = _lambda_space(4)
    graph = mt.tss_grid_graph((4,), window_size=(2,))
    state = mt.TSSState(space, graph=graph, first_state=0, first_window=0,
                        ETA=1.0, dens_reg=1e-4)

    def coupling(xi, k):
        return 0.5 * k * xi * xi

    pmf = mt.TSSPMFDeconvolution(state, grid=(0.0, 2.0, 4),
                                 cv=lambda sys: (0.5,), coupling=coupling)
    assert pmf.log_coupling_matrix.shape == (4, 4)
    est = state.estimators[1]
    lbw = pmf.log_bin_weights(est, window_offset=0.3)
    assert lbw.shape == (4,)
    assert np.all(np.isfinite(lbw))


@pytest.mark.slow
def test_tss_pmf_deconvolution_recovers_unbiased_pmf():
    """End-to-end: TSS over umbrella windows + sampled PMF deconvolution
    recovers the unbiased dimer PMF (deconvolution.jl + test/tss.jl:541)."""
    temp = 120.0
    k_bond, r0 = 500.0, 0.5
    cv = mt.CalcSingleDist(0, 1)
    centers = [0.42, 0.50, 0.58]
    biases = tuple(mt.BiasPotential(bias=mt.SquareBias(k=400.0, cv0=c),
                                    cv=cv) for c in centers)
    space = mt.ExtendedStateSpace.umbrella_windows(biases, temperature=temp)
    state = mt.TSSState(space, first_state=1, ETA=2.0, dens_reg=1e-4)
    pmf = mt.TSSPMFDeconvolution(state, grid=(0.38, 0.62, 10))
    sim = mt.TSSSimulation(
        state, _dimer_system(k_bond, r0, temp),
        mt.Langevin(dt=0.002, temperature=temp, friction=5.0),
        n_md_steps=25, n_cycles=400, pmf=pmf)
    sim.run(seed=11)
    res = pmf.pmf(zero="min")
    got = res.values()
    cs = np.asarray(res.centers)
    beta = 1.0 / (KB * temp)
    ref = beta * 0.5 * k_bond * (cs - r0) ** 2 - 2.0 * np.log(cs / r0)
    ref = ref - ref.min()
    ok = np.isfinite(got)
    assert ok.sum() >= 7
    mid = ok & (np.abs(cs - r0) < 0.08)
    assert np.max(np.abs(got[mid] - ref[mid])) < 0.7, (got, ref)
