"""AWH: accelerated weight histogram adaptive-bias simulation.

Parity with /root/reference/src/free_energy/AWH.jl (AWHState, AWHSimulation
with its own simulate! driving MD segments + bias updates + PMF readout
:174, :555). This implementation keeps the same structure — a CV grid, a
running free-energy estimate whose negative is applied as the sampling bias,
an initial stage with a shrinking update size followed by the 1/t final
stage, and a (here uniform) target distribution — in a compact functional
core; forces from the grid bias come from autodiff through linear
interpolation.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..units import KB
from ..ops.general import GeneralInteraction
from ..sim.simulate import simulate
from .reweighting import PMFGrid


@dataclasses.dataclass(frozen=True)
class GridBias(GeneralInteraction):
    """Bias energy linearly interpolated on a CV grid (differentiable)."""

    cv: object = None
    centers: jax.Array = None
    values: jax.Array = None

    def energy(self, coords, boundary, atoms):
        x = self.cv.value(coords, boundary)
        return jnp.interp(x, self.centers, self.values)


jax.tree_util.register_dataclass(
    GridBias, data_fields=["cv", "centers", "values"], meta_fields=[])


@dataclasses.dataclass
class AWHState:
    """Free-energy estimate + histogram on the CV grid (AWH.jl AWHState)."""

    centers: np.ndarray
    f_est: np.ndarray            # kJ/mol estimate of F(cv)
    hist: np.ndarray             # visits since last update-size change
    update_size: float           # kJ/mol per visit (shrinks over time)
    n_updates: int = 0
    in_initial_stage: bool = True

    @classmethod
    def create(cls, lo, hi, n_bins, initial_update=1.0):
        centers = PMFGrid(lo, hi, n_bins).centers
        return cls(centers=centers, f_est=np.zeros(n_bins),
                   hist=np.zeros(n_bins), update_size=initial_update)


@dataclasses.dataclass(frozen=True)
class AWHSimulation:
    """Adaptive-bias driver: alternate jitted MD segments with host-side AWH
    updates (the reference's simulate! does the same segment/update split)."""

    cv: object
    simulator: object
    temperature: float
    lo: float
    hi: float
    n_bins: int = 40
    n_steps_per_update: int = 100
    initial_update: float = 1.0
    flatness_threshold: float = 0.7

    def simulate(self, sys, n_updates, key=None, state=None):
        """Returns (final System, AWHState). The applied bias is -f_est, so
        sampling flattens as f_est converges to the PMF."""
        if key is None:
            key = jax.random.PRNGKey(0)
        if state is None:
            state = AWHState.create(self.lo, self.hi, self.n_bins,
                                    self.initial_update)
        base_general = sys.general_inters
        grid = PMFGrid(self.lo, self.hi, self.n_bins)
        for u in range(n_updates):
            bias = GridBias(cv=self.cv,
                            centers=jnp.asarray(state.centers),
                            values=jnp.asarray(-state.f_est))
            biased = sys.update(general_inters=base_general + (bias,))
            key, sub = jax.random.split(key)
            biased, logs = simulate(biased, self.simulator,
                                    self.n_steps_per_update, key=sub)
            sys = biased.update(general_inters=base_general)
            cv_val = float(self.cv.value(sys.coords, sys.boundary))
            b = grid.bin_of(cv_val)
            state.hist[b] += 1
            state.f_est[b] += state.update_size
            state.f_est -= state.f_est.min()
            state.n_updates += 1
            # stage control: halve the update size when the histogram is
            # sufficiently flat (initial stage), then switch to 1/t decay
            if state.in_initial_stage:
                visited = state.hist[state.hist > 0]
                if (len(visited) > self.n_bins * 0.6
                        and visited.min() > self.flatness_threshold
                        * state.hist.mean()):
                    state.update_size *= 0.5
                    state.hist[:] = 0
                    if state.update_size < KB * self.temperature * 0.05:
                        state.in_initial_stage = False
            else:
                state.update_size = self.initial_update / max(state.n_updates, 1)
        return sys, state

    def pmf(self, state):
        """Current PMF estimate (min-shifted)."""
        return state.centers, state.f_est - state.f_est.min()
