"""Extended state spaces for generalized-ensemble methods.

Parity with /root/reference/src/free_energy/extended_ensemble.jl
(ExtendedStateSpace :12, ActiveThermoState :363): a discrete space of
thermodynamic states (lambda and/or temperature grids) with an active-state
cursor, consumed by AWH/TSS drivers.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from ..units import KB
from .thermo import ThermoState


@dataclasses.dataclass(frozen=True)
class ExtendedStateSpace:
    """Cartesian-style grid of ThermoStates."""

    states: Tuple[ThermoState, ...]

    @classmethod
    def lambda_grid(cls, lambdas, temperature=300.0):
        return cls(tuple(ThermoState(lam=float(l), temperature=temperature)
                         for l in lambdas))

    @classmethod
    def temperature_ladder(cls, temperatures, lam=1.0):
        return cls(tuple(ThermoState(lam=lam, temperature=float(t))
                         for t in temperatures))

    @property
    def n_states(self):
        return len(self.states)

    def betas(self):
        return np.array([1.0 / (KB * float(s.temperature)) for s in self.states])

    def lambdas(self):
        return np.array([float(s.lam) for s in self.states])


@dataclasses.dataclass
class ActiveThermoState:
    """Cursor into an ExtendedStateSpace (extended_ensemble.jl:363)."""

    space: ExtendedStateSpace
    index: int = 0

    @property
    def state(self):
        return self.space.states[self.index]

    def move(self, new_index):
        self.index = int(np.clip(new_index, 0, self.space.n_states - 1))
        return self.state
