"""Extended state spaces for generalized-ensemble methods.

Parity with /root/reference/src/free_energy/extended_ensemble.jl
(ExtendedStateSpace :12, ActiveThermoState :363): a discrete space of
thermodynamic states — lambda grids, temperature ladders, and/or per-state
bias potentials (umbrella windows) — with an active-state cursor, consumed
by the AWH/TSS drivers.

TPU-native design: "switching state" is a pure function producing a System
with updated leaves (per-atom lambda, bias parameters); the K-state energy
sweep used by the estimators is one jitted evaluation that computes the
lambda-independent part once (AlchemicalPartition) and adds per-state bias
energies on the scalar CV.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..units import KB
from ..forces import potential_energy
from .thermo import ThermoState, AlchemicalPartition, set_lambda


@dataclasses.dataclass(frozen=True)
class ExtendedStateSpace:
    """Discrete space of ThermoStates, optionally with a per-state bias
    potential (a BiasPotential general interaction) — the functional
    analogue of the reference's per-state Hamiltonians."""

    states: Tuple[ThermoState, ...]
    biases: Tuple = None          # per-state BiasPotential | None
    atom_mask: object = None      # optional alchemical subset for lambda

    @classmethod
    def lambda_grid(cls, lambdas, temperature=300.0, atom_mask=None):
        return cls(tuple(ThermoState(lam=float(l), temperature=temperature)
                         for l in lambdas), atom_mask=atom_mask)

    @classmethod
    def temperature_ladder(cls, temperatures, lam=1.0):
        return cls(tuple(ThermoState(lam=lam, temperature=float(t))
                         for t in temperatures))

    @classmethod
    def umbrella_windows(cls, biases, temperature=300.0):
        """One state per bias potential (umbrella window ladder)."""
        return cls(tuple(ThermoState(lam=1.0, temperature=temperature)
                         for _ in biases), biases=tuple(biases))

    @property
    def n_states(self):
        return len(self.states)

    def betas(self):
        return np.array([1.0 / (KB * float(s.temperature))
                         for s in self.states])

    def lambdas(self):
        return np.array([float(s.lam) for s in self.states])

    def pressures(self):
        return np.array([
            float(s.pressure) if s.pressure is not None else np.nan
            for s in self.states])

    # -- state application ---------------------------------------------------

    def apply_state(self, sys, index):
        """System configured for state `index`: lambda set, bias attached.
        Pure; index is a host int (structure may change with bias type)."""
        st = self.states[index]
        out = set_lambda(sys, float(st.lam), self.atom_mask)
        if self.biases is not None and self.biases[index] is not None:
            out = out.update(
                general_inters=sys.general_inters + (self.biases[index],))
        return out

    def integrator_for(self, simulator, index):
        """Simulator with this state's temperature (leaf-only change)."""
        st = self.states[index]
        if hasattr(simulator, "temperature"):
            return dataclasses.replace(simulator,
                                       temperature=float(st.temperature))
        return simulator

    # -- K-state energy sweep ------------------------------------------------

    def state_energies(self, sys, neighbors=None, indices=None):
        """U_k(x) for every state k, sharing lambda-independent work.

        sys must be the UNBIASED system (no state bias attached). Returns a
        (K,) array — or (len(indices),) when `indices` restricts the sweep
        to a subset of states (the TSS window evaluation sets,
        TSS/single_window.jl evaluate_energy_subset!). The lambda sweep
        vmaps over the perturbed subset only (AlchemicalPartition,
        thermo.jl); per-state biases add bias_k(cv(x)) on top.
        """
        lams = self.lambdas()
        sel = (list(range(self.n_states)) if indices is None
               else [int(i) for i in indices])
        lams_sel = lams[sel]
        if np.all(lams_sel == lams_sel[0]):
            e = potential_energy(set_lambda(sys, float(lams_sel[0]),
                                            self.atom_mask), neighbors)
            es = jnp.full((len(sel),), e)
        else:
            part = AlchemicalPartition(self.atom_mask)
            es = part.cross_energies(sys, lams_sel, neighbors)
        if self.biases is not None:
            bias_es = []
            for k in sel:
                b = self.biases[k]
                if b is None:
                    bias_es.append(jnp.zeros(()))
                else:
                    bias_es.append(b.energy(sys.coords, sys.boundary,
                                            sys.atoms))
            es = es + jnp.stack(bias_es)
        return es

    def reduced_potentials(self, sys, neighbors=None, energies=None,
                           indices=None):
        """u_k = beta_k (U_k + p_k V) — the generalized-ensemble reduced
        potential (reference: reduced_potentials!, extended_ensemble.jl).
        `indices` restricts the sweep to a subset of states."""
        if energies is None:
            energies = self.state_energies(sys, neighbors, indices=indices)
        sel = (slice(None) if indices is None
               else np.asarray([int(i) for i in indices]))
        betas = jnp.asarray(self.betas()[sel])
        u = betas * energies
        press = self.pressures()[sel]
        if np.any(np.isfinite(press)):
            v = sys.boundary.volume()
            p = jnp.asarray(np.where(np.isfinite(press), press, 0.0))
            u = u + betas * p * v
        return u


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
