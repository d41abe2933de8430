"""Thermodynamic states and alchemical Hamiltonian partitioning.

Parity with /root/reference/src/free_energy/thermo.jl (:3-345) and
ThermoState / ReplicaSystem (src/types.jl:1183-1427): a ThermoState is a
(system-modifier, beta, pressure) record used by generalized-ensemble
methods; LambdaHamiltonian evaluates the system's potential energy at a given
global lambda; AlchemicalPartition splits interactions into shared vs
perturbed so H-REMD cross-energies re-evaluate only the perturbed subset.

TPU-native design: "setting lambda" is a pure function producing a System
with updated per-atom lam values — cross-energy evaluation across K states
is a vmap over the lambda axis.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..units import KB
from ..forces import potential_energy


@dataclasses.dataclass(frozen=True)
class ThermoState:
    """One thermodynamic state: lambda, inverse temperature, pressure.
    (reference: ThermoState, src/types.jl:1183-1280)."""

    lam: jax.Array = 1.0
    temperature: jax.Array = 300.0
    pressure: jax.Array = None
    name: str = dataclasses.field(default="", metadata={"static": True})

    @property
    def beta(self):
        return 1.0 / (KB * self.temperature)


jax.tree_util.register_dataclass(
    ThermoState, data_fields=["lam", "temperature", "pressure"],
    meta_fields=["name"],
)


def set_lambda(sys, lam, atom_mask=None):
    """System with per-atom lambda set to `lam` (everywhere, or only where
    atom_mask is true). Soft-core and Scaled interactions read it."""
    cur = sys.atoms.lam
    new = jnp.full_like(cur, lam) if atom_mask is None else jnp.where(
        atom_mask, lam, cur)
    return sys.update(atoms=dataclasses.replace(sys.atoms, lam=new))


@dataclasses.dataclass(frozen=True)
class LambdaHamiltonian:
    """U(x; lambda) evaluator (reference: LambdaHamiltonian, thermo.jl).
    atom_mask selects the alchemically perturbed atoms (None = all)."""

    atom_mask: jax.Array = None

    def energy(self, sys, lam, neighbors=None):
        return potential_energy(set_lambda(sys, lam, self.atom_mask), neighbors)

    def energies(self, sys, lams, neighbors=None):
        """U(x; lambda_k) for every lambda in `lams` — one vmapped sweep."""
        return jax.vmap(lambda l: self.energy(sys, l, neighbors))(jnp.asarray(lams))


@dataclasses.dataclass(frozen=True)
class AlchemicalPartition:
    """Split the energy into shared + perturbed parts so K-state cross
    energies only re-evaluate the perturbed subset (reference:
    AlchemicalPartition / evaluate_energy!, thermo.jl).

    The perturbed subset = interactions that read lambda (soft-core and
    Scaled pairwise interactions, lambda-weighted bonded lists); everything
    else is lambda-independent and evaluated once.
    """

    atom_mask: jax.Array = None

    def _is_perturbed(self, inter):
        # soft-core / scaled interactions read lambda through their
        # scheduler; plain LJ-family interactions also consult lambda via the
        # zero shortcut, so they are lambda-dependent too
        return (hasattr(inter, "scheduler") or hasattr(inter, "lambda_mixing")
                or hasattr(inter, "sigma_mixing"))

    def split(self, sys):
        pert = tuple(i for i in sys.pairwise_inters if self._is_perturbed(i))
        shared = tuple(i for i in sys.pairwise_inters if not self._is_perturbed(i))
        sys_shared = sys.update(pairwise_inters=shared)
        sys_pert = sys.update(pairwise_inters=pert, specific_lists=(),
                              general_inters=())
        return sys_shared, sys_pert

    def evaluate_energy(self, sys, lam, neighbors=None, shared_energy=None):
        """Total energy at lambda, reusing a cached shared part."""
        sys_shared, sys_pert = self.split(sys)
        if shared_energy is None:
            shared_energy = potential_energy(sys_shared, neighbors)
        e_pert = potential_energy(set_lambda(sys_pert, lam, self.atom_mask),
                                  neighbors)
        return shared_energy + e_pert

    def cross_energies(self, sys, lams, neighbors=None):
        """(K,) energies at each lambda with the shared part computed once —
        the REMD exchange kernel's input (simulators.jl:2044-2046)."""
        sys_shared, sys_pert = self.split(sys)
        e_shared = potential_energy(sys_shared, neighbors)
        e_pert = jax.vmap(lambda l: potential_energy(
            set_lambda(sys_pert, l, self.atom_mask), neighbors))(jnp.asarray(lams))
        return e_shared + e_pert


jax.tree_util.register_dataclass(
    LambdaHamiltonian, data_fields=["atom_mask"], meta_fields=[])
jax.tree_util.register_dataclass(
    AlchemicalPartition, data_fields=["atom_mask"], meta_fields=[])
