"""Thermostats and barostats (coupling).

Parity with /root/reference/src/coupling.jl. The `apply_coupling!` protocol
(:13-40) becomes a pure function

    apply(sys, aux, dt, step_n, key, kinetic_tensor, virial) -> (sys, aux)

plus two static traits used at trace time:
    invalidates_forces — coupler moves coords/box, forces must be recomputed
    needs_virial_interval — coupler needs the pressure virial every n steps
Couplers keep their evolving state (e.g. MC barostat scale adaptation) in the
shared `aux` dict under their own key, so the scan carry stays a pytree.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..units import KB
from ..spatial import (
    kinetic_energy, random_velocities, scale_coords, scale_coords_molecular,
    pressure_tensor,
)


def _register(cls, data_fields, meta_fields=()):
    jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )
    return cls


def _instant_temp(sys):
    return 2.0 * kinetic_energy(sys.masses, sys.velocities) / (sys.n_dof * KB)


@dataclasses.dataclass(frozen=True)
class ImmediateThermostat:
    """Rescale velocities to the target temperature every step
    (coupling.jl:82)."""

    temperature: float

    invalidates_forces = False
    needs_virial_interval = 0

    def apply(self, sys, aux, dt, step_n, key, kinetic_tensor=None, virial=None):
        t_inst = _instant_temp(sys)
        lam = jnp.sqrt(self.temperature / jnp.maximum(t_inst, 1e-12))
        return sys.update(velocities=sys.velocities * lam), aux


_register(ImmediateThermostat, ["temperature"])


@dataclasses.dataclass(frozen=True)
class VelocityRescaleThermostat:
    """Bussi stochastic velocity rescaling (canonical sampling through
    velocity rescaling; coupling.jl:114-180)."""

    temperature: float
    coupling_const: float  # tau (ps)

    invalidates_forces = False
    needs_virial_interval = 0

    def apply(self, sys, aux, dt, step_n, key, kinetic_tensor=None, virial=None):
        nf = sys.n_dof
        ke = kinetic_energy(sys.masses, sys.velocities)
        ke_target = 0.5 * nf * KB * self.temperature
        c = jnp.exp(-dt / self.coupling_const)
        k1, k2 = jax.random.split(key)
        r1 = jax.random.normal(k1, (), dtype=sys.coords.dtype)
        # sum of squares of nf-1 gaussians via the Gamma distribution
        g = 2.0 * jax.random.gamma(k2, 0.5 * (nf - 1), dtype=sys.coords.dtype)
        ratio = ke_target / jnp.maximum(nf * ke, 1e-12)
        alpha2 = (c + (1.0 - c) * ratio * (g + r1 ** 2)
                  + 2.0 * r1 * jnp.sqrt(c * (1.0 - c) * ratio))
        alpha = jnp.sqrt(jnp.maximum(alpha2, 0.0))
        return sys.update(velocities=sys.velocities * alpha), aux


_register(VelocityRescaleThermostat, ["temperature", "coupling_const"])


@dataclasses.dataclass(frozen=True)
class AndersenThermostat:
    """Each atom's velocity resampled from Maxwell-Boltzmann with probability
    dt/coupling_const per step (coupling.jl:184-225)."""

    temperature: float
    coupling_const: float

    invalidates_forces = False
    needs_virial_interval = 0

    def apply(self, sys, aux, dt, step_n, key, kinetic_tensor=None, virial=None):
        k1, k2 = jax.random.split(key)
        n = sys.n_atoms
        resample = jax.random.uniform(k1, (n,)) < dt / self.coupling_const
        new_v = random_velocities(k2, sys.masses, self.temperature,
                                  n_dims=sys.n_dims, dtype=sys.coords.dtype)
        vels = jnp.where(resample[:, None], new_v, sys.velocities)
        return sys.update(velocities=vels), aux


_register(AndersenThermostat, ["temperature", "coupling_const"])


@dataclasses.dataclass(frozen=True)
class BerendsenThermostat:
    """Weak-coupling rescale toward the target temperature
    (coupling.jl:227-260)."""

    temperature: float
    coupling_const: float

    invalidates_forces = False
    needs_virial_interval = 0

    def apply(self, sys, aux, dt, step_n, key, kinetic_tensor=None, virial=None):
        t_inst = jnp.maximum(_instant_temp(sys), 1e-12)
        lam2 = 1.0 + (dt / self.coupling_const) * (self.temperature / t_inst - 1.0)
        lam = jnp.sqrt(jnp.maximum(lam2, 0.0))
        return sys.update(velocities=sys.velocities * lam), aux


_register(BerendsenThermostat, ["temperature", "coupling_const"])


@dataclasses.dataclass(frozen=True)
class BerendsenBarostat:
    """Weak-coupling isotropic box rescale toward the target pressure
    (coupling.jl:263-462). Uses the pressure from the current kinetic tensor
    and virial; applies mu^(1/3) scaling every `n_steps`."""

    pressure: float                    # target, kJ/(mol nm^3)
    coupling_const: float              # tau_p (ps)
    compressibility: float = 4.6e-4 / 0.06022140760000001  # 1/bar -> internal
    n_steps: int = dataclasses.field(default=1, metadata={"static": True})
    max_scale_frac: float = 0.1
    scale_molecules: bool = dataclasses.field(default=False, metadata={"static": True})

    invalidates_forces = True

    @property
    def needs_virial_interval(self):
        return self.n_steps

    def apply(self, sys, aux, dt, step_n, key, kinetic_tensor=None, virial=None):
        vol = sys.boundary.volume()
        p = jnp.trace(pressure_tensor(kinetic_tensor, virial, vol)) / sys.n_dims
        beta = self.compressibility
        mu3 = 1.0 - (self.n_steps * dt / self.coupling_const) * beta * (self.pressure - p)
        mu3 = jnp.clip(mu3, 1.0 - self.max_scale_frac, 1.0 + self.max_scale_frac)
        mu = mu3 ** (1.0 / 3.0)
        do = (step_n % self.n_steps) == 0 if self.n_steps > 1 else True
        mu = jnp.where(do, mu, 1.0)
        if self.scale_molecules:
            boundary, coords = scale_coords_molecular(
                sys.boundary, sys.coords, mu, sys.masses, sys.molecule_ids,
                sys.n_molecules)
        else:
            boundary, coords = scale_coords(sys.boundary, sys.coords, mu)
        return sys.update(coords=coords, boundary=boundary), aux


_register(BerendsenBarostat,
          ["pressure", "coupling_const", "compressibility", "max_scale_frac"],
          ["n_steps", "scale_molecules"])


def apply_couplers(couplers, sys, aux, dt, step_n, key, kinetic_tensor=None, virial=None):
    for i, c in enumerate(couplers):
        key, sub = jax.random.split(key)
        sys, aux = c.apply(sys, aux, dt, step_n, sub, kinetic_tensor, virial)
    return sys, aux


def couplers_invalidate_forces(couplers):
    return any(getattr(c, "invalidates_forces", False) for c in couplers)


def needs_virial_interval(couplers, loggers=()):
    """Smallest positive virial interval over couplers and loggers, or 0
    (reference: needs_virial_schedule, coupling.jl:1057-1081)."""
    intervals = []
    for c in couplers:
        iv = getattr(c, "needs_virial_interval", 0)
        if iv:
            intervals.append(int(iv))
    for lg in loggers:
        iv = getattr(lg, "needs_virial_interval", 0)
        if iv:
            intervals.append(int(iv))
    if not intervals:
        return 0
    import math
    g = intervals[0]
    for iv in intervals[1:]:
        g = math.gcd(g, iv)
    return g
