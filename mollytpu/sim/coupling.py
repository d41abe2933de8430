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

    def apply(self, sys, aux, dt, step_n, key, kinetic_tensor=None, virial=None, neighbors=None):
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

    def apply(self, sys, aux, dt, step_n, key, kinetic_tensor=None, virial=None, neighbors=None):
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

    def apply(self, sys, aux, dt, step_n, key, kinetic_tensor=None, virial=None, neighbors=None):
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

    def apply(self, sys, aux, dt, step_n, key, kinetic_tensor=None, virial=None, neighbors=None):
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
    # Protocol attribute: simulate() re-derives neighbor-finder geometry
    # between chunks only when a coupler declares it can change the box.
    # Any user-defined box-changing coupler MUST set is_barostat = True,
    # or its box changes silently skip the NPT staleness re-setup.
    is_barostat = True

    @property
    def needs_virial_interval(self):
        return self.n_steps

    def apply(self, sys, aux, dt, step_n, key, kinetic_tensor=None, virial=None, neighbors=None):
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


@dataclasses.dataclass(frozen=True)
class MonteCarloBarostat:
    """OpenMM-style Monte Carlo volume moves (coupling.jl:768-1054).

    Every `n_steps`: propose dV ~ U(-scale, scale), scale molecule centers of
    mass, accept on exp(-(dU + P dV - N kB T ln(V'/V)) / kB T) using two
    potential-energy evaluations inside the jitted step (cheap under jit —
    the reference pays the same two evaluations, coupling.jl:895-917). The
    proposal scale adapts every 10 attempts toward ~40% acceptance; its state
    (scale, attempted, accepted) lives in aux["mc_baro"].
    """

    pressure: float            # kJ/(mol nm^3)
    temperature: float         # K
    n_steps: int = dataclasses.field(default=30, metadata={"static": True})
    initial_scale_frac: float = 0.01
    scale_molecules: bool = dataclasses.field(default=True, metadata={"static": True})
    # "isotropic": one scale for all axes; "anisotropic": each attempt picks
    # a random axis and scales it alone; "semiisotropic": xy together or z
    # (membrane setups) — reference coupling.jl:768-1054 coupling modes.
    coupling: str = dataclasses.field(default="isotropic",
                                      metadata={"static": True})

    invalidates_forces = True
    is_barostat = True  # see BerendsenBarostat: required for NPT re-setup
    needs_virial_interval = 0

    def init_state(self, sys):
        vol = sys.boundary.volume()
        return {"scale": jnp.asarray(self.initial_scale_frac, sys.coords.dtype) * vol,
                "attempted": jnp.zeros((), jnp.int32),
                "accepted": jnp.zeros((), jnp.int32)}

    def apply(self, sys, aux, dt, step_n, key, kinetic_tensor=None, virial=None,
              neighbors=None):
        from ..forces import potential_energy

        state = aux.get("mc_baro")
        if state is None:
            state = self.init_state(sys)

        def attempt(sys, state, key):
            k1, k2 = jax.random.split(key)
            vol = sys.boundary.volume()
            dv = jax.random.uniform(k1, (), dtype=sys.coords.dtype,
                                    minval=-1.0, maxval=1.0) * state["scale"]
            v_new = vol + dv
            s_vol = v_new / vol
            if self.coupling == "isotropic":
                mu = s_vol ** (1.0 / 3.0)
            elif self.coupling == "anisotropic":
                axis = jax.random.randint(k2, (), 0, 3)
                mu = jnp.where(jnp.arange(3) == axis, s_vol, 1.0)
            else:  # semiisotropic: scale xy jointly or z alone
                pick_z = jax.random.bernoulli(k2)
                mu_xy = jnp.asarray([jnp.sqrt(s_vol), jnp.sqrt(s_vol), 1.0])
                mu_z = jnp.asarray([1.0, 1.0, s_vol])
                mu = jnp.where(pick_z, mu_z, mu_xy)
            if self.scale_molecules:
                new_boundary, new_coords = scale_coords_molecular(
                    sys.boundary, sys.coords, mu, sys.masses, sys.molecule_ids,
                    sys.n_molecules)
                n_scaled = sys.n_molecules
            else:
                new_boundary, new_coords = scale_coords(sys.boundary, sys.coords, mu)
                n_scaled = sys.n_atoms
            e_old = potential_energy(sys, neighbors, step_n)
            trial = sys.update(coords=new_coords, boundary=new_boundary)
            e_new = potential_energy(trial, neighbors, step_n)
            kt = KB * self.temperature
            w = (e_new - e_old + self.pressure * dv
                 - n_scaled * kt * jnp.log(v_new / vol))
            k3 = jax.random.fold_in(k2, 7)
            accept = (jax.random.uniform(k3, (), dtype=sys.coords.dtype)
                      < jnp.exp(jnp.minimum(-w / kt, 0.0))) & (v_new > 0)
            coords = jnp.where(accept, new_coords, sys.coords)
            boundary = jax.tree.map(
                lambda a, b: jnp.where(accept, a, b), new_boundary, sys.boundary)
            attempted = state["attempted"] + 1
            accepted = state["accepted"] + accept.astype(jnp.int32)
            # adapt the proposal scale every 10 attempts (coupling.jl:1000-1030)
            adapt = (attempted % 10) == 0
            frac = accepted / jnp.maximum(attempted, 1)
            scale = state["scale"]
            scale = jnp.where(adapt & (frac < 0.25), scale / 1.1, scale)
            scale = jnp.where(adapt & (frac > 0.75), scale * 1.1, scale)
            new_state = {"scale": scale, "attempted": attempted,
                         "accepted": accepted}
            return sys.update(coords=coords, boundary=boundary), new_state

        if self.n_steps > 1:
            def no_op(sys, state, key):
                return sys, state

            sys, state = jax.lax.cond(
                (jnp.asarray(step_n) % self.n_steps) == 0,
                attempt, no_op, sys, state, key)
        else:
            sys, state = attempt(sys, state, key)
        aux = {**aux, "mc_baro": state}
        return sys, aux


_register(MonteCarloBarostat,
          ["pressure", "temperature", "initial_scale_frac"],
          ["n_steps", "scale_molecules", "coupling"])


@dataclasses.dataclass(frozen=True)
class CRescaleBarostat:
    """Stochastic cell rescaling (Bernetti & Bussi 2020; coupling.jl:488-711):
    d eps = -beta_T dt / tau_p (P0 - P) + sqrt(2 kB T beta_T dt / (V tau_p)) xi,
    isotropic mu = exp(d eps / 3). Samples the correct NPT ensemble with a
    deterministic weak-coupling part plus noise."""

    pressure: float
    temperature: float
    coupling_const: float      # tau_p (ps)
    compressibility: float = 4.6e-4 / 0.06022140760000001
    n_steps: int = dataclasses.field(default=1, metadata={"static": True})
    scale_molecules: bool = dataclasses.field(default=False, metadata={"static": True})
    max_scale_frac: float = 0.1

    invalidates_forces = True
    is_barostat = True  # see BerendsenBarostat: required for NPT re-setup

    @property
    def needs_virial_interval(self):
        return self.n_steps

    def apply(self, sys, aux, dt, step_n, key, kinetic_tensor=None, virial=None,
              neighbors=None):
        vol = sys.boundary.volume()
        p = jnp.trace(pressure_tensor(kinetic_tensor, virial, vol)) / sys.n_dims
        beta = self.compressibility
        dt_eff = self.n_steps * dt
        det = -beta * dt_eff / self.coupling_const * (self.pressure - p)
        noise = jnp.sqrt(2.0 * KB * self.temperature * beta * dt_eff
                         / (vol * self.coupling_const))
        xi = jax.random.normal(key, (), dtype=sys.coords.dtype)
        deps = jnp.clip(det + noise * xi, -self.max_scale_frac, self.max_scale_frac)
        mu = jnp.exp(deps / 3.0)
        do = (jnp.asarray(step_n) % self.n_steps) == 0 if self.n_steps > 1 else True
        mu = jnp.where(do, mu, 1.0)
        if self.scale_molecules:
            boundary, coords = scale_coords_molecular(
                sys.boundary, sys.coords, mu, sys.masses, sys.molecule_ids,
                sys.n_molecules)
            vels = sys.velocities
        else:
            boundary, coords, vels = scale_coords(sys.boundary, sys.coords, mu,
                                                  sys.velocities)
        return sys.update(coords=coords, boundary=boundary, velocities=vels), aux


_register(CRescaleBarostat,
          ["pressure", "temperature", "coupling_const", "compressibility",
           "max_scale_frac"],
          ["n_steps", "scale_molecules"])


def apply_couplers(couplers, sys, aux, dt, step_n, key, kinetic_tensor=None,
                   virial=None, neighbors=None):
    for i, c in enumerate(couplers):
        key, sub = jax.random.split(key)
        sys, aux = c.apply(sys, aux, dt, step_n, sub, kinetic_tensor, virial,
                           neighbors)
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
