"""Integrators (the L4 "scheduler" layer).

Parity with /root/reference/src/simulators.jl: VelocityVerlet (:276-668),
Verlet leapfrog (:844-958), StormerVerlet (:960-1063), Langevin BAOA
(:1065-1210), LangevinSplitting (:1212-1398), OverdampedLangevin (:1400-1489),
NoseHoover (:1491-1614), plus DPDVelocityVerlet (:670-842) and MTS (:1616-1940)
in this module.

TPU-native contract: an integrator is an immutable pytree with

    init_aux(sys, neighbors, needs_virial) -> aux   (forces cache + state)
    step(sys, neighbors, aux, step_n, key, needs_virial) -> (sys, aux)

so one step is one pure function the simulate loop can lax.scan — no host
round-trips (the reference's loop syncs to the host every step). Constraint
(SHAKE/RATTLE) and virtual-site hooks mirror the reference's call sites.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..units import KB
from ..forces import forces_virial
from ..spatial import remove_cm_motion, kinetic_energy
from .coupling import apply_couplers


def _register(cls, data_fields, meta_fields=()):
    jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )
    return cls


def _accels(sys, forces):
    m = sys.masses
    safe = jnp.where(m > 0, m, 1.0)
    return jnp.where((m > 0)[:, None], forces / safe[:, None], 0.0)


def _apply_position_constraints(sys, coords_prev, coords_new, vels, dt):
    """SHAKE-family hook; constraints adjust positions (and implied
    velocities). Returns (coords, vels)."""
    for c in sys.constraints:
        coords_new, vels = c.apply_position_constraints(
            coords_prev, coords_new, vels, sys.masses, sys.boundary, dt)
    return coords_new, vels


def _apply_velocity_constraints(sys, coords, vels):
    for c in sys.constraints:
        vels = c.apply_velocity_constraints(coords, vels, sys.masses, sys.boundary)
    return vels


def _place_virtual_sites(sys, coords):
    if sys.virtual_sites is not None:
        return sys.virtual_sites.place(coords, sys.boundary)
    return coords


def _recompute(sys, neighbors, step_n, needs_virial):
    f, v = forces_virial(sys, neighbors, step_n, needs_virial=needs_virial)
    return {"forces": f, "virial": v}


class _IntegratorBase:
    remove_cm = True

    def init_aux(self, sys, neighbors, needs_virial=False):
        aux = _recompute(sys, neighbors, 0, needs_virial)
        aux.update(self.extra_state(sys))
        for c in getattr(self, "coupling", ()):
            if hasattr(c, "init_state"):
                aux["mc_baro"] = c.init_state(sys)
        return aux

    def extra_state(self, sys):
        return {}

    def _finish_step(self, sys, neighbors, aux, step_n, key, needs_virial,
                     kinetic_tensor=None):
        """Common tail: CM motion removal and coupling."""
        if self.remove_cm:
            sys = sys.update(velocities=remove_cm_motion(sys.masses, sys.velocities))
        if self.coupling:
            if kinetic_tensor is None and needs_virial:
                from ..spatial import kinetic_energy_tensor
                kinetic_tensor = kinetic_energy_tensor(sys.masses, sys.velocities)
            sys, aux = apply_couplers(self.coupling, sys, aux, self.dt, step_n,
                                      key, kinetic_tensor, aux.get("virial"),
                                      neighbors)
            from .coupling import couplers_invalidate_forces
            if couplers_invalidate_forces(self.coupling):
                new = _recompute(sys, neighbors, step_n, needs_virial)
                aux = {**aux, **new}
        return sys, aux


@dataclasses.dataclass(frozen=True)
class VelocityVerlet(_IntegratorBase):
    """Kick-drift-kick with constraint and virtual-site hooks
    (simulators.jl:276-668)."""

    dt: float
    coupling: tuple = ()
    remove_cm: bool = dataclasses.field(default=True, metadata={"static": True})

    def step(self, sys, neighbors, aux, step_n, key, needs_virial=False):
        dt = self.dt
        a_t = _accels(sys, aux["forces"])
        vels = sys.velocities + 0.5 * dt * a_t
        vels = _apply_velocity_constraints(sys, sys.coords, vels)
        coords_prev = sys.coords
        coords = sys.coords + dt * vels
        coords, vels = _apply_position_constraints(sys, coords_prev, coords, vels, dt)
        coords = sys.boundary.wrap(coords)
        coords = _place_virtual_sites(sys, coords)
        sys = sys.update(coords=coords, velocities=vels)
        aux = {**aux, **_recompute(sys, neighbors, step_n, needs_virial)}
        a_tdt = _accels(sys, aux["forces"])
        vels = sys.velocities + 0.5 * dt * a_tdt
        vels = _apply_velocity_constraints(sys, sys.coords, vels)
        sys = sys.update(velocities=vels)
        from ..spatial import kinetic_energy_tensor
        kin_t = kinetic_energy_tensor(sys.masses, sys.velocities) if needs_virial else None
        return self._finish_step(sys, neighbors, aux, step_n, key, needs_virial, kin_t)


_register(VelocityVerlet, ["dt", "coupling"], ["remove_cm"])


@dataclasses.dataclass(frozen=True)
class Verlet(_IntegratorBase):
    """Leapfrog Verlet (simulators.jl:844-958): v(t+dt/2) from a(t), then
    drift. Velocities are offset by half a step, as in the reference."""

    dt: float
    coupling: tuple = ()
    remove_cm: bool = dataclasses.field(default=True, metadata={"static": True})

    def step(self, sys, neighbors, aux, step_n, key, needs_virial=False):
        dt = self.dt
        a_t = _accels(sys, aux["forces"])
        vels = sys.velocities + dt * a_t
        vels = _apply_velocity_constraints(sys, sys.coords, vels)
        coords_prev = sys.coords
        coords = sys.coords + dt * vels
        coords, vels = _apply_position_constraints(sys, coords_prev, coords, vels, dt)
        coords = sys.boundary.wrap(coords)
        coords = _place_virtual_sites(sys, coords)
        sys = sys.update(coords=coords, velocities=vels)
        aux = {**aux, **_recompute(sys, neighbors, step_n, needs_virial)}
        return self._finish_step(sys, neighbors, aux, step_n, key, needs_virial)


_register(Verlet, ["dt", "coupling"], ["remove_cm"])


@dataclasses.dataclass(frozen=True)
class StormerVerlet(_IntegratorBase):
    """Position Verlet: x_{t+dt} = 2 x_t - x_{t-dt} + a dt^2; velocities are
    O(dt) estimates and no coupling is supported (simulators.jl:960-1063)."""

    dt: float
    coupling: tuple = ()
    remove_cm: bool = dataclasses.field(default=False, metadata={"static": True})

    def extra_state(self, sys):
        return {"coords_prev": sys.coords - sys.velocities * self.dt}

    def step(self, sys, neighbors, aux, step_n, key, needs_virial=False):
        dt = self.dt
        a_t = _accels(sys, aux["forces"])
        disp_prev = sys.boundary.displacement(aux["coords_prev"], sys.coords)
        new_coords_unwrapped = sys.coords + disp_prev + a_t * dt * dt
        vels = (disp_prev + a_t * dt * dt) / dt
        coords_prev = sys.coords
        coords, vels = _apply_position_constraints(sys, coords_prev,
                                                   new_coords_unwrapped, vels, dt)
        coords = sys.boundary.wrap(coords)
        coords = _place_virtual_sites(sys, coords)
        sys = sys.update(coords=coords, velocities=vels)
        aux = {**aux, "coords_prev": coords_prev,
               **_recompute(sys, neighbors, step_n, needs_virial)}
        return sys, aux


_register(StormerVerlet, ["dt", "coupling"], ["remove_cm"])


@dataclasses.dataclass(frozen=True)
class Langevin(_IntegratorBase):
    """BAOA(B) middle-scheme Langevin leapfrog, OpenMM-style
    (simulators.jl:1065-1210). friction in 1/ps."""

    dt: float
    temperature: float
    friction: float
    coupling: tuple = ()
    remove_cm: bool = dataclasses.field(default=True, metadata={"static": True})

    def step(self, sys, neighbors, aux, step_n, key, needs_virial=False):
        dt = self.dt
        # B: full kick
        a_t = _accels(sys, aux["forces"])
        vels = sys.velocities + dt * a_t
        vels = _apply_velocity_constraints(sys, sys.coords, vels)
        # A: half drift
        coords_prev = sys.coords
        coords = sys.coords + 0.5 * dt * vels
        # O: Ornstein-Uhlenbeck
        c1 = jnp.exp(-self.friction * dt)
        m = sys.masses
        safe_m = jnp.where(m > 0, m, 1.0)
        sigma = jnp.sqrt(KB * self.temperature / safe_m) * jnp.sqrt(1.0 - c1 ** 2)
        noise = jax.random.normal(key, sys.velocities.shape, dtype=sys.coords.dtype)
        vels = c1 * vels + jnp.where((m > 0)[:, None], sigma[:, None] * noise, 0.0)
        vels = _apply_velocity_constraints(sys, coords, vels)
        # A: half drift
        coords = coords + 0.5 * dt * vels
        coords, vels = _apply_position_constraints(sys, coords_prev, coords, vels, dt)
        coords = sys.boundary.wrap(coords)
        coords = _place_virtual_sites(sys, coords)
        sys = sys.update(coords=coords, velocities=vels)
        aux = {**aux, **_recompute(sys, neighbors, step_n, needs_virial)}
        return self._finish_step(sys, neighbors, aux, step_n, key, needs_virial)


_register(Langevin, ["dt", "temperature", "friction", "coupling"], ["remove_cm"])


@dataclasses.dataclass(frozen=True)
class LangevinSplitting(_IntegratorBase):
    """Generic A/B/O splitting Langevin integrator (simulators.jl:1212-1398).
    splitting e.g. "BAOAB"; repeated letters subdivide the timestep. Forces
    are recomputed after the last coordinate update, matching the reference's
    derived force schedule."""

    dt: float
    temperature: float
    friction: float
    splitting: str = dataclasses.field(default="BAOAB", metadata={"static": True})
    coupling: tuple = ()
    remove_cm: bool = dataclasses.field(default=True, metadata={"static": True})

    def step(self, sys, neighbors, aux, step_n, key, needs_virial=False):
        s = self.splitting.upper()
        n_a = s.count("A") or 1
        n_b = s.count("B") or 1
        n_o = s.count("O") or 1
        dt = self.dt
        m = sys.masses
        safe_m = jnp.where(m > 0, m, 1.0)
        coords, vels = sys.coords, sys.velocities
        coords_prev = coords
        forces = aux["forces"]
        a_cur = _accels(sys, forces)
        last_coord_update = max(i for i, ch in enumerate(s) if ch == "A") if "A" in s else -1
        for i, ch in enumerate(s):
            if ch == "A":
                coords = coords + (dt / n_a) * vels
                if i == last_coord_update:
                    # recompute forces at final geometry for next B steps
                    coords_c, vels = _apply_position_constraints(
                        sys, coords_prev, coords, vels, dt)
                    coords = coords_c
                    sys2 = sys.update(coords=sys.boundary.wrap(coords))
                    new = _recompute(sys2, neighbors, step_n, needs_virial)
                    forces = new["forces"]
                    aux = {**aux, **new}
                    a_cur = _accels(sys, forces)
            elif ch == "B":
                vels = vels + (dt / n_b) * a_cur
            elif ch == "O":
                key, sub = jax.random.split(key)
                c1 = jnp.exp(-self.friction * dt / n_o)
                sigma = jnp.sqrt(KB * self.temperature / safe_m) * jnp.sqrt(1.0 - c1 ** 2)
                noise = jax.random.normal(sub, vels.shape, dtype=coords.dtype)
                vels = c1 * vels + jnp.where((m > 0)[:, None], sigma[:, None] * noise, 0.0)
        vels = _apply_velocity_constraints(sys, coords, vels)
        coords = sys.boundary.wrap(coords)
        coords = _place_virtual_sites(sys, coords)
        sys = sys.update(coords=coords, velocities=vels)
        return self._finish_step(sys, neighbors, aux, step_n, key, needs_virial)


_register(LangevinSplitting, ["dt", "temperature", "friction", "coupling"],
          ["splitting", "remove_cm"])


@dataclasses.dataclass(frozen=True)
class OverdampedLangevin(_IntegratorBase):
    """Euler-Maruyama Brownian dynamics (simulators.jl:1400-1489)."""

    dt: float
    temperature: float
    friction: float  # gamma, 1/ps
    coupling: tuple = ()
    remove_cm: bool = dataclasses.field(default=True, metadata={"static": True})

    def step(self, sys, neighbors, aux, step_n, key, needs_virial=False):
        dt = self.dt
        m = sys.masses
        safe_m = jnp.where(m > 0, m, 1.0)
        a_t = _accels(sys, aux["forces"])
        noise = jax.random.normal(key, sys.coords.shape, dtype=sys.coords.dtype)
        sigma = jnp.sqrt(2.0 * KB * self.temperature * dt / (self.friction * safe_m))
        coords_prev = sys.coords
        coords = (sys.coords + a_t * dt / self.friction
                  + jnp.where((m > 0)[:, None], sigma[:, None] * noise, 0.0))
        vels = sys.velocities
        coords, vels = _apply_position_constraints(sys, coords_prev, coords, vels, dt)
        coords = sys.boundary.wrap(coords)
        coords = _place_virtual_sites(sys, coords)
        sys = sys.update(coords=coords, velocities=vels)
        aux = {**aux, **_recompute(sys, neighbors, step_n, needs_virial)}
        return self._finish_step(sys, neighbors, aux, step_n, key, needs_virial)


_register(OverdampedLangevin, ["dt", "temperature", "friction", "coupling"],
          ["remove_cm"])


@dataclasses.dataclass(frozen=True)
class NoseHoover(_IntegratorBase):
    """Single-chain Nose-Hoover thermostat on velocity Verlet
    (simulators.jl:1491-1614)."""

    dt: float
    temperature: float
    damping: float = 0.1  # tau_T (ps)
    coupling: tuple = ()
    remove_cm: bool = dataclasses.field(default=True, metadata={"static": True})

    def extra_state(self, sys):
        return {"nh_zeta": jnp.zeros((), dtype=sys.coords.dtype)}

    def step(self, sys, neighbors, aux, step_n, key, needs_virial=False):
        dt = self.dt
        zeta = aux["nh_zeta"]
        a_t = _accels(sys, aux["forces"])
        vels = sys.velocities + 0.5 * dt * (a_t - zeta * sys.velocities)
        vels = _apply_velocity_constraints(sys, sys.coords, vels)
        coords_prev = sys.coords
        coords = sys.coords + dt * vels
        coords, vels = _apply_position_constraints(sys, coords_prev, coords, vels, dt)
        coords = sys.boundary.wrap(coords)
        coords = _place_virtual_sites(sys, coords)
        sys = sys.update(coords=coords, velocities=vels)
        # zeta half-step updates around the new kinetic energy
        ke = kinetic_energy(sys.masses, vels)
        ke_target = 0.5 * (sys.n_dof + 1) * KB * self.temperature
        zeta_dot = (ke - ke_target) / (ke_target * self.damping ** 2)
        zeta = zeta + dt * zeta_dot
        aux = {**aux, "nh_zeta": zeta,
               **_recompute(sys, neighbors, step_n, needs_virial)}
        a_tdt = _accels(sys, aux["forces"])
        vels = (vels + 0.5 * dt * a_tdt) / (1.0 + 0.5 * dt * zeta)
        vels = _apply_velocity_constraints(sys, sys.coords, vels)
        sys = sys.update(velocities=vels)
        return self._finish_step(sys, neighbors, aux, step_n, key, needs_virial)


_register(NoseHoover, ["dt", "temperature", "damping", "coupling"], ["remove_cm"])


@dataclasses.dataclass(frozen=True)
class DPDVelocityVerlet(_IntegratorBase):
    """Groot-Warren modified velocity Verlet for velocity-dependent DPD
    forces: predicted velocities v~ = v + lambda dt a enter the force
    evaluation (simulators.jl:670-842)."""

    dt: float
    lam: float = 0.5
    coupling: tuple = ()
    remove_cm: bool = dataclasses.field(default=True, metadata={"static": True})

    def step(self, sys, neighbors, aux, step_n, key, needs_virial=False):
        dt = self.dt
        a_t = _accels(sys, aux["forces"])
        coords = sys.boundary.wrap(sys.coords + dt * sys.velocities + 0.5 * dt * dt * a_t)
        v_pred = sys.velocities + self.lam * dt * a_t
        sys_pred = sys.update(coords=coords, velocities=v_pred)
        new = _recompute(sys_pred, neighbors, step_n, needs_virial)
        a_tdt = _accels(sys, new["forces"])
        vels = sys.velocities + 0.5 * dt * (a_t + a_tdt)
        sys = sys.update(coords=coords, velocities=vels)
        aux = {**aux, **new}
        return self._finish_step(sys, neighbors, aux, step_n, key, needs_virial)


_register(DPDVelocityVerlet, ["dt", "lam", "coupling"], ["remove_cm"])


def _split_fast_slow(sys):
    """MTS split: bonded terms are the fast group, nonbonded + general the
    slow group (the reference allows arbitrary per-interaction fractions,
    simulators.jl:1616-1940; this covers the standard rRESPA use)."""
    sys_fast = sys.update(pairwise_inters=(), general_inters=())
    sys_slow = sys.update(specific_lists=())
    return sys_fast, sys_slow


@dataclasses.dataclass(frozen=True)
class MTSIntegrator(_IntegratorBase):
    """rRESPA multiple time stepping (simulators.jl:1616-1800): slow
    (nonbonded) forces kick at dt, fast (bonded) forces integrate with an
    inner velocity-Verlet loop at dt / n_substeps."""

    dt: float
    n_substeps: int = dataclasses.field(default=4, metadata={"static": True})
    coupling: tuple = ()
    remove_cm: bool = dataclasses.field(default=True, metadata={"static": True})

    def init_aux(self, sys, neighbors, needs_virial=False):
        sys_fast, sys_slow = _split_fast_slow(sys)
        f_slow, v = forces_virial(sys_slow, neighbors, 0, needs_virial=needs_virial)
        f_fast, _ = forces_virial(sys_fast, None, 0)
        aux = {"forces": f_slow + f_fast, "virial": v,
               "f_slow": f_slow, "f_fast": f_fast}
        for c in self.coupling:
            if hasattr(c, "init_state"):
                aux["mc_baro"] = c.init_state(sys)
        return aux

    def step(self, sys, neighbors, aux, step_n, key, needs_virial=False):
        dt = self.dt
        n_sub = self.n_substeps
        dt_f = dt / n_sub
        # slow half kick
        vels = sys.velocities + 0.5 * dt * _accels(sys, aux["f_slow"])
        sys = sys.update(velocities=vels)

        sys_fast, sys_slow = _split_fast_slow(sys)

        def inner(carry, _):
            coords, vels, f_fast = carry
            vels = vels + 0.5 * dt_f * _accels(sys, f_fast)
            coords = coords + dt_f * vels
            f_new, _ = forces_virial(sys_fast.update(coords=coords), None, step_n)
            vels = vels + 0.5 * dt_f * _accels(sys, f_new)
            return (coords, vels, f_new), None

        (coords, vels, f_fast), _ = jax.lax.scan(
            inner, (sys.coords, vels, aux["f_fast"]), None, length=n_sub)
        coords = sys.boundary.wrap(coords)
        coords = _place_virtual_sites(sys, coords)
        sys = sys.update(coords=coords, velocities=vels)
        f_slow, v = forces_virial(sys_slow.update(coords=coords), neighbors,
                                  step_n, needs_virial=needs_virial)
        vels = sys.velocities + 0.5 * dt * _accels(sys, f_slow)
        sys = sys.update(velocities=vels)
        aux = {**aux, "forces": f_slow + f_fast, "virial": v,
               "f_slow": f_slow, "f_fast": f_fast}
        return self._finish_step(sys, neighbors, aux, step_n, key, needs_virial)


_register(MTSIntegrator, ["dt", "coupling"], ["n_substeps", "remove_cm"])


@dataclasses.dataclass(frozen=True)
class MTSLangevinIntegrator(MTSIntegrator):
    """BAOAB-RESPA: rRESPA with an Ornstein-Uhlenbeck middle step
    (simulators.jl:1800-1940)."""

    dt: float = 0.002
    temperature: float = 300.0
    friction: float = 1.0
    n_substeps: int = dataclasses.field(default=4, metadata={"static": True})
    coupling: tuple = ()
    remove_cm: bool = dataclasses.field(default=True, metadata={"static": True})

    def step(self, sys, neighbors, aux, step_n, key, needs_virial=False):
        dt = self.dt
        n_sub = self.n_substeps
        dt_f = dt / n_sub
        m = sys.masses
        safe_m = jnp.where(m > 0, m, 1.0)
        vels = sys.velocities + 0.5 * dt * _accels(sys, aux["f_slow"])
        sys = sys.update(velocities=vels)
        sys_fast, sys_slow = _split_fast_slow(sys)

        def inner(carry, sub_key):
            coords, vels, f_fast = carry
            vels = vels + 0.5 * dt_f * _accels(sys, f_fast)
            coords = coords + 0.5 * dt_f * vels
            c1 = jnp.exp(-self.friction * dt_f)
            sigma = jnp.sqrt(KB * self.temperature / safe_m) * jnp.sqrt(1.0 - c1 ** 2)
            noise = jax.random.normal(sub_key, vels.shape, dtype=coords.dtype)
            vels = c1 * vels + jnp.where((m > 0)[:, None],
                                         sigma[:, None] * noise, 0.0)
            coords = coords + 0.5 * dt_f * vels
            f_new, _ = forces_virial(sys_fast.update(coords=coords), None, step_n)
            vels = vels + 0.5 * dt_f * _accels(sys, f_new)
            return (coords, vels, f_new), None

        keys = jax.random.split(key, n_sub)
        (coords, vels, f_fast), _ = jax.lax.scan(
            inner, (sys.coords, vels, aux["f_fast"]), keys)
        coords = sys.boundary.wrap(coords)
        coords = _place_virtual_sites(sys, coords)
        sys = sys.update(coords=coords, velocities=vels)
        f_slow, v = forces_virial(sys_slow.update(coords=coords), neighbors,
                                  step_n, needs_virial=needs_virial)
        vels = sys.velocities + 0.5 * dt * _accels(sys, f_slow)
        sys = sys.update(velocities=vels)
        aux = {**aux, "forces": f_slow + f_fast, "virial": v,
               "f_slow": f_slow, "f_fast": f_fast}
        return self._finish_step(sys, neighbors, aux, step_n, key, needs_virial)


_register(MTSLangevinIntegrator, ["dt", "temperature", "friction", "coupling"],
          ["n_substeps", "remove_cm"])
