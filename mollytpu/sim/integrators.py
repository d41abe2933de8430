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

Carry contract: inside a simulate() chunk only ``coords``, ``velocities``
and ``boundary`` (plus ``aux`` and the RNG key) are threaded between steps;
every other System field is closed over as a constant. A custom simulator's
``step`` must therefore confine its per-step mutations to those three fields
(put anything else in ``aux``) — updates to e.g. ``atoms`` or interaction
parameters are silently dropped at the next step. See simulate.py's carry
discipline note for why (tens-of-MB loop-invariant pytree leaves).
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
    """Legacy MTS split: bonded terms are the fast group, nonbonded +
    general the slow group (the default when no per-interaction fractions
    are given)."""
    sys_fast = sys.update(pairwise_inters=(), general_inters=())
    sys_slow = sys.update(specific_lists=())
    return sys_fast, sys_slow


def _mts_fractions(sim, sys):
    """Resolve + validate per-interaction evaluation fractions
    (simulators.jl setup_mts_integrator :1718-1738 +
    mts_interaction_groups :1759-1783). Returns (ordered_fractions,
    per-level interaction subsets). With no fractions given, falls back to
    the classic bonded-fast / nonbonded-slow split at n_substeps."""
    np_, ns, ng = (len(sys.pairwise_inters), len(sys.specific_lists),
                   len(sys.general_inters))
    pf, sf, gf = sim.pi_fractions, sim.si_fractions, sim.gi_fractions
    if not (pf or sf or gf):
        pf = (1,) * np_
        gf = (1,) * ng
        sf = (sim.n_substeps,) * ns
    if len(pf) != np_:
        raise ValueError(f"system has {np_} pairwise interactions but "
                         f"pi_fractions has {len(pf)}")
    if len(sf) != ns:
        raise ValueError(f"system has {ns} specific interaction lists but "
                         f"si_fractions has {len(sf)}")
    if len(gf) != ng:
        raise ValueError(f"system has {ng} general interactions but "
                         f"gi_fractions has {len(gf)}")
    allf = tuple(pf) + tuple(sf) + tuple(gf)
    if not allf:
        raise ValueError("MTS integrator requires at least one interaction")
    fractions = tuple(sorted(set(int(f) for f in allf)))
    if fractions[0] < 1:
        raise ValueError(f"MTS fraction {fractions[0]} cannot be < 1")
    if fractions[0] != 1:
        raise ValueError("MTS fractions must include 1, lowest is "
                         f"{fractions[0]}")
    for a, b in zip(fractions, fractions[1:]):
        if b % a != 0:
            raise ValueError(f"MTS fraction {b} not a multiple of {a}")
    groups = []
    for f in fractions:
        groups.append(sys.update(
            pairwise_inters=tuple(p for p, x in zip(sys.pairwise_inters, pf)
                                  if x == f),
            specific_lists=tuple(s for s, x in zip(sys.specific_lists, sf)
                                 if x == f),
            general_inters=tuple(g for g, x in zip(sys.general_inters, gf)
                                 if x == f)))
    return fractions, groups


@dataclasses.dataclass(frozen=True)
class MTSIntegrator(_IntegratorBase):
    """rRESPA multiple time stepping with per-interaction evaluation
    fractions (simulators.jl:1616-1845, mts_substeps! :1800).

    pi_fractions / si_fractions / gi_fractions give the number of times each
    pairwise / specific / general interaction is evaluated per outer step
    (e.g. gi_fractions=(1,) with pi_fractions=(2,) evaluates PME once and
    the real-space pair kernel twice per outer dt). Fractions must include 1
    and each must divide the next. With none given, the classic bonded-fast
    (n_substeps) / nonbonded-slow split applies.

    The recursion over fraction levels is unrolled at trace time (fractions
    are static), so XLA sees one flat substep program per outer step.
    """

    dt: float
    n_substeps: int = dataclasses.field(default=4, metadata={"static": True})
    pi_fractions: tuple = dataclasses.field(default=(), metadata={"static": True})
    si_fractions: tuple = dataclasses.field(default=(), metadata={"static": True})
    gi_fractions: tuple = dataclasses.field(default=(), metadata={"static": True})
    coupling: tuple = ()
    remove_cm: bool = dataclasses.field(default=True, metadata={"static": True})

    def init_aux(self, sys, neighbors, needs_virial=False):
        fractions, groups = _mts_fractions(self, sys)
        aux = {}
        total = None
        for i, g in enumerate(groups):
            f, _ = forces_virial(g, neighbors, 0)
            aux[f"f_lvl{i}"] = f
            total = f if total is None else total + f
        aux["forces"] = total
        if needs_virial:
            _, v = forces_virial(sys, neighbors, 0, needs_virial=True)
        else:
            v = jnp.zeros((3, 3), dtype=sys.coords.dtype)
        aux["virial"] = v
        for c in self.coupling:
            if hasattr(c, "init_state"):
                aux["mc_baro"] = c.init_state(sys)
        return aux

    # innermost coordinate move: plain VV drift + SHAKE
    def _coord_update(self, sys, coords, vels, dt_x, key):
        coords_prev = coords
        coords = coords + dt_x * vels
        coords, vels = _apply_position_constraints(sys, coords_prev, coords,
                                                   vels, dt_x)
        return sys.boundary.wrap(coords), vels

    def step(self, sys, neighbors, aux, step_n, key, needs_virial=False):
        fractions, groups = _mts_fractions(self, sys)
        n_levels = len(fractions)
        fl = [aux[f"f_lvl{i}"] for i in range(n_levels)]
        total_sub = fractions[-1]
        keys = list(jax.random.split(key, total_sub + 1))
        key_out = keys.pop()

        def recurse(level, coords, vels, n_parent):
            n_sub = fractions[level]
            dt_x = self.dt / n_sub
            dt_v = 0.5 * dt_x
            for _ in range(n_sub // n_parent):
                vels = vels + dt_v * _accels(sys, fl[level])
                if level == n_levels - 1:
                    coords, vels = self._coord_update(sys, coords, vels,
                                                      dt_x, keys.pop())
                else:
                    coords, vels = recurse(level + 1, coords, vels, n_sub)
                fl[level], _ = forces_virial(
                    groups[level].update(coords=coords), neighbors, step_n)
                vels = vels + dt_v * _accels(sys, fl[level])
            return coords, vels

        coords, vels = recurse(0, sys.coords, sys.velocities, 1)
        vels = _apply_velocity_constraints(sys, coords, vels)
        coords = _place_virtual_sites(sys, coords)
        sys = sys.update(coords=coords, velocities=vels)
        total = fl[0]
        for f in fl[1:]:
            total = total + f
        aux = {**aux, **{f"f_lvl{i}": fl[i] for i in range(n_levels)},
               "forces": total}
        if needs_virial:
            # virial evaluated with ALL interactions at the final
            # configuration (simulators.jl:1913-1921)
            f_all, v = forces_virial(sys, neighbors, step_n,
                                     needs_virial=True)
            aux = {**aux, "forces": f_all, "virial": v}
        sys, aux = self._finish_step(sys, neighbors, aux, step_n, key_out,
                                     needs_virial)
        from .coupling import couplers_invalidate_forces
        if self.coupling and couplers_invalidate_forces(self.coupling):
            # coupling moved coords/box: refresh the per-level forces too
            _, groups2 = _mts_fractions(self, sys)
            for i, g in enumerate(groups2):
                f, _ = forces_virial(g, neighbors, step_n)
                aux[f"f_lvl{i}"] = f
        return sys, aux


_register(MTSIntegrator, ["dt", "coupling"],
          ["n_substeps", "pi_fractions", "si_fractions", "gi_fractions",
           "remove_cm"])


@dataclasses.dataclass(frozen=True)
class MTSLangevinIntegrator(MTSIntegrator):
    """BAOAB-RESPA: rRESPA with an Ornstein-Uhlenbeck middle step in the
    innermost coordinate update (simulators.jl:1789-1798, 1846-1940);
    per-interaction fractions as in MTSIntegrator."""

    dt: float = 0.002
    temperature: float = 300.0
    friction: float = 1.0
    n_substeps: int = dataclasses.field(default=4, metadata={"static": True})
    pi_fractions: tuple = dataclasses.field(default=(), metadata={"static": True})
    si_fractions: tuple = dataclasses.field(default=(), metadata={"static": True})
    gi_fractions: tuple = dataclasses.field(default=(), metadata={"static": True})
    coupling: tuple = ()
    remove_cm: bool = dataclasses.field(default=True, metadata={"static": True})

    def _coord_update(self, sys, coords, vels, dt_x, key):
        m = sys.masses
        safe_m = jnp.where(m > 0, m, 1.0)
        coords_prev = coords
        coords = coords + 0.5 * dt_x * vels
        c1 = jnp.exp(-self.friction * dt_x)
        sigma = jnp.sqrt(KB * self.temperature / safe_m) * jnp.sqrt(
            1.0 - c1 ** 2)
        noise = jax.random.normal(key, vels.shape, dtype=coords.dtype)
        vels = c1 * vels + jnp.where((m > 0)[:, None],
                                     sigma[:, None] * noise, 0.0)
        coords = coords + 0.5 * dt_x * vels
        coords, vels = _apply_position_constraints(sys, coords_prev, coords,
                                                   vels, dt_x)
        return sys.boundary.wrap(coords), vels


_register(MTSLangevinIntegrator, ["dt", "temperature", "friction", "coupling"],
          ["n_substeps", "pi_fractions", "si_fractions", "gi_fractions",
           "remove_cm"])
