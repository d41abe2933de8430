"""Loggers / observables.

Parity with /root/reference/src/loggers.jl: GeneralObservableLogger (:68-131)
plus the derived loggers (:139-531) and accumulating loggers (:969-1260).

TPU-native design: a logger is a small object with an `interval` and a pure
`observe(sys, neighbors, aux, step_n) -> pytree` function; the simulate loop
runs in chunks sized by the logger intervals and calls observe between jitted
scan chunks, so logging never forces a host sync inside the hot loop
(SURVEY.md hard part 5: chunked scan + host callbacks).

Virial/pressure loggers advertise `needs_virial_interval` so the integrator
computes the virial only when something consumes it (reference:
loggers.jl:513-531 + needs_virial_schedule).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..units import KB
from ..forces import potential_energy, kinetic_energy, total_energy
from ..spatial import kinetic_energy_tensor, pressure_tensor, scalar_pressure


@dataclasses.dataclass
class GeneralObservableLogger:
    """Record observable(sys, neighbors, aux, step_n) every `interval` steps."""

    observable: callable
    interval: int = 1
    needs_virial_interval: int = 0

    def observe(self, sys, neighbors, aux, step_n):
        return self.observable(sys, neighbors, aux, step_n)


def TemperatureLogger(interval=1):
    def obs(sys, neighbors, aux, step_n):
        return 2.0 * kinetic_energy(sys) / (sys.n_dof * KB)

    return GeneralObservableLogger(obs, interval)


def CoordinatesLogger(interval=1):
    return GeneralObservableLogger(lambda s, n, a, i: s.coords, interval)


def VelocitiesLogger(interval=1):
    return GeneralObservableLogger(lambda s, n, a, i: s.velocities, interval)


def ForcesLogger(interval=1):
    return GeneralObservableLogger(lambda s, n, a, i: a["forces"], interval)


def KineticEnergyLogger(interval=1):
    return GeneralObservableLogger(lambda s, n, a, i: kinetic_energy(s), interval)


def PotentialEnergyLogger(interval=1):
    return GeneralObservableLogger(
        lambda s, n, a, i: potential_energy(s, n, i), interval)


def TotalEnergyLogger(interval=1):
    return GeneralObservableLogger(lambda s, n, a, i: total_energy(s, n, i), interval)


def VolumeLogger(interval=1):
    return GeneralObservableLogger(lambda s, n, a, i: s.boundary.volume(), interval)


def BoxLogger(interval=1):
    return GeneralObservableLogger(lambda s, n, a, i: s.boundary.box_matrix(), interval)


def DensityLogger(interval=1):
    """Mass density in internal units u/nm^3."""

    def obs(sys, neighbors, aux, step_n):
        return jnp.sum(sys.masses) / sys.boundary.volume()

    return GeneralObservableLogger(obs, interval)


def VirialLogger(interval=1):
    lg = GeneralObservableLogger(lambda s, n, a, i: a["virial"], interval)
    lg.needs_virial_interval = interval
    return lg


def ScalarVirialLogger(interval=1):
    lg = GeneralObservableLogger(lambda s, n, a, i: jnp.trace(a["virial"]), interval)
    lg.needs_virial_interval = interval
    return lg


def PressureLogger(interval=1):
    def obs(sys, neighbors, aux, step_n):
        kin_t = kinetic_energy_tensor(sys.masses, sys.velocities)
        return pressure_tensor(kin_t, aux["virial"], sys.boundary.volume())

    lg = GeneralObservableLogger(obs, interval)
    lg.needs_virial_interval = interval
    return lg


def ScalarPressureLogger(interval=1):
    def obs(sys, neighbors, aux, step_n):
        kin_t = kinetic_energy_tensor(sys.masses, sys.velocities)
        return scalar_pressure(kin_t, aux["virial"], sys.boundary.volume(), sys.n_dims)

    lg = GeneralObservableLogger(obs, interval)
    lg.needs_virial_interval = interval
    return lg


@dataclasses.dataclass
class AverageObservableLogger:
    """Accumulate a running mean instead of the full history
    (loggers.jl:1111-1178)."""

    observable: callable
    interval: int = 1
    needs_virial_interval: int = 0
    _sum: object = None
    _count: int = 0

    def observe(self, sys, neighbors, aux, step_n):
        v = self.observable(sys, neighbors, aux, step_n)
        self._sum = v if self._sum is None else self._sum + v
        self._count += 1
        return v

    @property
    def average(self):
        return self._sum / self._count if self._count else None


@dataclasses.dataclass
class TimeCorrelationLogger:
    """Record observables A(t), B(t) for post-hoc correlation analysis
    (loggers.jl:969-1109). Values are stored by the simulate loop like any
    logger; `correlation(values_A, values_B)` computes C(tau) afterward."""

    observable_a: callable
    observable_b: callable = None
    interval: int = 1
    needs_virial_interval: int = 0

    def observe(self, sys, neighbors, aux, step_n):
        a = self.observable_a(sys, neighbors, aux, step_n)
        b = a if self.observable_b is None else self.observable_b(sys, neighbors, aux, step_n)
        return (a, b)


def autocorrelation(series, n_lags=None):
    """Normalized autocorrelation of a (T, ...) stacked logger series."""
    x = jnp.asarray(series)
    x = x - jnp.mean(x, axis=0, keepdims=True)
    t = x.shape[0]
    n_lags = n_lags or t // 2
    flat = x.reshape(t, -1)
    denom = jnp.sum(flat * flat)
    out = []
    for lag in range(n_lags):
        out.append(jnp.sum(flat[: t - lag] * flat[lag:]) / denom)
    return jnp.stack(out)


@dataclasses.dataclass
class DisplacementsLogger:
    """Track displacements from a reference frame for MSD bookkeeping
    (loggers.jl:550). Records per-atom displacement vectors; pair with
    utils.analysis.msd."""

    interval: int = 1
    needs_virial_interval: int = 0
    reference: object = None

    def observe(self, sys, neighbors, aux, step_n):
        if self.reference is None:
            self.reference = sys.coords
        return sys.boundary.displacement(self.reference, sys.coords)


@dataclasses.dataclass
class ReplicaExchangeLogger:
    """Collects REMD exchange statistics (loggers.jl:1181). The REMD driver
    returns these in its info dict; this logger exists for API parity and
    accumulates externally-fed events."""

    n_replicas: int = 0
    n_exchanges: int = 0
    n_attempts: int = 0

    def record(self, accepted, attempted):
        self.n_exchanges += int(accepted)
        self.n_attempts += int(attempted)

    @property
    def exchange_rate(self):
        return self.n_exchanges / max(self.n_attempts, 1)


@dataclasses.dataclass
class MonteCarloLogger:
    """Accumulates MC acceptance statistics (loggers.jl:1232)."""

    n_trials: int = 0
    n_accepted: int = 0

    def record(self, accepted, trials=1):
        self.n_trials += int(trials)
        self.n_accepted += int(accepted)

    @property
    def acceptance_rate(self):
        return self.n_accepted / max(self.n_trials, 1)
