"""Bias potentials acting on collective variables.

Parity with /root/reference/src/bias/bias.jl: LinearBias, SquareBias,
FlatBottomSquareBias, PeriodicFlatBottomBias and the BiasPotential wrapper
(:28-328). A BiasPotential is a general interaction (forces via autodiff of
bias(cv(coords)) — the reference chains cv_gradient by hand)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.general import GeneralInteraction


def _register(cls, data_fields, meta_fields=()):
    jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )
    return cls


@dataclasses.dataclass(frozen=True)
class LinearBias:
    """U = k * cv."""

    k: jax.Array = 1.0

    def __call__(self, cv):
        return self.k * cv


_register(LinearBias, ["k"])


@dataclasses.dataclass(frozen=True)
class SquareBias:
    """U = k/2 (cv - cv0)^2 (umbrella restraint)."""

    k: jax.Array = 1000.0
    cv0: jax.Array = 0.0

    def __call__(self, cv):
        return 0.5 * self.k * (cv - self.cv0) ** 2


_register(SquareBias, ["k", "cv0"])


@dataclasses.dataclass(frozen=True)
class FlatBottomSquareBias:
    """Zero inside |cv - cv0| < width/2, harmonic outside."""

    k: jax.Array = 1000.0
    cv0: jax.Array = 0.0
    width: jax.Array = 0.1

    def __call__(self, cv):
        d = jnp.abs(cv - self.cv0) - 0.5 * self.width
        return 0.5 * self.k * jnp.where(d > 0, d, 0.0) ** 2


_register(FlatBottomSquareBias, ["k", "cv0", "width"])


@dataclasses.dataclass(frozen=True)
class PeriodicFlatBottomBias:
    """Flat-bottom harmonic on a periodic CV (e.g. a torsion), with the
    difference wrapped into (-period/2, period/2]."""

    k: jax.Array = 1000.0
    cv0: jax.Array = 0.0
    width: jax.Array = 0.1
    period: jax.Array = 2.0 * jnp.pi

    def __call__(self, cv):
        diff = cv - self.cv0
        diff = diff - self.period * jnp.round(diff / self.period)
        d = jnp.abs(diff) - 0.5 * self.width
        return 0.5 * self.k * jnp.where(d > 0, d, 0.0) ** 2


_register(PeriodicFlatBottomBias, ["k", "cv0", "width", "period"])


@dataclasses.dataclass(frozen=True)
class BiasPotential(GeneralInteraction):
    """bias(cv(coords)) as a general interaction (bias/bias.jl BiasPotential)."""

    bias: object = None
    cv: object = None

    def energy(self, coords, boundary, atoms):
        return self.bias(self.cv.value(coords, boundary))


_register(BiasPotential, ["bias", "cv"])
