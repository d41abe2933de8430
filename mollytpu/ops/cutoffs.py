"""Cutoff strategies for pairwise interactions.

Parity with /root/reference/src/cutoffs.jl (NoCutoff :52, DistanceCutoff :72,
ShiftedPotentialCutoff :99, ShiftedForceCutoff :133, CubicSplineCutoff :174,
PolynomialCutoff :229).

TPU-native design: the reference dispatches hand-written force/energy pairs
through a "phases" type parameter. Here a cutoff is a transform on the scalar
energy function u(r) — forces then come from JAX autodiff of the composed
energy, so force == -dE/dr holds for every cutoff by construction. All
branches are jnp.where masks (no data-dependent control flow under jit).

Numerical-safety contract: callers must pass r already clamped away from 0
for masked/self pairs; these functions are finite for r > 0.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _register(cls, data_fields, meta_fields=()):
    jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )
    return cls


@dataclasses.dataclass(frozen=True)
class NoCutoff:
    def apply(self, u, r):
        return u(r)


_register(NoCutoff, [])


@dataclasses.dataclass(frozen=True)
class DistanceCutoff:
    dist_cutoff: float

    def apply(self, u, r):
        rc = self.dist_cutoff
        return jnp.where(r <= rc, u(jnp.minimum(r, rc)), 0.0)


_register(DistanceCutoff, [], ["dist_cutoff"])


@dataclasses.dataclass(frozen=True)
class ShiftedPotentialCutoff:
    dist_cutoff: float

    def apply(self, u, r):
        rc = self.dist_cutoff
        inside = r <= rc
        return jnp.where(inside, u(jnp.minimum(r, rc)) - u(rc), 0.0)


_register(ShiftedPotentialCutoff, [], ["dist_cutoff"])


@dataclasses.dataclass(frozen=True)
class ShiftedForceCutoff:
    dist_cutoff: float

    def apply(self, u, r):
        rc = jnp.asarray(self.dist_cutoff, dtype=jnp.result_type(r))
        inside = r <= rc
        du_rc = jax.grad(u)(rc)
        rs = jnp.minimum(r, rc)
        return jnp.where(inside, u(rs) - u(rc) - (rs - rc) * du_rc, 0.0)


_register(ShiftedForceCutoff, [], ["dist_cutoff"])


@dataclasses.dataclass(frozen=True)
class CubicSplineCutoff:
    """Hermite spline from (r_a, U(r_a), U'(r_a)) to (r_c, 0, 0); raw potential
    below r_a (src/cutoffs.jl:174-201)."""

    dist_activation: float
    dist_cutoff: float

    def apply(self, u, r):
        ra = jnp.asarray(self.dist_activation, dtype=jnp.result_type(r))
        rc = self.dist_cutoff
        width = rc - ra
        t = jnp.clip((r - ra) / width, 0.0, 1.0)
        pe_a = u(ra)
        dpe_a = jax.grad(u)(ra)
        spline = (2 * t**3 - 3 * t**2 + 1) * pe_a + (t**3 - 2 * t**2 + t) * width * dpe_a
        raw = u(jnp.minimum(r, ra))
        return jnp.where(r <= ra, raw, jnp.where(r <= rc, spline, 0.0))


_register(CubicSplineCutoff, [], ["dist_activation", "dist_cutoff"])


@dataclasses.dataclass(frozen=True)
class PolynomialCutoff:
    """OpenMM 5th-order switching function (src/cutoffs.jl:229-253)."""

    dist_activation: float
    dist_cutoff: float

    def apply(self, u, r):
        ra = self.dist_activation
        rc = self.dist_cutoff
        t = jnp.clip((r - ra) / (rc - ra), 0.0, 1.0)
        s = 1 - 6 * t**5 + 15 * t**4 - 10 * t**3
        return jnp.where(r <= rc, s * u(jnp.minimum(r, rc)), 0.0)


_register(PolynomialCutoff, [], ["dist_activation", "dist_cutoff"])


def cutoff_distance(cutoff):
    """Outer interaction radius of a cutoff (None for NoCutoff) — used by the
    neighbor engine to size cells."""
    if isinstance(cutoff, NoCutoff):
        return None
    return float(cutoff.dist_cutoff)
