"""Non-bonded parameter mixing rules.

Parity with /root/reference/src/mixing.jl. Mixing rules are stateless tags
applied per pair; the NBFix mechanism (MixingException) is re-designed for
XLA as a fixed-size exception table scanned branch-free per pair — the same
idea as the reference's GPU-safe ExceptionList (src/mixing.jl:75-119), which
beats a dense (n_types, n_types) gather for the few-exception common case.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


class LorentzMixing:
    def __eq__(self, other):
        return type(other) is type(self)

    def __hash__(self):
        return hash(type(self))

    @staticmethod
    def mix(x, y):
        return (x + y) * 0.5


class GeometricMixing:
    def __eq__(self, other):
        return type(other) is type(self)

    def __hash__(self):
        return hash(type(self))

    @staticmethod
    def mix(x, y):
        return jnp.sqrt(x * y)


class WaldmanHaglerMixing:
    def __eq__(self, other):
        return type(other) is type(self)

    def __hash__(self):
        return hash(type(self))

    """sigma: sixth-power mean; epsilon uses the paired WH formula."""

    @staticmethod
    def mix_sigma(si, sj):
        return ((si**6 + sj**6) * 0.5) ** (1.0 / 6.0)

    @staticmethod
    def mix_epsilon(ei, ej, si, sj):
        s6 = si**6 + sj**6
        return 2.0 * jnp.sqrt(ei * ej) * (si**3 * sj**3) / jnp.maximum(s6, 1e-30)


class FenderHalseyMixing:
    def __eq__(self, other):
        return type(other) is type(self)

    def __hash__(self):
        return hash(type(self))

    @staticmethod
    def mix(x, y):
        return 2.0 * x * y / jnp.maximum(x + y, 1e-30)


class InverseMixing:
    def __eq__(self, other):
        return type(other) is type(self)

    def __hash__(self):
        return hash(type(self))

    """Harmonic mean, used for Buckingham B (src/mixing.jl:57-60)."""

    @staticmethod
    def mix(x, y):
        return 2.0 / (1.0 / x + 1.0 / y)


class MinimumMixing:
    def __eq__(self, other):
        return type(other) is type(self)

    def __hash__(self):
        return hash(type(self))

    """min(1, min(li, lj)) — alchemical lambda mixing (src/mixing.jl:122-125)."""

    @staticmethod
    def mix(x, y):
        return jnp.minimum(1.0, jnp.minimum(x, y))


@dataclasses.dataclass(frozen=True, eq=True)
class ExceptionTable:
    """NBFix pair overrides: parallel key tuples (type_i, type_j) -> value.

    Stored as plain tuples so the table is hashable and can live in the
    static (trace-time constant) part of an interaction pytree; the few
    exception entries become compiled constants. Branch-free lookup: scan
    all K exceptions, select the last match (matches get_pair over
    ExceptionList, src/mixing.jl:90-101).
    """

    keys_i: tuple  # (K,) int atom-type ids
    keys_j: tuple
    values: tuple  # (K,) floats

    def lookup(self, ti, tj, default):
        ki = jnp.asarray(self.keys_i, dtype=jnp.int32)
        kj = jnp.asarray(self.keys_j, dtype=jnp.int32)
        vals = jnp.asarray(self.values, dtype=jnp.result_type(default))
        hit = ((ki == ti) & (kj == tj)) | ((ki == tj) & (kj == ti))
        any_hit = jnp.any(hit)
        # Last matching value, like the reference loop.
        idx = jnp.max(jnp.where(hit, jnp.arange(len(self.keys_i)), -1))
        val = vals[jnp.maximum(idx, 0)]
        return jnp.where(any_hit, val, default)


@dataclasses.dataclass(frozen=True, eq=True)
class MixingException:
    """Wrap a base mixing rule with an NBFix exception table
    (src/mixing.jl:103-119). Fully static/hashable."""

    mixing: object
    exceptions: ExceptionTable = None

    def mix_with_types(self, x, y, ti, tj):
        default = self.mixing.mix(x, y)
        if self.exceptions is None:
            return default
        return self.exceptions.lookup(ti, tj, default)


def mix_sigma(rule, ai, aj):
    if isinstance(rule, WaldmanHaglerMixing):
        return rule.mix_sigma(ai.sigma, aj.sigma)
    if isinstance(rule, MixingException):
        return rule.mix_with_types(ai.sigma, aj.sigma, ai.atom_type, aj.atom_type)
    return rule.mix(ai.sigma, aj.sigma)


def mix_epsilon(rule, ai, aj):
    if isinstance(rule, WaldmanHaglerMixing):
        return rule.mix_epsilon(ai.epsilon, aj.epsilon, ai.sigma, aj.sigma)
    if isinstance(rule, MixingException):
        return rule.mix_with_types(ai.epsilon, aj.epsilon, ai.atom_type, aj.atom_type)
    return rule.mix(ai.epsilon, aj.epsilon)


def mix_lambda(rule, ai, aj):
    if isinstance(rule, MixingException):
        return rule.mix_with_types(ai.lam, aj.lam, ai.atom_type, aj.atom_type)
    return rule.mix(ai.lam, aj.lam)
