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
    @staticmethod
    def mix(x, y):
        return (x + y) * 0.5


class GeometricMixing:
    @staticmethod
    def mix(x, y):
        return jnp.sqrt(x * y)


class WaldmanHaglerMixing:
    """sigma: sixth-power mean; epsilon uses the paired WH formula."""

    @staticmethod
    def mix_sigma(si, sj):
        return ((si**6 + sj**6) * 0.5) ** (1.0 / 6.0)

    @staticmethod
    def mix_epsilon(ei, ej, si, sj):
        s6 = si**6 + sj**6
        return 2.0 * jnp.sqrt(ei * ej) * (si**3 * sj**3) / jnp.maximum(s6, 1e-30)


class FenderHalseyMixing:
    @staticmethod
    def mix(x, y):
        return 2.0 * x * y / jnp.maximum(x + y, 1e-30)


class InverseMixing:
    """Harmonic mean, used for Buckingham B (src/mixing.jl:57-60)."""

    @staticmethod
    def mix(x, y):
        return 2.0 / (1.0 / x + 1.0 / y)


class MinimumMixing:
    """min(1, min(li, lj)) — alchemical lambda mixing (src/mixing.jl:122-125)."""

    @staticmethod
    def mix(x, y):
        return jnp.minimum(1.0, jnp.minimum(x, y))


@dataclasses.dataclass(frozen=True)
class ExceptionTable:
    """NBFix pair overrides: parallel key arrays (type_i, type_j) -> value.

    Branch-free lookup: scan all K exceptions, select the last match
    (matches get_pair over ExceptionList, src/mixing.jl:90-101).
    """

    keys_i: jax.Array  # (K,) int32 atom types
    keys_j: jax.Array  # (K,) int32
    values: jax.Array  # (K,)

    def lookup(self, ti, tj, default):
        hit = ((self.keys_i == ti) & (self.keys_j == tj)) | (
            (self.keys_i == tj) & (self.keys_j == ti)
        )
        any_hit = jnp.any(hit)
        # Last matching value, like the reference loop.
        idx = jnp.max(jnp.where(hit, jnp.arange(self.keys_i.shape[0]), -1))
        val = self.values[jnp.maximum(idx, 0)]
        return jnp.where(any_hit, val, default)


jax.tree_util.register_dataclass(
    ExceptionTable, data_fields=["keys_i", "keys_j", "values"], meta_fields=[]
)


@dataclasses.dataclass(frozen=True)
class MixingException:
    """Wrap a base mixing rule with an NBFix exception table
    (src/mixing.jl:103-119). `mixing` is the base rule (static), the table is
    a pytree of arrays."""

    mixing: object = dataclasses.field(metadata={"static": True})
    exceptions: ExceptionTable = None

    def mix_with_types(self, x, y, ti, tj):
        default = self.mixing.mix(x, y)
        if self.exceptions is None:
            return default
        return self.exceptions.lookup(ti, tj, default)


jax.tree_util.register_dataclass(
    MixingException, data_fields=["exceptions"], meta_fields=["mixing"]
)


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
