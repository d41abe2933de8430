"""Alchemical lambda schedulers.

Parity with /root/reference/src/free_energy/alchemy.jl: per-atom (lambda, role)
state is mapped to sterics/electrostatics scaling factors by a scheduler. All
schedulers are stateless tags; the piecewise schedules are expressed with
jnp.where so they trace under jit and differentiate w.r.t. lambda.

Roles: CORE=0, INSERT=1, DELETE=2 (see mollytpu.atoms).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..atoms import ALCH_CORE, ALCH_DELETE, ALCH_INSERT


def mix_roles(role_i, role_j):
    """Pair role: Insert dominates, then Delete, else Core
    (alchemy.jl mix_roles)."""
    either_insert = (role_i == ALCH_INSERT) | (role_j == ALCH_INSERT)
    either_delete = (role_i == ALCH_DELETE) | (role_j == ALCH_DELETE)
    return jnp.where(either_insert, ALCH_INSERT,
                     jnp.where(either_delete, ALCH_DELETE, ALCH_CORE))


def _piecewise(lam, role, insert_fn, delete_fn):
    return jnp.where(role == ALCH_INSERT, insert_fn(lam),
                     jnp.where(role == ALCH_DELETE, delete_fn(lam), lam))


class DefaultLambdaScheduler:
    """OpenFE-style split schedule: sterics first half for inserts, elec
    second half (alchemy.jl DefaultLambdaScheduler)."""

    @staticmethod
    def scale_sterics(lam, role):
        return _piecewise(
            lam, role,
            lambda l: jnp.where(l < 0.5, 2.0 * l, 1.0),
            lambda l: jnp.where(l < 0.5, 0.0, 2.0 * (l - 0.5)),
        )

    @staticmethod
    def scale_elec(lam, role):
        return _piecewise(
            lam, role,
            lambda l: jnp.where(l < 0.5, 0.0, 2.0 * (l - 0.5)),
            lambda l: jnp.where(l < 0.5, 2.0 * l, 1.0),
        )


class NAMDLambdaScheduler:
    @staticmethod
    def scale_sterics(lam, role):
        return _piecewise(
            lam, role,
            lambda l: jnp.where(l < 2.0 / 3.0, 1.5 * l, 1.0),
            lambda l: jnp.where(l < 1.0 / 3.0, 0.0, (l - 1.0 / 3.0) * 1.5),
        )

    scale_elec = DefaultLambdaScheduler.scale_elec


class QuartersLambdaScheduler:
    @staticmethod
    def scale_sterics(lam, role):
        return _piecewise(
            lam, role,
            lambda l: jnp.where(l < 0.5, 0.0, jnp.where(l > 0.75, 1.0, 4.0 * (l - 0.5))),
            lambda l: jnp.where(l < 0.25, 0.0, jnp.where(l > 0.5, 1.0, 4.0 * (l - 0.25))),
        )

    @staticmethod
    def scale_elec(lam, role):
        return _piecewise(
            lam, role,
            lambda l: jnp.where(l < 0.75, 0.0, 4.0 * (l - 0.75)),
            lambda l: jnp.where(l < 0.25, 4.0 * l, 1.0),
        )


class EleScaledLambdaScheduler:
    scale_sterics = DefaultLambdaScheduler.scale_sterics

    @staticmethod
    def scale_elec(lam, role):
        return _piecewise(
            lam, role,
            lambda l: jnp.where(l < 0.5, 0.0, jnp.sqrt(jnp.maximum(2.0 * (l - 0.5), 0.0))),
            lambda l: jnp.where(l < 0.5, (2.0 * l) ** 2, 1.0),
        )


def sterics_lambda(scheduler, lam_mixed, role_i, role_j):
    """Pairwise sterics scale; same non-core role on both atoms -> fully on
    (intra-perturbed-group interactions are never softened)."""
    same_noncore = (role_i == role_j) & (role_i != ALCH_CORE)
    pair_role = mix_roles(role_i, role_j)
    return jnp.where(same_noncore, 1.0,
                     scheduler.scale_sterics(lam_mixed, pair_role))


def elec_lambda(scheduler, lam_mixed, role_i, role_j):
    same_noncore = (role_i == role_j) & (role_i != ALCH_CORE)
    pair_role = mix_roles(role_i, role_j)
    return jnp.where(same_noncore, 1.0,
                     scheduler.scale_elec(lam_mixed, pair_role))


def scaled_charge(scheduler, charge, lam, role):
    """Per-atom effective charge q * scale_elec(lambda, role)
    (coulomb.jl:19)."""
    return charge * scheduler.scale_elec(lam, role)
