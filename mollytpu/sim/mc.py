"""Metropolis Monte Carlo in configuration space.

Parity with the reference's MetropolisMonteCarlo + trial moves
(/root/reference/src/simulators.jl:2216-2341): each step proposes a trial
move (by default a random single-atom translation), accepts on
exp(-dU / kB T). Runs as a jitted scan; acceptance statistics are returned.

Trial moves: random_uniform_translation / random_normal_translation
(simulators.jl:2300-2341) — one randomly chosen atom per step, as in the
reference.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..units import KB
from ..forces import potential_energy


def random_uniform_translation(shift_size=0.1):
    """Move one random atom by U(-shift, shift) per axis."""

    def move(key, coords, boundary):
        k1, k2 = jax.random.split(key)
        i = jax.random.randint(k1, (), 0, coords.shape[0])
        delta = jax.random.uniform(k2, (coords.shape[1],), dtype=coords.dtype,
                                   minval=-shift_size, maxval=shift_size)
        return coords.at[i].add(delta)

    return move


def random_normal_translation(shift_size=0.05):
    """Move one random atom by N(0, shift^2) per axis."""

    def move(key, coords, boundary):
        k1, k2 = jax.random.split(key)
        i = jax.random.randint(k1, (), 0, coords.shape[0])
        delta = shift_size * jax.random.normal(k2, (coords.shape[1],),
                                               dtype=coords.dtype)
        return coords.at[i].add(delta)

    return move


@dataclasses.dataclass(frozen=True)
class MetropolisMonteCarlo:
    temperature: float
    trial_move: object = dataclasses.field(default=None, metadata={"static": True})

    def __post_init__(self):
        if self.trial_move is None:
            object.__setattr__(self, "trial_move", random_uniform_translation())

    def simulate(self, sys, n_steps, key=None, neighbors=None):
        """Returns (final System, {"energies", "accepted", "acceptance_rate"})."""
        if key is None:
            key = jax.random.PRNGKey(0)
        kt = KB * self.temperature

        def body(carry, _):
            coords, e_cur, n_acc, key = carry
            key, k1, k2 = jax.random.split(key, 3)
            trial = self.trial_move(k1, coords, sys.boundary)
            trial = sys.boundary.wrap(trial)
            e_trial = potential_energy(sys.update(coords=trial), neighbors)
            accept = jax.random.uniform(k2, (), dtype=coords.dtype) < jnp.exp(
                jnp.minimum(-(e_trial - e_cur) / kt, 0.0))
            coords = jnp.where(accept, trial, coords)
            e_cur = jnp.where(accept, e_trial, e_cur)
            n_acc = n_acc + accept.astype(jnp.int32)
            return (coords, e_cur, n_acc, key), e_cur

        e0 = potential_energy(sys, neighbors)
        (coords, e_fin, n_acc, _), es = jax.lax.scan(
            body, (sys.coords, e0, jnp.zeros((), jnp.int32), key), None,
            length=n_steps)
        return sys.update(coords=coords), {
            "energies": es, "accepted": n_acc,
            "acceptance_rate": n_acc / n_steps}


jax.tree_util.register_dataclass(
    MetropolisMonteCarlo, data_fields=["temperature"], meta_fields=["trial_move"],
)
