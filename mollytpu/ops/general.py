"""General (whole-system) interactions.

Parity with the reference's AtomsCalculators-style general interactions
(src/force.jl:792, src/interactions/muller_brown.jl, the LJ dispersion
correction in src/interactions/lennard_jones.jl, PME in ewald.py, GBSA in
gbsa.py). Protocol:

    energy(coords, boundary, atoms) -> scalar
    force_virial(coords, boundary, atoms, needs_virial) -> (forces, virial)

The default force_virial autodiffs the energy w.r.t. coordinates, and forms
the virial from per-atom force dot position relative to box-wrapped
coordinates only when a subclass provides it; implementations with long-range
box-dependent terms (PME, dispersion correction) override it with analytic
virials.
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


class GeneralInteraction:
    """Mixin with autodiff default forces. The virial for a general
    interaction whose energy depends only on MIC displacements is
    sum_i r_i (x) f_i evaluated with a box-derivative trick: here we use the
    scaling-derivative formula W = -dE/d(eps) under an affine box strain,
    computed by differentiating through a virtual isotropic scale factor."""

    def force_virial(self, coords, boundary, atoms, needs_virial=False):
        grad = jax.grad(lambda c: self.energy(c, boundary, atoms))(coords)
        forces = -grad
        d = coords.shape[1]
        if needs_virial:
            # dE/d eps under x -> (1+eps) x, box -> (1+eps) box, evaluated by JVP.
            def scaled_energy(eps):
                b = boundary.scale(1.0 + eps)
                return self.energy(coords * (1.0 + eps), b, atoms)

            dE = jax.grad(scaled_energy)(jnp.zeros((), dtype=coords.dtype))
            # Isotropic virial estimate: W_aa = -dE/deps / d per axis.
            vir = -jnp.eye(d, dtype=coords.dtype) * (dE / d)
        else:
            vir = jnp.zeros((d, d), dtype=coords.dtype)
        return forces, vir


@dataclasses.dataclass(frozen=True)
class MullerBrown(GeneralInteraction):
    """Muller-Brown 2D test surface (muller_brown.jl). Acts on every atom's
    (x, y) coordinates independently."""

    A: jax.Array = None
    a: jax.Array = None
    b: jax.Array = None
    c: jax.Array = None
    x0: jax.Array = None
    y0: jax.Array = None

    def __post_init__(self):
        defaults = {
            "A": jnp.asarray([-200.0, -100.0, -170.0, 15.0]),
            "a": jnp.asarray([-1.0, -1.0, -6.5, 0.7]),
            "b": jnp.asarray([0.0, 0.0, 11.0, 0.6]),
            "c": jnp.asarray([-10.0, -10.0, -6.5, 0.7]),
            "x0": jnp.asarray([1.0, 0.0, -0.5, -1.0]),
            "y0": jnp.asarray([0.0, 0.5, 1.5, 1.0]),
        }
        for k, v in defaults.items():
            if getattr(self, k) is None:
                object.__setattr__(self, k, v)

    def energy(self, coords, boundary, atoms):
        x = coords[:, 0:1]
        y = coords[:, 1:2]
        e = self.A * jnp.exp(self.a * (x - self.x0) ** 2
                             + self.b * (x - self.x0) * (y - self.y0)
                             + self.c * (y - self.y0) ** 2)
        return jnp.sum(e)


_register(MullerBrown, ["A", "a", "b", "c", "x0", "y0"])


@dataclasses.dataclass(frozen=True)
class LJDispersionCorrection(GeneralInteraction):
    """Long-range LJ tail correction beyond the cutoff with analytic virial
    (lennard_jones.jl LJDispersionCorrection): E = -2 pi N^2 <C6> / (3 V rc^3)
    using the mean C6 = 4 eps sigma^6 over all atom pairs.

    Coordinates do not enter: forces are zero, but the energy and virial
    depend on the box volume, which matters for NPT.
    """

    dist_cutoff: float = 1.0

    def energy(self, coords, boundary, atoms):
        n = coords.shape[0]
        sig = atoms.sigma
        eps = atoms.epsilon
        # <C6> over pairs with Lorentz-Berthelot mixing ~ mean over the outer
        # products; computed exactly via moment sums in O(N).
        # C6_ij = 4 eps_ij sigma_ij^6, sigma_ij = (si+sj)/2, eps_ij = sqrt(ei ej)
        # Expand sigma_ij^6 via binomial moments of si^k.
        se = jnp.sqrt(jnp.maximum(eps, 0.0))
        mom = [jnp.sum(se * sig ** k) for k in range(7)]
        binom = [1.0, 6.0, 15.0, 20.0, 15.0, 6.0, 1.0]
        pair_sum = 0.0
        for k in range(7):
            pair_sum = pair_sum + binom[k] * mom[k] * mom[6 - k]
        c6_sum = 4.0 * pair_sum / 64.0  # ((si+sj)/2)^6 expansion
        vol = boundary.volume()
        return -2.0 * jnp.pi * c6_sum / (3.0 * vol * self.dist_cutoff ** 3)

    def force_virial(self, coords, boundary, atoms, needs_virial=False):
        d = coords.shape[1]
        vir = jnp.zeros((d, d), dtype=coords.dtype)
        if needs_virial:
            # E ~ 1/V: under isotropic strain dE/deps = -3 E; W_aa = E per axis
            # (standard result: virial of the tail correction equals 3 E_tail
            # distributed isotropically -> scalar virial W = 3 E).
            e = self.energy(coords, boundary, atoms)
            vir = jnp.eye(d, dtype=coords.dtype) * e
        return jnp.zeros_like(coords), vir


_register(LJDispersionCorrection, ["dist_cutoff"])
