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
    """Long-range LJ tail correction beyond a hard distance cutoff, with the
    reference's precomputed-factor form (lennard_jones.jl:163-270):

        E = (factor_6 + factor_12) / V
        factor_6  = 8 pi N^2 (-<eps sigma^6> / (3 rc^3))
        factor_12 = 8 pi N^2 (+<eps sigma^12> / (9 rc^9))

    with the pair means over unordered pairs including the diagonal. The
    factors assume sigma/epsilon fixed after setup; only V may change (NPT).
    Forces are zero; the mechanical tail virial is W_dd = 2 U6 + 4 U12
    (r^-n term contributes (n/3) U_n per diagonal component).

    Build via mollytpu.models.setup.make_dispersion_correction.
    """

    factor_6: float = 0.0
    factor_12: float = 0.0
    dist_cutoff: float = 1.0

    def energy(self, coords, boundary, atoms):
        return (self.factor_6 + self.factor_12) / boundary.volume()

    def force_virial(self, coords, boundary, atoms, needs_virial=False):
        d = coords.shape[1]
        vir = jnp.zeros((d, d), dtype=coords.dtype)
        if needs_virial:
            vol = boundary.volume()
            u6 = self.factor_6 / vol
            u12 = self.factor_12 / vol
            vir = jnp.eye(d, dtype=coords.dtype) * (2.0 * u6 + 4.0 * u12)
        return jnp.zeros_like(coords), vir


_register(LJDispersionCorrection, ["factor_6", "factor_12", "dist_cutoff"])
