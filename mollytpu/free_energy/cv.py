"""Collective variables with autodiff gradients.

Parity with /root/reference/src/bias/cv.jl (CalcMinDist :60, CalcMaxDist,
CalcCMDist, CalcSingleDist, CalcDist, CalcRg, CalcRMSD with Kabsch
superposition, CalcTorsion :869). The reference hand-derives `cv_gradient`
per CV; here every CV is a pure function of coordinates and `cv_gradient` is
jax.grad — exact for all of them, including RMSD through the Kabsch solve.

Each CV is a small pytree with `value(coords, boundary) -> scalar`.
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


def _smooth_min(d, beta):
    return -jax.scipy.special.logsumexp(-beta * d) / beta


@dataclasses.dataclass(frozen=True)
class CalcSingleDist:
    """Minimum-image distance between two atoms."""

    i: int = dataclasses.field(metadata={"static": True})
    j: int = dataclasses.field(metadata={"static": True})

    def value(self, coords, boundary):
        dr = boundary.displacement(coords[self.i], coords[self.j])
        return jnp.sqrt(jnp.sum(dr * dr) + 1e-24)


_register(CalcSingleDist, [], ["i", "j"])


@dataclasses.dataclass(frozen=True)
class CalcDist:
    """Mean pairwise distance between two index groups."""

    group1: jax.Array = None
    group2: jax.Array = None

    def value(self, coords, boundary):
        c1 = coords[self.group1]
        c2 = coords[self.group2]
        dr = jax.vmap(lambda a: boundary.displacement(a[None, :], c2))(c1)
        d = jnp.sqrt(jnp.sum(dr * dr, axis=-1) + 1e-24)
        return jnp.mean(d)


_register(CalcDist, ["group1", "group2"])


@dataclasses.dataclass(frozen=True)
class CalcMinDist(CalcDist):
    """Smooth minimum distance between two groups (differentiable softmin;
    beta -> inf recovers the hard min used by the reference)."""

    beta: float = dataclasses.field(default=200.0, metadata={"static": True})

    def value(self, coords, boundary):
        c1 = coords[self.group1]
        c2 = coords[self.group2]
        dr = jax.vmap(lambda a: boundary.displacement(a[None, :], c2))(c1)
        d = jnp.sqrt(jnp.sum(dr * dr, axis=-1) + 1e-24)
        return _smooth_min(d.reshape(-1), self.beta)


_register(CalcMinDist, ["group1", "group2"], ["beta"])


@dataclasses.dataclass(frozen=True)
class CalcMaxDist(CalcDist):
    beta: float = dataclasses.field(default=200.0, metadata={"static": True})

    def value(self, coords, boundary):
        c1 = coords[self.group1]
        c2 = coords[self.group2]
        dr = jax.vmap(lambda a: boundary.displacement(a[None, :], c2))(c1)
        d = jnp.sqrt(jnp.sum(dr * dr, axis=-1) + 1e-24)
        return -_smooth_min(-d.reshape(-1), self.beta)


_register(CalcMaxDist, ["group1", "group2"], ["beta"])


@dataclasses.dataclass(frozen=True)
class CalcCMDist:
    """Distance between the mass-weighted centers of two groups."""

    group1: jax.Array = None
    group2: jax.Array = None
    masses1: jax.Array = None
    masses2: jax.Array = None

    def value(self, coords, boundary):
        m1 = self.masses1
        m2 = self.masses2
        c1 = jnp.sum(coords[self.group1] * m1[:, None], axis=0) / jnp.sum(m1)
        c2 = jnp.sum(coords[self.group2] * m2[:, None], axis=0) / jnp.sum(m2)
        dr = boundary.displacement(c1, c2)
        return jnp.sqrt(jnp.sum(dr * dr) + 1e-24)


_register(CalcCMDist, ["group1", "group2", "masses1", "masses2"])


@dataclasses.dataclass(frozen=True)
class CalcRg:
    """Radius of gyration of a group (mass-weighted)."""

    group: jax.Array = None
    masses: jax.Array = None

    def value(self, coords, boundary):
        c = coords[self.group]
        m = self.masses
        com = jnp.sum(c * m[:, None], axis=0) / jnp.sum(m)
        d2 = jnp.sum((c - com) ** 2, axis=1)
        return jnp.sqrt(jnp.sum(m * d2) / jnp.sum(m))


_register(CalcRg, ["group", "masses"])


@dataclasses.dataclass(frozen=True)
class CalcRMSD:
    """RMSD to a reference after Kabsch superposition (cv.jl CalcRMSD;
    analysis.jl:38-97). Differentiable through the SVD."""

    reference: jax.Array = None   # (M, 3)
    group: jax.Array = None       # (M,) atom indices

    def value(self, coords, boundary):
        p = coords[self.group]
        q = self.reference
        p = p - jnp.mean(p, axis=0)
        q = q - jnp.mean(q, axis=0)
        h = p.T @ q
        u, s, vt = jnp.linalg.svd(h)
        d = jnp.sign(jnp.linalg.det(u @ vt))
        rot = (u * jnp.asarray([1.0, 1.0, d])[None, :]) @ vt
        p_rot = p @ rot
        return jnp.sqrt(jnp.mean(jnp.sum((p_rot - q) ** 2, axis=1)) + 1e-24)


_register(CalcRMSD, ["reference", "group"])


@dataclasses.dataclass(frozen=True)
class CalcTorsion:
    """Dihedral angle over four atoms."""

    i: int = dataclasses.field(metadata={"static": True})
    j: int = dataclasses.field(metadata={"static": True})
    k: int = dataclasses.field(metadata={"static": True})
    l: int = dataclasses.field(metadata={"static": True})

    def value(self, coords, boundary):
        from ..ops.bonded import _dihedral
        return _dihedral(coords[self.i], coords[self.j], coords[self.k],
                         coords[self.l], boundary)


_register(CalcTorsion, [], ["i", "j", "k", "l"])


def cv_gradient(cv, coords, boundary):
    """dCV/dcoords via autodiff (the reference hand-derives these,
    cv.jl cv_gradient)."""
    return jax.grad(lambda c: cv.value(c, boundary))(coords)
