"""Periodic boundary conditions and minimum-image math.

TPU-native re-design of Molly's spatial layer (/root/reference/src/spatial.jl):
boundaries are small immutable pytrees whose fields are JAX arrays, so a jitted
step can carry and rescale them (NPT) without retracing. All minimum-image code
is branch-free and vectorized — `displacement` maps over (..., D) arrays.

Reference parity:
  CubicBoundary / RectangularBoundary  -> Orthorhombic (src/spatial.jl:40-129)
  TriclinicBoundary                    -> Triclinic    (src/spatial.jl:151-254)
  vector / vector_1D / wrap_coords     -> displacement / wrap (src/spatial.jl:483-602)
  volume / box_center / random_coord   -> same names
Open (non-periodic) axes are expressed with infinite side lengths, as in the
reference.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _register(cls, data_fields, meta_fields=()):
    jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )
    return cls


@dataclasses.dataclass(frozen=True)
class Orthorhombic:
    """Cubic / rectangular box. ``side_lengths`` has shape (D,) with D in {2, 3}.

    Infinite entries mark non-periodic axes. Covers Molly's CubicBoundary and
    RectangularBoundary (src/spatial.jl:40-129).
    """

    side_lengths: jax.Array

    @property
    def n_dims(self) -> int:
        return self.side_lengths.shape[-1]

    def volume(self):
        return jnp.prod(self.side_lengths)

    def box_matrix(self):
        return jnp.diag(self.side_lengths)

    def displacement(self, xi, xj):
        """Minimum-image vector from xi to xj (matches Molly's `vector`)."""
        dr = xj - xi
        box = self.side_lengths
        periodic = jnp.isfinite(box)
        shift = jnp.where(periodic, jnp.round(dr / jnp.where(periodic, box, 1.0)), 0.0)
        return dr - shift * jnp.where(periodic, box, 0.0)

    def wrap(self, x):
        box = self.side_lengths
        periodic = jnp.isfinite(box)
        wrapped = x - jnp.floor(x / jnp.where(periodic, box, 1.0)) * box
        return jnp.where(periodic, wrapped, x)

    def scale(self, mu):
        """Apply barostat scaling matrix (diagonal or full DxD) to the box."""
        mu = jnp.asarray(mu)
        if mu.ndim == 0:
            return Orthorhombic(self.side_lengths * mu)
        if mu.ndim == 1:
            return Orthorhombic(self.side_lengths * mu)
        return Orthorhombic(self.side_lengths * jnp.diagonal(mu))

    def center(self):
        return self.side_lengths / 2

    def fractional(self, x):
        return x / self.side_lengths

    def from_fractional(self, f):
        return f * self.side_lengths

    def mic_parts(self, diffs):
        """Minimum-image convention applied per component. `diffs` is a tuple
        of D same-shaped arrays (raw coordinate differences); returns the
        wrapped tuple. TPU-friendly: never forms a (..., D) array (minor-dim
        tiling pads small trailing dims 43x on TPU)."""
        out = []
        for d, dx in enumerate(diffs):
            box_d = self.side_lengths[d]
            periodic = jnp.isfinite(box_d)
            safe = jnp.where(periodic, box_d, 1.0)
            shift = jnp.where(periodic, jnp.round(dx / safe), 0.0)
            out.append(dx - shift * jnp.where(periodic, box_d, 0.0))
        return tuple(out)


_register(Orthorhombic, ["side_lengths"])


@dataclasses.dataclass(frozen=True)
class Triclinic:
    """Triclinic box defined by a lower-triangular basis matrix (rows = box
    vectors): a along x, b in the xy plane — the same reduced representation
    as the reference (src/spatial.jl:151-254).

    ``approx_images=True`` uses the cheap fractional-rounding minimum image
    (exact for sufficiently reduced boxes and cutoff < half the smallest
    width); ``False`` searches the 27 neighbouring images, mirroring Molly's
    exact path.
    """

    basis: jax.Array  # (3, 3), rows are box vectors, lower-triangular
    approx_images: bool = dataclasses.field(default=True, metadata={"static": True})

    @property
    def n_dims(self) -> int:
        return 3

    def volume(self):
        return jnp.abs(jnp.linalg.det(self.basis))

    def box_matrix(self):
        return self.basis

    @property
    def side_lengths(self):
        # Bounding-box side lengths (diagonal), used for cell-grid sizing.
        return jnp.diagonal(self.basis)

    def fractional(self, x):
        # x = f @ basis  =>  f = x @ inv(basis)
        return x @ jnp.linalg.inv(self.basis)

    def from_fractional(self, f):
        return f @ self.basis

    def displacement(self, xi, xj):
        dr = xj - xi
        inv = jnp.linalg.inv(self.basis)
        f = dr @ inv
        f = f - jnp.round(f)
        dr0 = f @ self.basis
        if self.approx_images:
            return dr0
        # Exact: search the 27 neighbour images for the shortest vector.
        shifts = jnp.asarray(
            np.array(np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1])).T.reshape(-1, 3),
            dtype=dr.dtype,
        )
        cands = dr0[..., None, :] + shifts @ self.basis  # (..., 27, 3)
        d2 = jnp.sum(cands * cands, axis=-1)
        idx = jnp.argmin(d2, axis=-1)
        return jnp.take_along_axis(cands, idx[..., None, None], axis=-2).squeeze(-2)

    def wrap(self, x):
        f = self.fractional(x)
        f = f - jnp.floor(f)
        return self.from_fractional(f)

    def scale(self, mu):
        mu = jnp.asarray(mu)
        if mu.ndim == 0:
            return Triclinic(self.basis * mu, self.approx_images)
        if mu.ndim == 1:
            return Triclinic(self.basis * mu[None, :], self.approx_images)
        return Triclinic(self.basis @ mu.T, self.approx_images)

    def center(self):
        return jnp.sum(self.basis, axis=0) / 2

    def mic_parts(self, diffs):
        """Component-wise approximate minimum image (fractional rounding).
        See Orthorhombic.mic_parts for the TPU layout rationale."""
        dx, dy, dz = diffs
        inv = jnp.linalg.inv(self.basis)
        f1 = dx * inv[0, 0] + dy * inv[1, 0] + dz * inv[2, 0]
        f2 = dx * inv[0, 1] + dy * inv[1, 1] + dz * inv[2, 1]
        f3 = dx * inv[0, 2] + dy * inv[1, 2] + dz * inv[2, 2]
        f1 = f1 - jnp.round(f1)
        f2 = f2 - jnp.round(f2)
        f3 = f3 - jnp.round(f3)
        b = self.basis
        return (f1 * b[0, 0] + f2 * b[1, 0] + f3 * b[2, 0],
                f1 * b[0, 1] + f2 * b[1, 1] + f3 * b[2, 1],
                f1 * b[0, 2] + f2 * b[1, 2] + f3 * b[2, 2])


_register(Triclinic, ["basis"], ["approx_images"])


def triclinic_from_lengths_angles(lengths, angles, dtype=jnp.float32):
    """Build a reduced triclinic basis from (a, b, c) and (alpha, beta, gamma)
    in radians — mirrors Molly's TriclinicBoundary(lengths, angles) ctor."""
    a, b, c = [float(v) for v in lengths]
    al, be, ga = [float(v) for v in angles]
    v1 = np.array([a, 0.0, 0.0])
    v2 = np.array([b * np.cos(ga), b * np.sin(ga), 0.0])
    cx = c * np.cos(be)
    cy = c * (np.cos(al) - np.cos(be) * np.cos(ga)) / np.sin(ga)
    cz = np.sqrt(max(c * c - cx * cx - cy * cy, 0.0))
    v3 = np.array([cx, cy, cz])
    return Triclinic(jnp.asarray(np.stack([v1, v2, v3]), dtype=dtype))


def cubic(side, dtype=jnp.float32):
    """CubicBoundary analogue: same side length on all three axes."""
    return Orthorhombic(jnp.full((3,), side, dtype=dtype))


def rectangular(sides, dtype=jnp.float32):
    return Orthorhombic(jnp.asarray(sides, dtype=dtype))


# ---------------------------------------------------------------------------
# Vectorized distance helpers


def displacement_fn(boundary):
    """Pairwise displacement function closed over a boundary pytree."""

    def disp(xi, xj):
        return boundary.displacement(xi, xj)

    return disp


def distance(boundary, xi, xj):
    dr = boundary.displacement(xi, xj)
    return jnp.sqrt(jnp.sum(dr * dr, axis=-1))


def sq_distance(boundary, xi, xj):
    dr = boundary.displacement(xi, xj)
    return jnp.sum(dr * dr, axis=-1)


def random_coords(key, boundary, n, dtype=jnp.float32):
    """Uniform random coordinates inside the box (Molly: random_coord)."""
    d = boundary.n_dims
    f = jax.random.uniform(key, (n, d), dtype=dtype)
    return boundary.from_fractional(f)


def place_atoms(key, boundary, n, min_dist=0.0, max_attempts=100, dtype=jnp.float32):
    """Place n atoms with pairwise minimum distance, rejection-sampled on host.

    Setup-time utility (not jitted) mirroring Molly's place_atoms
    (/root/reference/src/setup.jl:23-90).
    """
    min2 = float(min_dist) ** 2
    coords = []
    for i in range(n):
        for attempt in range(max_attempts):
            key, sub = jax.random.split(key)
            c = random_coords(sub, boundary, 1, dtype=dtype)[0]
            if not coords or min2 == 0.0:
                ok = True
            else:
                arr = jnp.stack(coords)
                d2 = sq_distance(boundary, arr, c[None, :])
                ok = bool(jnp.all(d2 > min2))
            if ok:
                coords.append(c)
                break
        else:
            raise RuntimeError(
                f"place_atoms: could not place atom {i} after {max_attempts} attempts"
            )
    return jnp.stack(coords)


def place_diatomics(key, boundary, n_molecules, bond_length, min_dist=0.0,
                    max_attempts=100, dtype=jnp.float32):
    """Place diatomic molecules: each pair offset by bond_length along x
    (Molly: place_diatomics, src/setup.jl:92-137)."""
    first = place_atoms(key, boundary, n_molecules, min_dist=min_dist,
                        max_attempts=max_attempts, dtype=dtype)
    offset = jnp.zeros((boundary.n_dims,), dtype=dtype).at[0].set(bond_length)
    second = first + offset
    coords = jnp.stack([first, second], axis=1).reshape(-1, boundary.n_dims)
    return boundary.wrap(coords)
