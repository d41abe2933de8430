"""LINCS constraint solver re-designed for XLA.

Parity with /root/reference/src/constraints/lincs.jl (:1-1277): the LINear
Constraint Solver (Hess et al. 1997) approximates (I - A)^-1 by a truncated
series in the constraint-coupling matrix A, then applies a fixed number of
rotation-correction iterations. The reference builds a CSR coupling matrix
with grouped GPU block kernels; on TPU the coupling is a fixed-width
neighbour table (each constraint couples with the few constraints sharing an
atom), so one series term is a (K, C) gather + multiply-accumulate — static
shapes, no sparse formats, fully differentiable.

Unlike SHAKE's 60 Jacobi sweeps (each a scatter), LINCS needs
`order + n_iters * order` gather mat-vecs and ~2 scatters total, which is
the cheaper shape on TPU hardware.

LINCS assumes the constraint graph is a forest of small stars/chains (bonds
to hydrogens). Like the reference (and GROMACS), it is NOT suitable for
closed triangles (rigid water / angle constraints) — use SHAKE/RATTLE there;
`setup_constraints(..., algorithm="lincs")` keeps triangle clusters on
SHAKE automatically.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LINCS:
    """All distance constraints in SoA form with a fixed-width coupling table.

    nbr[k, c] = index of the c-th constraint sharing an atom with k (padded
    with K, pointing at a zero row); coef[k, c] = the normalized coupling
    S_k * S_l * (+-) invmass_shared used in the A mat-vec.
    """

    idx_i: jax.Array     # (K,) int32
    idx_j: jax.Array     # (K,) int32
    dists: jax.Array     # (K,)
    sdiag: jax.Array     # (K,) 1/sqrt(invm_i + invm_j)
    inv_m_i: jax.Array   # (K,)
    inv_m_j: jax.Array   # (K,)
    nbr: jax.Array       # (K, C) int32
    coef: jax.Array      # (K, C)
    order: int = dataclasses.field(default=4, metadata={"static": True})
    n_iters: int = dataclasses.field(default=2, metadata={"static": True})

    @property
    def n_constraints(self) -> int:
        return int(self.idx_i.shape[0])

    @classmethod
    def build(cls, pairs, dists, masses, order=4, n_iters=2):
        """pairs (K, 2) atom indices, dists (K,), masses (N,) host arrays."""
        pairs = np.asarray(pairs, dtype=np.int32).reshape(-1, 2)
        dists = np.asarray(dists, dtype=np.float64).reshape(-1)
        masses = np.asarray(jax.device_get(masses), dtype=np.float64)
        k = pairs.shape[0]
        inv_m = np.where(masses > 0, 1.0 / np.where(masses > 0, masses, 1.0),
                         0.0)
        im_i = inv_m[pairs[:, 0]]
        im_j = inv_m[pairs[:, 1]]
        sdiag = 1.0 / np.sqrt(im_i + im_j)

        by_atom = {}
        for c, (i, j) in enumerate(pairs):
            by_atom.setdefault(int(i), []).append(c)
            by_atom.setdefault(int(j), []).append(c)
        links = [[] for _ in range(k)]
        for atom, members in by_atom.items():
            for a in members:
                for b in members:
                    if a == b:
                        continue
                    # sign +1 when the shared atom has the same orientation
                    # (i in both or j in both), else -1; gradient of
                    # constraint a on the shared atom dotted with b's
                    same = ((pairs[a, 0] == atom) == (pairs[b, 0] == atom))
                    sign = 1.0 if same else -1.0
                    links[a].append((b, sign * inv_m[atom]))
        width = max(1, max((len(l) for l in links), default=1))
        nbr = np.full((k, width), k, dtype=np.int32)
        coef = np.zeros((k, width), dtype=np.float64)
        for a, l in enumerate(links):
            for c, (b, w) in enumerate(l):
                nbr[a, c] = b
                # Hess 1997: A = I - S B^T M^-1 B S, so the off-diagonal
                # series coefficient is the NEGATED normalized coupling
                coef[a, c] = -sdiag[a] * sdiag[b] * w
        return cls(jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1]),
                   jnp.asarray(dists, jnp.float32),
                   jnp.asarray(sdiag, jnp.float32),
                   jnp.asarray(im_i, jnp.float32),
                   jnp.asarray(im_j, jnp.float32),
                   jnp.asarray(nbr), jnp.asarray(coef, jnp.float32),
                   order=order, n_iters=n_iters)

    # -- internals -----------------------------------------------------------

    def _series_solve(self, bdotb_coef, rhs):
        """acc = sum_{p=0..order} A^p rhs with (A v)[k] = sum_c coef*bb*v[nbr]."""
        vpad = jnp.concatenate([rhs, jnp.zeros((1,), rhs.dtype)])
        acc = rhs
        v = rhs
        for _ in range(self.order):
            vn = jnp.sum(bdotb_coef * vpad[self.nbr], axis=1)
            acc = acc + vn
            v = vn
            vpad = jnp.concatenate([v, jnp.zeros((1,), v.dtype)])
        return acc

    def _apply_lambda(self, coords_or_vels, lam, bvec, n):
        corr_i = -(lam * self.inv_m_i)[:, None] * bvec
        corr_j = (lam * self.inv_m_j)[:, None] * bvec
        # .at[].add — jax.ops.segment_sum lowers ~400x slower on TPU
        upd = jnp.zeros((n, corr_i.shape[1]), corr_i.dtype).at[
            jnp.concatenate([self.idx_i, self.idx_j])
        ].add(jnp.concatenate([corr_i, corr_j]))
        return coords_or_vels + upd

    # -- positions -----------------------------------------------------------

    def apply_position_constraints(self, coords_prev, coords_new, vels, masses,
                                   boundary, dt):
        """Project coords_new onto the constraint manifold; velocities get
        the implied correction Delta x / dt. Returns (coords, vels)."""
        if self.n_constraints == 0:
            return coords_new, vels
        n = coords_new.shape[0]
        ii, jj, d0 = self.idx_i, self.idx_j, self.dists
        # unit directions from the reference (pre-step) configuration
        r_ref = boundary.displacement(coords_prev[jj], coords_prev[ii])
        b = r_ref / jnp.linalg.norm(r_ref, axis=1, keepdims=True)
        # coupling strengths for this configuration: coef * (B_k . B_l)
        bpad = jnp.concatenate([b, jnp.zeros((1, b.shape[1]), b.dtype)])
        bdotb = jnp.sum(b[:, None, :] * bpad[self.nbr], axis=-1)
        abb = self.coef * bdotb

        def solve_round(coords, rhs):
            sol = self._series_solve(abb, rhs)
            lam = self.sdiag * sol
            return self._apply_lambda(coords, lam, b, n)

        dr = boundary.displacement(coords_new[jj], coords_new[ii])
        rhs = self.sdiag * (jnp.sum(b * dr, axis=1) - d0)
        coords = solve_round(coords_new, rhs)
        for _ in range(self.n_iters):
            # rotation correction: constrain to sqrt(2 d0^2 - len^2) so bond
            # shortening from rotation is compensated (Hess 1997 eq. 10)
            dr = boundary.displacement(coords[jj], coords[ii])
            len2 = jnp.sum(dr * dr, axis=1)
            p = jnp.sqrt(jnp.maximum(2.0 * d0 * d0 - len2, 0.0))
            rhs = self.sdiag * (d0 - p)
            coords = solve_round(coords, rhs)

        if vels is not None:
            vels = vels + (coords - coords_new) / dt
        return coords, vels

    # -- velocities ----------------------------------------------------------

    def apply_velocity_constraints(self, coords, vels, masses, boundary):
        """Remove velocity components along constrained bonds (LINCS
        projection, the RATTLE analogue)."""
        if self.n_constraints == 0:
            return vels
        n = coords.shape[0]
        ii, jj = self.idx_i, self.idx_j
        dr = boundary.displacement(coords[jj], coords[ii])
        b = dr / jnp.linalg.norm(dr, axis=1, keepdims=True)
        bpad = jnp.concatenate([b, jnp.zeros((1, b.shape[1]), b.dtype)])
        bdotb = jnp.sum(b[:, None, :] * bpad[self.nbr], axis=-1)
        abb = self.coef * bdotb
        rhs = self.sdiag * jnp.sum(b * (vels[ii] - vels[jj]), axis=1)
        sol = self._series_solve(abb, rhs)
        lam = self.sdiag * sol
        return self._apply_lambda(vels, lam, b, n)

    def constraint_virial(self, coords_prev, coords_new_unconstrained,
                          coords_constrained, masses, boundary, dt):
        dx = coords_constrained - coords_new_unconstrained
        f_eq = masses[:, None] * dx / (dt * dt)
        return jnp.einsum("na,nb->ab", coords_constrained, f_eq)

    def max_violation(self, coords, boundary):
        dr = boundary.displacement(coords[self.idx_j], coords[self.idx_i])
        r = jnp.sqrt(jnp.sum(dr * dr, axis=1))
        return jnp.max(jnp.abs(r - self.dists))


jax.tree_util.register_dataclass(
    LINCS,
    data_fields=["idx_i", "idx_j", "dists", "sdiag", "inv_m_i", "inv_m_j",
                 "nbr", "coef"],
    meta_fields=["order", "n_iters"],
)
