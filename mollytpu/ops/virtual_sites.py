"""Virtual (massless) interaction sites.

Parity with /root/reference/src/virtual.jl: OneParticleSite,
TwoParticleAverageSite, ThreeParticleAverageSite, OutOfPlaneSite (:49-118),
`place_virtual_sites!` (:187) and `distribute_forces!` (:226).

TPU-native design: placement is one vectorized pure function of the parent
coordinates; force redistribution is its VJP (jax.vjp), which reproduces the
reference's hand-derived chain-rule scatter exactly and stays correct for
every site type. Sites carry zero mass, so integrators give them zero
acceleration and velocity (src/force.jl:17 calc_accels).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

SITE_ONE = 0
SITE_AVG2 = 1
SITE_AVG3 = 2
SITE_OOP = 3


@dataclasses.dataclass(frozen=True)
class VirtualSites:
    site_idx: jax.Array    # (S,) int32 — atom index of each site
    site_type: jax.Array   # (S,) int32
    parents: jax.Array     # (S, 3) int32 (unused slots = 0)
    weights: jax.Array     # (S, 3) float

    @property
    def n_sites(self):
        return int(self.site_idx.shape[0])

    @classmethod
    def build(cls, sites, dtype=jnp.float32):
        """sites: list of (site_atom_idx, type_str, parent_indices, weights)."""
        type_map = {"one": SITE_ONE, "average2": SITE_AVG2,
                    "average3": SITE_AVG3, "outOfPlane": SITE_OOP}
        s_idx, s_type, s_par, s_w = [], [], [], []
        for (idx, t, par, w) in sites:
            s_idx.append(idx)
            s_type.append(type_map[t])
            p = list(par) + [0] * (3 - len(par))
            s_par.append(p[:3])
            ww = list(w) + [0.0] * (3 - len(w))
            s_w.append(ww[:3])
        return cls(jnp.asarray(s_idx, jnp.int32), jnp.asarray(s_type, jnp.int32),
                   jnp.asarray(np.array(s_par), jnp.int32),
                   jnp.asarray(np.array(s_w), dtype))

    def _site_positions(self, coords, boundary):
        p1 = coords[self.parents[:, 0]]
        r12 = boundary.displacement(p1, coords[self.parents[:, 1]])
        r13 = boundary.displacement(p1, coords[self.parents[:, 2]])
        w = self.weights
        pos_one = p1
        # OpenMM TwoParticleAverage: w1 r1 + w2 r2 == r1 + w2 (r2 - r1)
        pos_avg2 = p1 + w[:, 1:2] * r12
        pos_avg3 = p1 + w[:, 1:2] * r12 + w[:, 2:3] * r13
        cross = jnp.cross(r12, r13)
        pos_oop = p1 + w[:, 0:1] * r12 + w[:, 1:2] * r13 + w[:, 2:3] * cross
        t = self.site_type[:, None]
        return jnp.where(t == SITE_ONE, pos_one,
                         jnp.where(t == SITE_AVG2, pos_avg2,
                                   jnp.where(t == SITE_AVG3, pos_avg3, pos_oop)))

    def place(self, coords, boundary):
        """Set site coordinates from their parents (place_virtual_sites!)."""
        return coords.at[self.site_idx].set(self._site_positions(coords, boundary))

    def distribute_forces(self, coords, boundary, forces):
        """Move forces on sites onto their parents via the placement VJP
        (distribute_forces!). Site rows are zeroed afterwards."""
        f_sites = forces[self.site_idx]
        _, vjp = jax.vjp(lambda c: self._site_positions(c, boundary), coords)
        extra = vjp(f_sites)[0]
        forces = forces.at[self.site_idx].set(0.0)
        return forces + extra


jax.tree_util.register_dataclass(
    VirtualSites, data_fields=["site_idx", "site_type", "parents", "weights"],
    meta_fields=[],
)
