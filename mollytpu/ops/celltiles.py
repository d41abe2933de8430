"""Cell-tile neighbor engine: the TPU-native hot path for pairwise forces.

Re-design of the reference's GPU fast path (ext/MollyCUDAExt.jl tile pipeline,
SURVEY.md section 2.5) for XLA/TPU. The reference builds compressed 32x32
warp tiles from a Morton sort; materializing a compacted pair list on TPU is
gather/scatter-bound (measured 220 ms/step for 20k atoms), so here the cell
table itself is the neighbor structure:

  1. Atoms bin into a static cell grid (cell size >= cutoff + skin); the
     (n_cells, capacity) table is rebuilt by a cheap rank-and-scatter — no
     sort of candidate pairs, no compaction.
  2. The force kernel evaluates dense (capacity x stencil*capacity) tiles per
     cell with validity/exclusion masks: all-regular shapes, VPU-friendly
     broadcasting, tiny gathers (one per cell table entry, not per pair).
  3. Both orderings of each pair are computed (27-cell stencil), so forces
     need no j-scatter at all: F_i = sum_j coef * dr, scattered once through
     the table (n_cells*capacity elements).

Pair geometry stays component-wise (never (..., 3)) per the TPU minor-dim
tiling rule.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from .nonbonded import _pair_energy_fn, _split_inters


def _register(cls, data_fields, meta_fields=()):
    jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )
    return cls


@dataclasses.dataclass(frozen=True)
class CellTiles:
    """Neighbor structure: cell occupancy table + per-cell stencil ids."""

    table: jax.Array      # (n_cells, cap) int32 atom ids, sentinel = N
    overflow: jax.Array   # () int32
    step_built: jax.Array


_register(CellTiles, ["table", "overflow", "step_built"])


@dataclasses.dataclass(frozen=True)
class CellTileFinder:
    """Static grid config + stencil. Cell size >= dist_cutoff so the 27-cell
    stencil covers the interaction sphere; rebuild cadence n_steps with the
    skin folded into dist_cutoff as usual."""

    dist_cutoff: float
    stencil: jax.Array = None  # (n_cells, S) int32 neighbor cell ids
    grid_dims: tuple = dataclasses.field(default=None, metadata={"static": True})
    cell_capacity: int = dataclasses.field(default=32, metadata={"static": True})
    n_steps: int = dataclasses.field(default=1, metadata={"static": True})
    # NPT staleness policy (see BlockPairFinder): grid dims/capacities are
    # sized for the setup-time box; drift beyond resetup_drift triggers a
    # host-side re-setup between chunks.
    ref_sides: tuple = dataclasses.field(default=None, metadata={"static": True})
    resetup_drift: float = dataclasses.field(default=0.05,
                                             metadata={"static": True})

    is_tile_finder = True

    def box_drift_exceeded(self, boundary):
        if self.ref_sides is None:
            return False
        import numpy as _np
        cur = _np.asarray(jax.device_get(boundary.side_lengths),
                          dtype=_np.float64)
        ref = _np.asarray(self.ref_sides, dtype=_np.float64)
        ok = _np.isfinite(ref) & _np.isfinite(cur)
        if not ok.any():
            return False
        return bool(_np.any(_np.abs(cur[ok] / ref[ok] - 1.0)
                            > self.resetup_drift))

    def resetup(self, boundary, n_atoms, coords=None, atoms=None):
        return type(self).setup(boundary, self.dist_cutoff, n_atoms,
                                n_steps=self.n_steps,
                                cell_capacity=self.cell_capacity)

    @classmethod
    def setup(cls, boundary, dist_cutoff, n_atoms, n_steps=1, cell_capacity=None):
        sides = np.asarray(jax.device_get(boundary.side_lengths), dtype=np.float64)
        dims = tuple(int(max(1, math.floor(s / dist_cutoff))) for s in sides)
        n_cells = int(np.prod(dims))
        per_cell = n_atoms / max(n_cells, 1)
        if cell_capacity is None:
            cell_capacity = int(max(8, math.ceil(per_cell + 6.0 * math.sqrt(per_cell) + 4)))
        # pad capacity to a multiple of 8 (sublane alignment)
        cell_capacity = ((cell_capacity + 7) // 8) * 8
        # static stencil: up to 27 distinct neighbor cells per cell
        dz, dy, dx = dims[2], dims[1], dims[0]
        cells = np.arange(n_cells)
        cx, rem = np.divmod(cells, dims[1] * dims[2])
        cy, cz = np.divmod(rem, dims[2])
        offs = []
        seen = set()
        for ox in (-1, 0, 1):
            for oy in (-1, 0, 1):
                for oz in (-1, 0, 1):
                    key = (ox % dims[0], oy % dims[1], oz % dims[2])
                    if key not in seen:
                        seen.add(key)
                        offs.append((ox, oy, oz))
        sten = np.zeros((n_cells, len(offs)), dtype=np.int32)
        for s, (ox, oy, oz) in enumerate(offs):
            nx = (cx + ox) % dims[0]
            ny = (cy + oy) % dims[1]
            nz = (cz + oz) % dims[2]
            sten[:, s] = (nx * dims[1] + ny) * dims[2] + nz
        return cls(dist_cutoff=float(dist_cutoff), stencil=jnp.asarray(sten),
                   grid_dims=dims, cell_capacity=cell_capacity,
                   n_steps=n_steps,
                   ref_sides=tuple(float(s) for s in sides))

    def find(self, coords, boundary, exclusions=None, step_n=0):
        n = coords.shape[0]
        dims = jnp.asarray(self.grid_dims, dtype=jnp.int32)
        n_cells = int(np.prod(self.grid_dims))
        cap = self.cell_capacity
        frac = boundary.fractional(boundary.wrap(coords))
        frac = jnp.clip(frac, 0.0, 1.0 - 1e-7)
        cell3 = jnp.floor(frac * dims.astype(coords.dtype)).astype(jnp.int32)
        cell3 = jnp.clip(cell3, 0, dims - 1)
        cid = (cell3[:, 0] * self.grid_dims[1] + cell3[:, 1]) * self.grid_dims[2] \
            + cell3[:, 2]
        order = jnp.argsort(cid).astype(jnp.int32)  # N-element sort: cheap
        sorted_cid = cid[order]
        arange = jnp.arange(n)
        is_start = jnp.concatenate([jnp.ones((1,), bool),
                                    sorted_cid[1:] != sorted_cid[:-1]])
        start_idx = jax.lax.associative_scan(
            jnp.maximum, jnp.where(is_start, arange, 0))
        rank = (arange - start_idx).astype(jnp.int32)
        keep = rank < cap
        overflow = jnp.sum(~keep).astype(jnp.int32)
        table = jnp.full((n_cells * cap,), n, dtype=jnp.int32)
        slot = sorted_cid * cap + jnp.minimum(rank, cap - 1)
        table = table.at[jnp.where(keep, slot, n_cells * cap)].set(order, mode="drop")
        return CellTiles(table.reshape(n_cells, cap), overflow,
                         jnp.asarray(step_n, jnp.int32))


_register(CellTileFinder, ["dist_cutoff", "stencil"],
          ["grid_dims", "cell_capacity", "n_steps", "ref_sides",
           "resetup_drift"])


def _gather_fields(atoms, idx):
    return jax.tree.map(lambda a: a[idx] if a is not None else None, atoms)


def _tile_geometry(coords, boundary, a_ids, b_ids):
    """Component-wise dr (B - A) and r2 for (C, cap) x (C, S*cap) tiles."""
    d = coords.shape[1]
    drs = []
    comps = [coords[:, k] for k in range(d)]
    diffs = []
    for k in range(d):
        ca = comps[k][a_ids]          # (C, cap)
        cb = comps[k][b_ids]          # (C, S*cap)
        diffs.append(cb[:, None, :] - ca[:, :, None])  # (C, cap, S*cap)
    drs = boundary.mic_parts(tuple(diffs))
    r2 = sum(x * x for x in drs)
    return drs, r2


def _tile_masks(a_ids, b_ids, n, exclusions, cutoff2, r2):
    a_valid = (a_ids < n)[:, :, None]
    b_valid = (b_ids < n)[:, None, :]
    not_self = a_ids[:, :, None] != b_ids[:, None, :]
    live = a_valid & b_valid & not_self & (r2 < cutoff2)
    if exclusions is not None and exclusions.excl_table.shape[1] > 0:
        et = exclusions.excl_table[jnp.minimum(a_ids, n - 1)]  # (C, cap, W)
        excl = jnp.any(b_ids[:, None, :, None] == et[:, :, None, :], axis=-1)
        live = live & ~excl
        st = exclusions.spec_table[jnp.minimum(a_ids, n - 1)]
        spec = jnp.any(b_ids[:, None, :, None] == st[:, :, None, :], axis=-1)
    else:
        spec = jnp.zeros_like(live)
    return live, spec


def tile_energy(inters, atoms, coords, boundary, tiles, finder, exclusions):
    """Pairwise energy over cell tiles (each unordered pair counted twice,
    halved at the end)."""
    if not inters:
        return jnp.zeros((), dtype=coords.dtype)
    n = coords.shape[0]
    a_ids = tiles.table                                # (C, cap)
    cap = a_ids.shape[1]
    b_ids = tiles.table[finder.stencil]                # (C, S, cap)
    b_ids = b_ids.reshape(a_ids.shape[0], -1)          # (C, S*cap)
    drs, r2 = _tile_geometry(coords, boundary, a_ids, b_ids)
    live, spec = _tile_masks(a_ids, b_ids, n, exclusions,
                             finder.dist_cutoff ** 2, r2)
    r = jnp.sqrt(jnp.where(live, r2, 1.0))
    ai = _gather_fields(atoms, jnp.minimum(a_ids, n - 1))
    aj = _gather_fields(atoms, jnp.minimum(b_ids, n - 1))
    e_fn = _pair_energy_fn(inters)

    def cell(rc, a_i, a_j, lv, sp):
        def row(rr, a_ii, lv_i, sp_i):
            return jax.vmap(lambda r1, a_jj, l1, s1:
                            jnp.where(l1, e_fn(jnp.where(l1, r1, 1.0), a_ii, a_jj, s1), 0.0)
                            )(rr, a_j, lv_i, sp_i)

        return jax.vmap(row)(rc, a_i, lv, sp)

    e = jax.vmap(cell)(r, ai, aj, live, spec)
    return 0.5 * jnp.sum(e)


def tile_forces(inters, atoms, coords, boundary, tiles, finder, exclusions,
                velocities=None, step_n=0, needs_virial=False):
    n, d = coords.shape
    zero_vir = jnp.zeros((d, d), dtype=coords.dtype)
    if not inters:
        return jnp.zeros_like(coords), zero_vir
    cons, veldep = _split_inters(inters)
    if veldep:
        raise NotImplementedError(
            "velocity-dependent interactions use the compact-list path")
    a_ids = tiles.table
    b_ids = tiles.table[finder.stencil].reshape(a_ids.shape[0], -1)
    drs, r2 = _tile_geometry(coords, boundary, a_ids, b_ids)
    live, spec = _tile_masks(a_ids, b_ids, n, exclusions,
                             finder.dist_cutoff ** 2, r2)
    r = jnp.sqrt(jnp.where(live, r2, 1.0))
    ai = _gather_fields(atoms, jnp.minimum(a_ids, n - 1))
    aj = _gather_fields(atoms, jnp.minimum(b_ids, n - 1))
    e_fn = _pair_energy_fn(cons)
    g_fn = jax.grad(e_fn, argnums=0)

    def cell(rc, a_i, a_j, lv, sp):
        def row(rr, a_ii, lv_i, sp_i):
            return jax.vmap(lambda r1, a_jj, l1, s1:
                            jnp.where(l1, g_fn(jnp.where(l1, r1, 1.0), a_ii, a_jj, s1), 0.0)
                            )(rr, a_j, lv_i, sp_i)

        return jax.vmap(row)(rc, a_i, lv, sp)

    g = jax.vmap(cell)(r, ai, aj, live, spec)  # (C, cap, S*cap) dU/dr
    coef = g / r
    # F on A atoms: sum over B of coef * dr (dr = B - A; F_A = coef * dr)
    flat_a = a_ids.reshape(-1)
    fcols = []
    for k in range(d):
        fa = jnp.sum(coef * drs[k], axis=2)  # (C, cap)
        col = jnp.zeros((n,), dtype=coords.dtype)
        col = col.at[jnp.minimum(flat_a, n - 1)].add(
            jnp.where(flat_a < n, fa.reshape(-1), 0.0))
        fcols.append(col)
    forces = jnp.stack(fcols, axis=-1)
    if needs_virial:
        rows = []
        for a in range(d):
            rows.append(jnp.stack([jnp.sum(coef * drs[a] * drs[b])
                                   for b in range(d)]))
        vir = -0.5 * jnp.stack(rows).astype(coords.dtype)
    else:
        vir = zero_vir
    return forces, vir
