"""Block-pair neighbor structure feeding the Pallas pairwise kernel.

TPU-native re-design of the reference's CUDA tile pipeline
(ext/MollyCUDAExt.jl:822-844, SURVEY.md section 2.5): atoms sort spatially
(cell order ~ Morton order), group into blocks of 128 (one VPU lane row —
the analogue of the reference's 32-atom warp tiles), per-block AABBs cull
block pairs by minimum-image box distance (kernel_min_max! /
find_interacting_blocks_kernel! analogues), and the kernel walks each block's
fixed-capacity interacting-block list. Overflow is reported like the
reference's interacting-tile overflow (ext:733-739).

The rebuild is cheap, all-XLA (one N-element argsort + (B, B) AABB math), so
the default cadence is every step — no skin needed.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 128


def _register(cls, data_fields, meta_fields=()):
    jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )
    return cls


@dataclasses.dataclass(frozen=True)
class BlockPairs:
    """Sorted order + interacting-block lists."""

    order: jax.Array        # (N_pad,) int32 — sorted atom ids, sentinel = N
    nbr: jax.Array          # (B, M) int32 neighbor block ids (padded w/ 0)
    nbr_valid: jax.Array    # (B, M) int32 1/0
    overflow: jax.Array     # () int32
    step_built: jax.Array   # () int32


_register(BlockPairs, ["order", "nbr", "nbr_valid", "overflow", "step_built"])


@dataclasses.dataclass(frozen=True)
class BlockPairFinder:
    """Static config for the block-pair build."""

    dist_cutoff: float
    cell_rank: jax.Array = None  # (n_cells,) Morton rank of each cell
    grid_dims: tuple = dataclasses.field(default=None, metadata={"static": True})
    n_pad: int = dataclasses.field(default=0, metadata={"static": True})
    max_nbr_blocks: int = dataclasses.field(default=32, metadata={"static": True})
    n_steps: int = dataclasses.field(default=1, metadata={"static": True})

    is_block_finder = True

    @property
    def n_blocks(self):
        return self.n_pad // BLOCK

    @classmethod
    def setup(cls, boundary, dist_cutoff, n_atoms, n_steps=1,
              max_nbr_blocks=None, cell_size=None, coords=None,
              margin_blocks=4):
        """If `coords` is given, the capacity is sized from a trial build on
        the actual configuration (max row count + margin) instead of the
        density estimate — Z-order blocks straddling power-of-2 boundaries
        can exceed the mean estimate by several x."""
        sides = np.asarray(jax.device_get(boundary.side_lengths), dtype=np.float64)
        cs = cell_size or dist_cutoff
        dims = tuple(int(max(1, math.floor(s / cs))) for s in sides)
        n_pad = ((n_atoms + BLOCK - 1) // BLOCK) * BLOCK
        if max_nbr_blocks is None:
            vol = float(np.prod(sides))
            dens = n_atoms / vol
            rb = (3.0 * BLOCK / (4.0 * math.pi * dens)) ** (1.0 / 3.0)
            reach = dist_cutoff + 2.0 * rb
            est = 4.0 / 3.0 * math.pi * reach ** 3 * dens / BLOCK
            max_nbr_blocks = int(min(n_pad // BLOCK,
                                     max(8, math.ceil(est * 2.0 + 8))))
        # Morton (Z-order) rank of each cell so consecutive sorted atoms are
        # spatially compact (the reference's Morton reorder,
        # ext/MollyCUDAExt.jl step 1); lexicographic cell order makes long
        # thin blocks whose AABBs overlap far more block pairs.
        n_cells = int(np.prod(dims))
        cells = np.arange(n_cells)
        cx, rem = np.divmod(cells, dims[1] * dims[2])
        cy, cz = np.divmod(rem, dims[2])
        code = np.zeros(n_cells, dtype=np.int64)
        for bit in range(11):
            code |= ((cx >> bit) & 1).astype(np.int64) << (3 * bit + 2)
            code |= ((cy >> bit) & 1).astype(np.int64) << (3 * bit + 1)
            code |= ((cz >> bit) & 1).astype(np.int64) << (3 * bit)
        rank = np.empty(n_cells, dtype=np.int32)
        rank[np.argsort(code, kind="stable")] = np.arange(n_cells, dtype=np.int32)
        finder = cls(dist_cutoff=float(dist_cutoff), cell_rank=jnp.asarray(rank),
                     grid_dims=dims, n_pad=n_pad,
                     max_nbr_blocks=max_nbr_blocks, n_steps=n_steps)
        if coords is not None:
            trial = finder.find(coords, boundary)
            actual_max = int(jax.device_get(trial.overflow)) + max_nbr_blocks
            sized = min(n_pad // BLOCK, actual_max + margin_blocks)
            finder = dataclasses.replace(finder, max_nbr_blocks=sized)
        return finder

    def find(self, coords, boundary, exclusions=None, step_n=0):
        n = coords.shape[0]
        frac = boundary.fractional(boundary.wrap(coords))
        frac = jnp.clip(frac, 0.0, 1.0 - 1e-7)
        # 10-bit-per-axis Morton code straight from fractional coordinates
        # (the reference's Z-order reorder, src/kernels.jl:575-645). A
        # power-of-two implicit grid keeps consecutive sorted atoms spatially
        # compact; cutoff-sized cells fragment the curve badly.
        q = (frac * 1024.0).astype(jnp.int32)

        def spread(v):
            v = v.astype(jnp.int64)
            v = (v | (v << 16)) & 0x030000FF
            v = (v | (v << 8)) & 0x0300F00F
            v = (v | (v << 4)) & 0x030C30C3
            v = (v | (v << 2)) & 0x09249249
            return v

        code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
        order = jnp.argsort(code).astype(jnp.int32)
        order = jnp.concatenate([
            order, jnp.full((self.n_pad - n,), n, dtype=jnp.int32)])

        # block AABBs from wrapped sorted coords (pad rows repeat the last
        # real atom so they never stretch a box)
        wrapped = boundary.wrap(coords)
        safe = jnp.minimum(order, n - 1)
        b = self.n_blocks
        mins, maxs = [], []
        for k in range(coords.shape[1]):
            ck = wrapped[:, k][safe].reshape(b, BLOCK)
            mins.append(jnp.min(ck, axis=1))
            maxs.append(jnp.max(ck, axis=1))
        # pairwise AABB MIC distance
        rc2 = self.dist_cutoff ** 2
        gap2 = jnp.zeros((b, b), dtype=coords.dtype)
        sides = boundary.side_lengths
        for k in range(coords.shape[1]):
            c = 0.5 * (mins[k] + maxs[k])
            e = 0.5 * (maxs[k] - mins[k])
            dc = c[None, :] - c[:, None]
            box_k = sides[k]
            periodic = jnp.isfinite(box_k)
            safe_box = jnp.where(periodic, box_k, 1.0)
            dc = dc - jnp.where(periodic, jnp.round(dc / safe_box) * box_k, 0.0)
            gap = jnp.maximum(jnp.abs(dc) - (e[None, :] + e[:, None]), 0.0)
            gap2 = gap2 + gap * gap
        interacting = gap2 < rc2  # (B, B) — includes self and both orderings

        # compact each row to (B, M) with cumsum ranking
        m = self.max_nbr_blocks
        rank = jnp.cumsum(interacting.astype(jnp.int32), axis=1) - 1
        rank = jnp.where(interacting, jnp.minimum(rank, m), m)
        rows = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, b))
        cols = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[None, :], (b, b))
        flat = rows * (m + 1) + rank
        nbr_buf = jnp.zeros((b * (m + 1),), dtype=jnp.int32)
        nbr_buf = nbr_buf.at[flat.reshape(-1)].set(cols.reshape(-1), mode="drop")
        val_buf = jnp.zeros((b * (m + 1),), dtype=jnp.int32)
        val_buf = val_buf.at[flat.reshape(-1)].set(
            interacting.astype(jnp.int32).reshape(-1), mode="drop")
        nbr = nbr_buf.reshape(b, m + 1)[:, :m]
        nbr_valid = val_buf.reshape(b, m + 1)[:, :m]
        counts = jnp.sum(interacting, axis=1)
        overflow = jnp.maximum(jnp.max(counts) - m, 0).astype(jnp.int32)
        return BlockPairs(order=order, nbr=nbr, nbr_valid=nbr_valid,
                          overflow=overflow,
                          step_built=jnp.asarray(step_n, jnp.int32))


_register(BlockPairFinder, ["dist_cutoff", "cell_rank"],
          ["grid_dims", "n_pad", "max_nbr_blocks", "n_steps"])
