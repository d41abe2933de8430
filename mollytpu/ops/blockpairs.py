"""Cluster-pair neighbor structure feeding the Pallas pairwise kernel.

TPU-native re-design of the reference's CUDA tile pipeline
(ext/MollyCUDAExt.jl:822-844, SURVEY.md section 2.5): atoms sort along a
Morton curve, group into 32-atom i-clusters, per-cluster AABBs cull candidate
j-clusters by minimum-image box distance (kernel_min_max! /
find_interacting_blocks_kernel! analogues) — and then, unlike the reference's
block-granular tile list, candidates are refined to per-ATOM gathered j-lists
(atom-to-AABB distance test), GROMACS-cluster-list style but sized for the
TPU VPU: 32 i-atoms x 128 j-lanes per grid step. Block-granular lists put
~3% real pairs in each tile at liquid densities; atom-gathered lists reach
~8-10%, a direct win on the kernel's wall clock.

TPU implementation notes (all measured on v5e):
- every compaction is a row-wise `lax.sort_key_val` — XLA scatter lowers to
  ~0.4 us PER ELEMENT on TPU while sorting 6M elements takes 0.5 ms;
- every gather uses the batched `fields[:, idx]` / row-gather form
  (~0.4 ns/el); plain 1-D `x[idx]` gathers run ~20x slower;
- the kernel's j-tiles are materialized in WORK layout ((P, rows, 128),
  grid index p -> block p) so DMA walks HBM sequentially, and the static
  per-atom fields (sigma, sqrt eps, q, id) are packed once per rebuild,
  leaving only the 3-row coordinate gather on the per-step path.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

import os

# Default atoms per i-cluster (sorted-order granularity) and j-chunk width
# of one kernel grid step. Env-overridable; per-finder values (set by
# BlockPairFinder.setup(block=..., lanes=...) or the runtime autotuner in
# ops/autotune.py — the reference's per-(device, N, box, inters) tuned
# launch config, ext/MollyCUDAExt.jl:566-639) take precedence. The kernel's
# total pair-slot count grows with BLOCK while the per-step j-gather volume
# and grid dispatch count shrink as 1/BLOCK (measured optimum on the
# 19.7k-atom LJ benchmark: BLOCK=128, LANES=256).
BLOCK = int(os.environ.get("MOLLYTPU_BLOCK", "128"))
LANES = int(os.environ.get("MOLLYTPU_LANES", "256"))


def _register(cls, data_fields, meta_fields=()):
    jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )
    return cls


def mic_components(boundary, dx, dy, dz):
    """Minimum-image on component arrays (any shape) via the reduced-cell
    back-substitution: for a lower-triangular basis (rows a=(h11,0,0),
    b=(h21,h22,0), c=(h31,h32,h33)) round out the c image first, then b,
    then a. Orthorhombic is the off-diagonals-zero special case (falls back
    to independent per-axis rounding, handling open axes); the triclinic
    form matches Triclinic.approx_images (the reference CUDA tile engine's
    fractional path, ext/MollyCUDAExt.jl:1193-1292)."""
    basis = getattr(boundary, "basis", None)
    if basis is None:
        sides = boundary.side_lengths
        out = []
        for k, d in enumerate((dx, dy, dz)[: int(sides.shape[0])]):
            box_k = sides[k]
            periodic = jnp.isfinite(box_k)
            safe = jnp.where(periodic, box_k, 1.0)
            out.append(d - jnp.where(periodic,
                                     jnp.round(d / safe) * box_k, 0.0))
        while len(out) < 3:
            out.append((dx, dy, dz)[len(out)])
        return tuple(out)
    h11, h22, h33 = basis[0, 0], basis[1, 1], basis[2, 2]
    h21, h31, h32 = basis[1, 0], basis[2, 0], basis[2, 1]
    s3 = jnp.round(dz / h33)
    dx = dx - s3 * h31
    dy = dy - s3 * h32
    dz = dz - s3 * h33
    s2 = jnp.round(dy / h22)
    dx = dx - s2 * h21
    dy = dy - s2 * h22
    s1 = jnp.round(dx / h11)
    dx = dx - s1 * h11
    return dx, dy, dz


def boundary_perp_widths(boundary):
    """Host-side perpendicular widths of the cell along each axis normal
    (= side lengths for orthorhombic; V/|face area| for triclinic) — the
    correct box sizes for MIC-validity criteria."""
    basis = getattr(boundary, "basis", None)
    if basis is None:
        return np.asarray(jax.device_get(boundary.side_lengths),
                          dtype=np.float64)
    h = np.asarray(jax.device_get(basis), dtype=np.float64)
    vol = abs(np.linalg.det(h))
    widths = []
    for k in range(3):
        u, v = h[(k + 1) % 3], h[(k + 2) % 3]
        widths.append(vol / np.linalg.norm(np.cross(u, v)))
    return np.asarray(widths)


def kernel_mic_row(boundary, dtype):
    """(1, 12) SMEM row for the in-kernel back-substitution MIC:
    [h11,h21,h22,h31,h32,h33, 1/h11,1/h22,1/h33, 0,0,0]. Open orthorhombic
    axes get a huge stand-in so round() == 0."""
    basis = getattr(boundary, "basis", None)
    if basis is None:
        sides = jnp.asarray(boundary.side_lengths, dtype)
        if sides.shape[0] < 3:
            sides = jnp.concatenate(
                [sides, jnp.full((3 - sides.shape[0],), jnp.inf, dtype)])
        periodic = jnp.isfinite(sides)
        big = jnp.where(periodic, sides, 1e30)
        zeros = jnp.zeros((3,), dtype)
        row = jnp.concatenate([
            big[0:1], zeros[0:1], big[1:2], zeros[0:2], big[2:3],
            1.0 / big, zeros])
        return row.reshape(1, 12)
    b = basis.astype(dtype)
    row = jnp.stack([
        b[0, 0], b[1, 0], b[1, 1], b[2, 0], b[2, 1], b[2, 2],
        1.0 / b[0, 0], 1.0 / b[1, 1], 1.0 / b[2, 2],
        jnp.zeros((), dtype), jnp.zeros((), dtype), jnp.zeros((), dtype)])
    return row.reshape(1, 12)


@dataclasses.dataclass(frozen=True)
class BlockPairs:
    """Sorted order + flat work items + work-layout gathered j-tiles."""

    order: jax.Array        # (N_pad,) int32 — sorted atom ids, sentinel = N
    inv_order: jax.Array    # (N_pad,) int32 — sorted position of atom i
                            # (unsort forces by GATHER; scatter is ~0.4us/el)
    jcount: jax.Array       # (B,) int32 — true j-candidate count per i-block,
                            # in CLUSTER units (atoms / finder.cluster).
                            # HALF-ORIENTATION lists: only clusters of blocks
                            # J >= I appear in block I's list (each cross-
                            # block pair is evaluated ONCE; the kernel emits
                            # per-lane j-side partial forces, accumulated by
                            # the occ_idx transpose map below). The self block
                            # J == I carries both orderings in-tile.
    flat_i: jax.Array       # (P,) int32 i-block of each work item
    row_start: jax.Array    # (B,) int32 first work item of each i-block
    n_items: jax.Array      # (1,) int32 live work items (rest are padding)
    n_pairs: jax.Array      # (1,) int32 true interacting block-pair count
    work_idx: jax.Array     # (P * LANES,) int32 sorted-space j positions per
                            # item; padding = N_pad (a sentinel with id >= N).
                            # Lane l of item p holds member (l // (LANES/CL))
                            # of cluster cluster_idx[p, l % (LANES/CL)] — the
                            # member-strided order the kernel's cluster-tile
                            # concatenation expects.
    cluster_idx: jax.Array  # (P * LANES/CL,) int32 sorted-space j CLUSTER
                            # positions (CL consecutive sorted atoms per
                            # cluster); padding = N_pad/CL. The per-step
                            # j-coordinate gather indexes clusters, not atoms:
                            # the TPU batched gather costs ~2.4 cycles per
                            # INDEX regardless of row count (measured,
                            # tools/gather_probe.py), so CL=4 cuts the
                            # dominant per-step gather 4x for free (serpentine
                            # neighbors of a block are cluster-dense: measured
                            # +0.4% slot inflation at CL=4 on 6mrr, +14% at 8)
    occ_idx: jax.Array      # (npc * K,) int32 transpose of cluster_idx: for
                            # each j-cluster c, the (padded to K = finder.
                            # max_occ) list of positions p*CPL + slot in the
                            # flattened cluster_idx where c occurs; sentinel =
                            # P*CPL (a zero column appended to the kernel's
                            # j-partial output). The per-step j-side force
                            # accumulation is ONE rebuild-static batched
                            # gather + a K-axis sum — no scatter anywhere.
    j_static: jax.Array     # (5, P * LANES) sigma/sqrt(eps)/charge/id/jpos
                            # (jpos = sorted position, for the kernel's
                            # same-block test) packed at rebuild, or None
                            # when the finder has no atom_static snapshot
                            # (caller gathers per step)
    centers: jax.Array      # (3, B) i-block AABB centers (kernel-local frame
                            # + per-entry MIC hoisted out of the kernel)
    a_stat: jax.Array       # (B, 4, BLOCK) sigma/sqrt(eps)/charge/id in
                            # sorted block layout, packed at rebuild (or None)
    a_bits: jax.Array       # (B, 4, BLOCK) int32 windowed exclusion bitmaps
                            # in block layout: rows [excl_w0, excl_w1,
                            # spec_w0, spec_w1]; bit (d + 32) of the word
                            # pair marks partner id i + d, |d| <= 31. The
                            # kernel tests bits per pair slot on the fly —
                            # no (P, BLOCK, LANES) mask is ever materialized
                            # (the mask build alone cost ~2.7 ms of the
                            # 14 ms rebuild and 49 MB of scan carry). Far
                            # pairs (|d| > 31, absent in standard
                            # topologies) are corrected densely after the
                            # kernel. None if no exclusions given.
    overflow: jax.Array     # () int32
    step_built: jax.Array   # () int32


_register(BlockPairs,
          ["order", "inv_order", "jcount", "flat_i", "row_start", "n_items",
           "n_pairs", "work_idx", "cluster_idx", "occ_idx", "j_static",
           "centers", "a_stat", "a_bits", "overflow", "step_built"])


@jax.jit
def _trial_find(finder, coords, boundary):
    """Jitted setup-time trial build (eager per-op dispatch of the block
    pipeline takes minutes on a 1-core CPU host at protein sizes)."""
    return finder.find(coords, boundary)


@dataclasses.dataclass(frozen=True)
class BlockPairFinder:
    """Static config for the cluster-pair build.

    atom_static: optional (3, N) [sigma, sqrt(epsilon), charge] snapshot so
    the j-side static fields pack once per rebuild instead of every step.
    Pass atoms= to setup() to enable; systems that mutate per-atom LJ/charge
    parameters mid-run (alchemical paths use the non-Pallas engines anyway)
    should leave it unset.
    """

    dist_cutoff: float
    atom_static: jax.Array = None
    grid_dims: tuple = dataclasses.field(default=None, metadata={"static": True})
    sort_dims: tuple = dataclasses.field(default=(1, 1, 1),
                                         metadata={"static": True})
    # True: the per-entry minimum-image shift against the i-block center is
    # applied OUTSIDE the kernel (valid when block extents + 2 cutoff fit in
    # the box — find() raises the overflow guard bit if that ever fails);
    # False: the kernel applies per-pair MIC (small/dense boxes).
    hoist_mic: bool = dataclasses.field(default=False,
                                        metadata={"static": True})
    n_pad: int = dataclasses.field(default=0, metadata={"static": True})
    max_pairs: int = dataclasses.field(default=1024, metadata={"static": True})
    max_jlist: int = dataclasses.field(default=LANES, metadata={"static": True})
    max_work_items: int = dataclasses.field(default=0, metadata={"static": True})
    n_steps: int = dataclasses.field(default=1, metadata={"static": True})
    # NPT staleness policy: the cell geometry, capacities, and the hoisted-
    # MIC decision are sized for the SETUP-TIME box (ref_sides). Barostat
    # volume changes beyond resetup_drift (relative, any axis) trigger a
    # host-side re-setup between chunks (sim.simulate), re-deriving geometry
    # from the current box; within the band, the skin + overflow/extent
    # guards keep the static geometry safe.
    ref_sides: tuple = dataclasses.field(default=None, metadata={"static": True})
    resetup_drift: float = dataclasses.field(default=0.05,
                                             metadata={"static": True})
    # per-finder tile shape (runtime-tunable launch config); defaults to the
    # module-level env values so existing callers are unchanged
    block: int = dataclasses.field(default=BLOCK, metadata={"static": True})
    lanes: int = dataclasses.field(default=LANES, metadata={"static": True})
    # j-list granularity: CL consecutive sorted atoms per gathered cluster.
    # The per-step coordinate gather is per-INDEX-bound on TPU (measured
    # ~2.4 cycles/index whatever the row count, tools/gather_probe.py), so
    # cluster lists divide its cost by CL; serpentine locality makes CL=4
    # inflation-free (+0.4% slots on 6mrr). CL=1 is the legacy per-atom list.
    cluster: int = dataclasses.field(default=4, metadata={"static": True})
    # capacity of the j-side occurrence transpose windows (max work-item
    # listings of one j-cluster, padded to this K); sized from the trial
    # build in setup(). A cluster is listed at most once per i-block, so K
    # is bounded by the block neighbor count of the densest cluster.
    max_occ: int = dataclasses.field(default=32, metadata={"static": True})

    is_block_finder = True

    def box_drift_exceeded(self, boundary):
        """Host-side check: has the box drifted beyond the static-geometry
        band this finder was sized for?"""
        if self.ref_sides is None:
            return False
        cur = boundary_perp_widths(boundary)
        ref = np.asarray(self.ref_sides, dtype=np.float64)
        ok = np.isfinite(ref) & np.isfinite(cur)
        if not ok.any():
            return False
        return bool(np.any(np.abs(cur[ok] / ref[ok] - 1.0)
                           > self.resetup_drift))

    def resetup(self, boundary, n_atoms, coords=None, atoms=None):
        """New finder sized for the current box (same cutoff/cadence).
        Static parameter packing is re-enabled only if this finder used it
        (alchemical systems that mutate per-atom params leave it off)."""
        return type(self).setup(
            boundary, self.dist_cutoff, n_atoms, n_steps=self.n_steps,
            coords=coords,
            atoms=atoms if self.atom_static is not None else None,
            block=self.block, lanes=self.lanes, cluster=self.cluster)

    @property
    def n_blocks(self):
        return self.n_pad // self.block

    @classmethod
    def setup(cls, boundary, dist_cutoff, n_atoms, n_steps=1,
              max_nbr_blocks=None, max_jlist=None, cell_size=None, coords=None,
              atoms=None, margin_blocks=4, block=None, lanes=None,
              cluster=None):
        """If `coords` is given, capacities are sized from a trial build on
        the actual configuration (max counts + margin) instead of the density
        estimate — Z-order blocks straddling power-of-2 boundaries can exceed
        the mean estimate by several x."""
        BLOCK = int(block) if block else globals()["BLOCK"]
        LANES = int(lanes) if lanes else globals()["LANES"]
        CL = int(cluster) if cluster else int(
            os.environ.get("MOLLYTPU_CLUSTER", "4"))
        # cluster granularity must tile both the block and the lane chunk
        while CL > 1 and (BLOCK % CL or LANES % CL):
            CL //= 2
        # perpendicular cell widths: == side lengths for orthorhombic, the
        # correct per-axis thickness for triclinic (geometry sizing + MIC
        # validity both need widths, not edge lengths)
        sides = boundary_perp_widths(boundary)
        cs = cell_size or dist_cutoff
        dims = tuple(int(max(1, math.floor(s / cs))) if np.isfinite(s) else 1
                     for s in sides)
        quantum = BLOCK * LANES // math.gcd(BLOCK, LANES)
        n_pad = ((n_atoms + quantum - 1) // quantum) * quantum
        vol = float(jax.device_get(boundary.volume()))
        n_blocks = n_pad // BLOCK
        if np.isfinite(vol) and vol > 0:
            dens = n_atoms / vol
            a_blk = (BLOCK / dens) ** (1.0 / 3.0)  # i-cluster cube side est.
        else:
            # open/partially-open boundary: no density estimate — size the
            # candidate capacities conservatively (all-pairs); a coords=
            # trial build below will shrink the j-list to what is observed
            dens = 0.0
            a_blk = float("inf")
        if max_nbr_blocks is None:
            if dens > 0:
                reach = 2.0 * dist_cutoff + 2.0 * a_blk
                est = reach ** 3 * dens / BLOCK
                max_nbr_blocks = int(min(n_blocks,
                                         max(8, math.ceil(est * 1.5 + 8))))
            else:
                max_nbr_blocks = n_blocks
        max_pairs = min(n_blocks * n_blocks, n_blocks * max_nbr_blocks)
        max_pairs = max(4, ((max_pairs + 3) // 4) * 4)
        if max_jlist is None:
            if dens > 0:
                est_j = (a_blk + 2.0 * dist_cutoff) ** 3 * dens
                max_jlist = int(min(n_pad, math.ceil(est_j * 1.4) + LANES))
            else:
                max_jlist = n_pad
        max_jlist = ((max_jlist + LANES - 1) // LANES) * LANES
        atom_static = None
        if atoms is not None:
            atom_static = jnp.stack([atoms.sigma, jnp.sqrt(atoms.epsilon),
                                     atoms.charge])
        # sort cells sized to hold ~BLOCK/2 atoms each: a block spans ~2-3
        # consecutive (face-adjacent) cells, giving tight AABBs AND a lower
        # hoisted-MIC threshold — dense solvated boxes (water ~87 atoms/nm^3)
        # qualify where BLOCK-sized cells would not
        a_blk_sort = ((0.5 * BLOCK / dens) ** (1.0 / 3.0)
                      if vol > 0 and np.isfinite(vol) else float("inf"))
        sort_dims = tuple(
            int(min(1024, max(1, round(s / a_blk_sort))))
            if np.isfinite(s) else 1 for s in sides)
        while len(sort_dims) < 3:
            sort_dims = sort_dims + (1,)
        # serpentine sort key is rank * 1024 + z in int32: keep the cell
        # count below 2^20 so the key never overflows
        while int(np.prod(sort_dims)) > (1 << 20):
            sort_dims = tuple(max(1, d // 2) for d in sort_dims)
        # hoisted MIC is valid when every block's extent + 2 cutoff fits the
        # box; 3 sort cells of slack covers blocks straddling cell (and most
        # Z-curve) boundaries, and find() verifies the true extents each
        # rebuild via the overflow guard
        if not any(np.isfinite(s) for s in sides):
            hoist_mic = True  # fully open boundary: MIC is a no-op
        else:
            # 4 sort cells of slack: corner blocks (serpentine plane
            # boundaries) span 2-3 cells per axis and densities fluctuate
            # during dynamics — a tripped extent guard (overflow bit 30)
            # means silently wrong forces, so the static choice must be
            # conservative (the per-pair-MIC kernel path is always correct)
            hoist_mic = bool(np.isfinite(a_blk_sort)) and all(
                (not np.isfinite(s))
                or s >= 2.0 * dist_cutoff + 4.0 * a_blk_sort
                for s in sides)
        finder = cls(dist_cutoff=float(dist_cutoff), atom_static=atom_static,
                     grid_dims=dims, sort_dims=sort_dims, n_pad=n_pad,
                     max_pairs=max_pairs, max_jlist=max_jlist,
                     n_steps=n_steps, hoist_mic=hoist_mic,
                     ref_sides=tuple(float(s) for s in sides),
                     block=BLOCK, lanes=LANES, cluster=CL)
        if coords is not None:
            trial = _trial_find(finder, coords, boundary)
            pair_over = int(jax.device_get(trial.overflow)) >> 20
            if pair_over > 0:
                # pair list truncated -> jcount is an underestimate; retry
                # with enough pair capacity before sizing the atom lists
                finder = dataclasses.replace(
                    finder, max_pairs=min(
                        n_blocks * n_blocks,
                        finder.max_pairs + pair_over
                        + margin_blocks * n_blocks))
                trial = _trial_find(finder, coords, boundary)
            true_pairs = int(jax.device_get(trial.n_pairs[0]))
            sized_p = int(true_pairs * 1.08) + n_blocks
            finder = dataclasses.replace(
                finder, max_pairs=max(4, ((min(n_blocks * n_blocks, sized_p)
                                           + 3) // 4) * 4))
            # trial.jcount is in CLUSTER units; size max_jlist in atoms
            max_cnt = int(jax.device_get(jnp.max(trial.jcount))) * CL
            # 2x: j-counts jump when a rebuild lands a block across a
            # serpentine plane corner (2x2x3-cell AABB), and a saturated
            # j-list silently drops real pairs until the next overflow
            # check. max_jlist sizes only per-block index windows (the work
            # arrays are sized by the TOTAL item count), so headroom is
            # nearly free.
            sized_k = min(n_pad, ((int(max_cnt * 2.0) + BLOCK + LANES - 1)
                                  // LANES) * LANES)
            total_work = int(jax.device_get(jnp.sum(
                (jnp.minimum(trial.jcount, sized_k // CL)
                 + (LANES // CL) - 1) // (LANES // CL))))
            finder = dataclasses.replace(
                finder, max_jlist=sized_k,
                max_work_items=int(total_work * 1.25) + 16)
            # occurrence capacity from the observed transpose population
            # (+25% margin for rebuild-to-rebuild fluctuation — the max
            # occurrence count is a block-neighborhood property that moves
            # by ones between rebuilds; overflow bit 29 guards the run
            # LOUDLY if it is ever exceeded, and the per-step occ gather
            # cost scales linearly with this capacity)
            ci = np.asarray(jax.device_get(trial.cluster_idx))
            npc_t = n_pad // CL
            live_ci = ci[ci < npc_t]
            max_occ_obs = int(np.bincount(live_ci).max()) if live_ci.size \
                else 1
            finder = dataclasses.replace(
                finder, max_occ=max(8, ((int(max_occ_obs * 1.25) + 4 + 3)
                                        // 4) * 4))
            # measured-extent hoist upgrade: the density heuristic above is
            # deliberately conservative; with a real configuration in hand,
            # enable the hoisted-MIC fast path whenever every observed block
            # AABB (with 25% growth slack) plus 2*cutoff fits the box. The
            # per-rebuild extent guard (overflow bit 30) still validates the
            # true extents every rebuild, so this can never go silently wrong.
            if not finder.hoist_mic:
                wrapped = np.asarray(jax.device_get(boundary.wrap(coords)))
                ordr = np.asarray(jax.device_get(trial.order))
                sb = wrapped[np.minimum(ordr, n_atoms - 1)].reshape(
                    n_blocks, BLOCK, -1)
                maxw = (sb.max(axis=1) - sb.min(axis=1)).max(axis=0)
                sides_np = np.asarray(sides, dtype=np.float64)[:maxw.shape[0]]
                if all((not np.isfinite(sides_np[k]))
                       or maxw[k] * 1.25 + 2.0 * dist_cutoff <= sides_np[k]
                       for k in range(maxw.shape[0])):
                    finder = dataclasses.replace(finder, hoist_mic=True)
        return finder

    def find(self, coords, boundary, exclusions=None, step_n=0):
        BLOCK, LANES = self.block, self.lanes
        n = coords.shape[0]
        n_pad = self.n_pad
        frac = boundary.fractional(boundary.wrap(coords))
        frac = jnp.clip(frac, 0.0, 1.0 - 1e-7)
        # Grid-binned serpentine sort: cells sized so one cell holds ~BLOCK
        # atoms (tight near-cubic AABBs), cells ordered along a boustrophedon
        # curve — unlike a Z-curve, EVERY consecutive cell pair is
        # face-adjacent, so a block that straddles a cell boundary spans
        # spatial neighbors and its AABB stays ~2 cells (Z-curve
        # discontinuities produced box-spanning AABBs at BLOCK >= 128).
        # Atoms within a cell order along the cell's traversal direction of
        # the last axis so the curve continues smoothly through the cell.
        # Reference analogue: the CUDA Morton reorder, src/kernels.jl:575-645.
        n_dims = frac.shape[1]
        dims = jnp.asarray(self.sort_dims[:n_dims], dtype=jnp.int32)
        q = jnp.minimum((frac * dims[None, :].astype(frac.dtype)).astype(
            jnp.int32), dims[None, :] - 1)

        # serpentine rank: fold axes left to right, flipping each axis'
        # direction with the parity of the rank accumulated so far
        rank = q[:, 0]
        for k in range(1, n_dims):
            nk = dims[k]
            flip = (rank & 1) == 1
            qk = jnp.where(flip, nk - 1 - q[:, k], q[:, k])
            if k == n_dims - 1:
                last_flip = flip
            rank = rank * nk + qk
        if n_dims == 1:
            last_flip = jnp.zeros(rank.shape, dtype=bool)
        # within-cell suffix: last-axis position, running in the same
        # direction as the cell column's traversal so the curve continues
        # smoothly through cell boundaries
        zq = jnp.minimum((frac[:, -1] * jnp.asarray(
            1024.0, frac.dtype)).astype(jnp.int32), 1023)
        zq = jnp.where(last_flip, 1023 - zq, zq)
        # int32 is safe: setup clamps the cell count below 2^20
        code = rank * 1024 + zq
        order = jnp.argsort(code).astype(jnp.int32)
        order = jnp.concatenate([
            order, jnp.full((n_pad - n,), n, dtype=jnp.int32)])
        inv_order = jnp.argsort(order).astype(jnp.int32)

        # sorted coordinate rows; pad rows repeat the last real atom so they
        # never stretch an AABB (batched-form gather: 1-D gathers are ~20x
        # slower on TPU)
        wrapped = boundary.wrap(coords)
        safe = jnp.minimum(order, n - 1)
        b = self.n_blocks
        s3 = wrapped.T[:, safe]
        s3b = s3.reshape(-1, b, BLOCK)
        mins = jnp.min(s3b, axis=2)   # (3, B)
        maxs = jnp.max(s3b, axis=2)
        centers = 0.5 * (mins + maxs)
        exts = 0.5 * (maxs - mins)

        # pairwise AABB MIC distance -> candidate j-blocks per i-block.
        # Orthorhombic: Cartesian AABB gaps under independent per-axis MIC —
        # an unconditional lower bound on every contained pair distance
        # (min_m|a+d+mL| >= min_m|a+mL| - |d|, per axis). Triclinic:
        # per-axis MIC is NOT independent (back-substitution couples axes),
        # so Cartesian center-gaps are not conservative; use FRACTIONAL
        # AABBs instead (the reference CUDA tile engine's dedicated
        # triclinic variant, ext/MollyCUDAExt.jl:1193-1292): per fractional
        # axis, |f_k|*width_k <= |dr| (width_k = perpendicular cell width),
        # so dist >= max_k gap_f_k * width_k for any block extent.
        rc2 = self.dist_cutoff ** 2
        n_sp = coords.shape[1]
        basis = getattr(boundary, "basis", None)
        if basis is not None:
            inv_h = jnp.linalg.inv(basis.astype(s3.dtype))
            widths = 1.0 / jnp.linalg.norm(inv_h, axis=0)      # (3,)
            f3 = inv_h.T @ s3                                  # (3, n_pad)
            f3b = f3.reshape(-1, b, BLOCK)
            fmins = jnp.min(f3b, axis=2)
            fmaxs = jnp.max(f3b, axis=2)
            fcenters = 0.5 * (fmins + fmaxs)
            fexts = 0.5 * (fmaxs - fmins)
            gap2 = jnp.zeros((b, b), dtype=coords.dtype)
            for k in range(n_sp):
                dfc = fcenters[k][None, :] - fcenters[k][:, None]
                dfc = dfc - jnp.round(dfc)
                e = fexts[k]
                gap = jnp.maximum(jnp.abs(dfc) - (e[None, :] + e[:, None]),
                                  0.0) * widths[k]
                gap2 = jnp.maximum(gap2, gap * gap)
        else:
            dcs = [centers[k][None, :] - centers[k][:, None]
                   for k in range(n_sp)]
            while len(dcs) < 3:
                dcs.append(jnp.zeros_like(dcs[0]))
            dcs = mic_components(boundary, *dcs)
            gap2 = jnp.zeros((b, b), dtype=coords.dtype)
            for k in range(n_sp):
                e = exts[k]
                gap = jnp.maximum(jnp.abs(dcs[k]) - (e[None, :] + e[:, None]),
                                  0.0)
                gap2 = gap2 + gap * gap
        # HALF-ORIENTATION: keep only J >= I — each cross-block pair is
        # evaluated once (the kernel emits j-side partial forces, summed by
        # the occ_idx transpose map); the self pair J == I carries both
        # in-tile orderings. Halves the kernel's slot count, the j-gather
        # volume, AND this rebuild pipeline's candidate stage.
        iu = jnp.arange(b, dtype=jnp.int32)
        interacting = (gap2 < rc2) & (iu[None, :] >= iu[:, None])

        # compact interacting block pairs to a FLAT list (block-major order):
        # padding the per-row candidate lists to the max row length would
        # make every downstream stage ~3x wider than the real population
        t_max = self.max_pairs
        iota2 = jnp.arange(b * b, dtype=jnp.int32)
        pkeys = jnp.where(interacting.reshape(-1), iota2, jnp.int32(b * b + 1))
        if t_max > b * b:  # tiny systems: capacity rounding may exceed B^2
            pad = jnp.full((t_max - b * b,), b * b + 1, jnp.int32)
            pkeys = jnp.concatenate([pkeys, pad])
            iota2 = jnp.concatenate([iota2, jnp.zeros_like(pad)])
        sk, sv = jax.lax.sort_key_val(pkeys, iota2)
        pair_ok = sk[:t_max] <= b * b
        # int32 div/mod lower to ~40-op VPU sequences (~38 ns/element
        # measured); b is a power of two whenever n_pad is, so decode with
        # shifts
        if b & (b - 1) == 0:
            sh = b.bit_length() - 1
            q, r = sv[:t_max] >> sh, sv[:t_max] & (b - 1)
        else:
            q, r = sv[:t_max] // b, sv[:t_max] % b
        pair_i = jnp.where(pair_ok, q, b - 1)
        pair_j = jnp.where(pair_ok, r, 0)
        total_pairs = jnp.sum(interacting).astype(jnp.int32)
        pair_overflow = jnp.maximum(total_pairs - t_max, 0).astype(jnp.int32)

        # refine to per-ATOM candidates: every atom of every candidate block,
        # kept if within dist_cutoff of the i-AABB (batched-form gathers)
        # (T/4, 128) compute layout: (T, 32) would waste 3/4 of every VPU
        # lane row. Each 128-lane row holds 4 pairs; per-pair scalars repeat
        # 32x within the row.
        lane = jnp.arange(BLOCK, dtype=jnp.int32)
        cand = (pair_j[:, None] * BLOCK + lane[None, :])    # (T, BLOCK)
        cand_flat = cand.reshape(-1)
        t4 = t_max // 4
        # block-row gather: candidate coords are whole 128-atom blocks, so
        # index by the T block ids (slice size (3, 1, BLOCK)) instead of
        # T*BLOCK individual elements — ~100x fewer gather descriptors than
        # s3[:, cand_flat] for the same bytes
        cxyz = (s3.reshape(-1, b, BLOCK)[:, pair_j]
                .reshape(-1, t4, 4 * BLOCK))                # (3, T/4, 128)

        def per_lane(v):  # (T,) -> (T/4, 128)
            return jnp.repeat(v.reshape(t4, 4), BLOCK, axis=1)

        if basis is not None:
            # fractional per-axis gaps (conservative for any extent; see the
            # block-block culling comment above)
            fxyz = (f3.reshape(-1, b, BLOCK)[:, pair_j]
                    .reshape(-1, t4, 4 * BLOCK))
            d2 = jnp.zeros((t4, 4 * BLOCK), dtype=coords.dtype)
            for k in range(n_sp):
                df = fxyz[k] - per_lane(fcenters[k][pair_i])
                df = df - jnp.round(df)
                g = jnp.maximum(jnp.abs(df) - per_lane(fexts[k][pair_i]),
                                0.0) * widths[k]
                d2 = jnp.maximum(d2, g * g)
        else:
            dcs = [cxyz[k] - per_lane(centers[k][pair_i])
                   for k in range(n_sp)]
            while len(dcs) < 3:
                dcs.append(jnp.zeros_like(dcs[0]))
            dcs = mic_components(boundary, *dcs)
            d2 = jnp.zeros((t4, 4 * BLOCK), dtype=coords.dtype)
            for k in range(n_sp):
                g = jnp.maximum(jnp.abs(dcs[k]) - per_lane(exts[k][pair_i]),
                                0.0)
                d2 = d2 + g * g
        keep = (per_lane(pair_ok.astype(jnp.int32)) * (d2 < rc2)
                ).reshape(-1) > 0                           # (T*BLOCK,)

        # reduce atom keeps to CLUSTER keeps (OR over the CL members): a
        # cluster is listed when any member is in range; the kernel's
        # per-slot r^2 test culls the rest. The compact sort then runs on
        # T*BLOCK/CL elements and the per-step coordinate gather on
        # P*LANES/CL indices — the per-index gather cost (the roofline's
        # 0.96 ms line) divides by CL.
        CL = self.cluster
        BC = BLOCK // CL                                    # clusters/block
        CPL = LANES // CL                                   # clusters/item
        npc = n_pad // CL                                   # total clusters
        keep_c = jnp.any(keep.reshape(t_max, BC, CL), axis=2)  # (T, BC)
        cand_c = (pair_j[:, None] * BC
                  + jnp.arange(BC, dtype=jnp.int32)[None, :])  # (T, BC)

        # one global compact sort: the pair list is block-major, so kept
        # clusters land grouped by i-block in column order
        tbc = t_max * BC
        fidx = jnp.arange(tbc, dtype=jnp.int32)
        akeys = jnp.where(keep_c.reshape(-1), fidx, tbc + fidx)
        sk, svals = jax.lax.sort_key_val(akeys, cand_c.reshape(-1))
        svals = jnp.where(sk < tbc, svals, npc)

        # per-block kept counts: per-pair row sums (T,) then a one-hot MXU
        # segment-sum over pair_i — replaces a 1.15M-element cumsum +
        # searchsorted (the cumsum alone measured ~0.8 ms at 6mrr scale);
        # kstart is then a length-B cumsum, consistent with the block-major
        # compaction order of the sort above
        row_kept = jnp.sum(keep_c.astype(jnp.float32), axis=1)  # (T,)
        onehot_i = (pair_i[:, None]
                    == jnp.arange(b, dtype=jnp.int32)[None, :]
                    ).astype(jnp.float32)                   # (T, B)
        jcount = jax.lax.dot_general(
            row_kept[None, :], onehot_i, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)[0].astype(jnp.int32)
        kstart = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(jcount)[:-1]])
        kk = self.max_jlist // CL                           # cluster capacity
        j_overflow = jnp.maximum(jnp.max(jcount) - kk, 0).astype(jnp.int32)

        # flat (i-block, j-chunk) work items via one small sort
        nchunk = kk // CPL
        cpr = (jnp.minimum(jcount, kk) + CPL - 1) // CPL   # chunks per row
        row_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(cpr.astype(jnp.int32))[:-1]])
        total = jnp.sum(cpr).astype(jnp.int32)
        # cap at b*nchunk: jnp slicing clamps silently, so a larger
        # max_work_items would desync flat_i's shape from p_max downstream
        p_max = (min(self.max_work_items, b * nchunk)
                 if self.max_work_items else (b * nchunk))
        c_idx = jnp.broadcast_to(jnp.arange(nchunk, dtype=jnp.int32)[None, :],
                                 (b, nchunk))
        live_c = c_idx < cpr[:, None]
        wkeys = jnp.where(live_c, row_start[:, None] + c_idx,
                          jnp.int32(b * nchunk + 1)).reshape(-1)
        v_blk = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.int32)[:, None], (b, nchunk)).reshape(-1)
        _, flat_i_full, flat_c_full = jax.lax.sort(
            (wkeys, v_blk, c_idx.reshape(-1)), num_keys=1)
        flat_i = flat_i_full[:p_max]
        flat_c = flat_c_full[:p_max]
        # Padding items (p >= total) MUST map to the last live i-block: the
        # kernel's output BlockSpec indexes f_ref by flat_i[p], and Pallas
        # write-back assumes each output block is visited in ONE contiguous
        # run — arbitrary padding values make it revisit earlier blocks and
        # flush stale VMEM over their accumulated forces (whole blocks of
        # garbage forces, TPU-compiled only; interpret mode hides it).
        live_it = jnp.arange(p_max, dtype=jnp.int32) < total
        last_blk = flat_i_full[jnp.maximum(total - 1, 0)]
        flat_i = jnp.where(live_it, flat_i, last_blk)
        flat_c = jnp.where(live_it, flat_c, 0)
        work_overflow = jnp.maximum(total - p_max, 0).astype(jnp.int32)

        # work-layout j position tiles: item p covers kept clusters
        # [kstart[i] + c*CPL, ...); tail lanes past jcount -> sentinel.
        # svals is stacked to 2 rows so the gather takes the batched form.
        lanes_c = jnp.arange(CPL, dtype=jnp.int32)
        offs = flat_c[:, None] * CPL + lanes_c[None, :]     # (P, CPL)
        src = jnp.minimum(kstart[flat_i][:, None] + offs, tbc - 1)
        sv2 = jnp.stack([svals, svals])
        gathered = sv2[:, src][0]
        # padding items (p >= total) alias the last live block's chunk 0, so
        # the offs < jcount test alone would hand them REAL cluster ids —
        # inflating the occ transpose (max_occ, hence the per-step npc*K
        # j-partial gather) and duplicating j-coordinate gathers. Sentinel
        # them out with live_it.
        valid = (offs < jcount[flat_i][:, None]) & live_it[:, None]
        ci2 = jnp.where(valid, gathered, npc)               # (P, CPL)
        cluster_idx = ci2.reshape(p_max * CPL)
        # derived per-atom positions, member-strided: lane l of item p holds
        # member (l // CPL) of cluster ci2[p, l % CPL] — matching the
        # kernel's concatenation of the (3*CL, CPL) coordinate tile rows.
        # Sentinel clusters map every member lane to the n_pad zero column.
        mem = jnp.arange(CL, dtype=jnp.int32)
        wi = ci2[:, None, :] * CL + mem[None, :, None]      # (P, CL, CPL)
        work_idx = jnp.where(ci2[:, None, :] < npc, wi,
                             n_pad).reshape(p_max * LANES)

        # occurrence transpose map: for each j-cluster, the padded list of
        # positions in the flattened cluster_idx where it occurs — the
        # rebuild-static index set that turns the kernel's per-lane j-side
        # partial forces into per-atom sums with ONE batched gather (scatter
        # is ~0.4 us/element on TPU; this is ~2.4 cycles/index)
        K = self.max_occ
        PC = p_max * CPL
        occ_pos = jnp.arange(PC, dtype=jnp.int32)
        sk2, spos = jax.lax.sort_key_val(cluster_idx, occ_pos)
        bounds = jnp.searchsorted(
            sk2, jnp.arange(npc + 1, dtype=jnp.int32)).astype(jnp.int32)
        starts, counts = bounds[:-1], jnp.diff(bounds)
        kks = jnp.arange(K, dtype=jnp.int32)
        src_o = jnp.minimum(starts[:, None] + kks[None, :], PC - 1)
        sp2 = jnp.stack([spos, spos])
        occ_g = sp2[:, src_o][0]                            # (npc, K)
        occ_idx = jnp.where(kks[None, :] < counts[:, None], occ_g,
                            PC).reshape(npc * K)
        occ_overflow = (jnp.max(counts) > K).astype(jnp.int32)

        # static fields pack once per rebuild when available
        j_static = None
        a_stat = None
        is_real = order < n
        if self.atom_static is not None:
            stat = jnp.where(is_real[None, :],
                             self.atom_static[:, safe], 0.0)
            ids = jnp.where(is_real, order, n).astype(self.atom_static.dtype)
            stat4 = jnp.concatenate([stat, ids[None, :]])     # (4, n_pad)
            a_stat = stat4.reshape(4, b, BLOCK).transpose(1, 0, 2)
            # j-side row 4: sorted position (exact in f32 below 2^24), for
            # the kernel's same-block test (energy weights + j-partial mask)
            stat5 = jnp.concatenate([
                stat4, jnp.arange(n_pad, dtype=stat4.dtype)[None, :]])
            stat5 = jnp.concatenate([
                stat5, jnp.asarray([0.0, 0.0, 0.0, n, n_pad],
                                   self.atom_static.dtype)[:, None]], axis=1)
            j_static = stat5[:, work_idx]                     # (5, P*LANES)

        # windowed exclusion bitmaps in sorted block layout (rebuild-static):
        # one (4, n_pad) gather — the old (P, BLOCK, LANES) precomputed mask
        # cost ~2.7 ms/rebuild in 32 compare rounds and 49 MB of carry
        a_bits = None
        if exclusions is not None and getattr(exclusions, "excl_bits",
                                              None) is not None:
            bits4 = jnp.concatenate([exclusions.excl_bits.T,
                                     exclusions.spec_bits.T])  # (4, N+1)
            sidx = jnp.where(is_real, order, n)  # pad atoms -> zero row N
            a_bits = bits4[:, sidx].reshape(4, b, BLOCK).transpose(1, 0, 2)

        overflow = ((occ_overflow << 29)
                    | (jnp.minimum(pair_overflow, 0x1FF) << 20)
                    | (jnp.minimum(j_overflow, 0x3FF) << 10)
                    | jnp.minimum(work_overflow, 0x3FF))
        if self.hoist_mic:
            # guard: hoisted per-entry MIC needs extent + 2 rc <= box width
            # on every periodic axis for every block (checked on true
            # extents; triclinic uses the perpendicular cell widths)
            basis = getattr(boundary, "basis", None)
            if basis is None:
                widths_k = boundary.side_lengths
            else:
                vol = jnp.abs(jnp.linalg.det(basis))
                widths_k = jnp.stack([
                    vol / jnp.linalg.norm(jnp.cross(basis[(k + 1) % 3],
                                                    basis[(k + 2) % 3]))
                    for k in range(3)])
            width = 2.0 * exts  # (3, B) full AABB widths
            for k in range(coords.shape[1]):
                box_k = widths_k[k]
                bad = jnp.isfinite(box_k) & jnp.any(
                    width[k] + 2.0 * self.dist_cutoff > box_k)
                overflow = overflow | (bad.astype(jnp.int32) << 30)
        return BlockPairs(order=order, inv_order=inv_order, jcount=jcount,
                          flat_i=flat_i, row_start=row_start,
                          n_items=jnp.minimum(total, p_max).reshape(1),
                          n_pairs=total_pairs.reshape(1),
                          work_idx=work_idx, cluster_idx=cluster_idx,
                          occ_idx=occ_idx, j_static=j_static,
                          centers=centers, a_stat=a_stat, a_bits=a_bits,
                          overflow=overflow,
                          step_built=jnp.asarray(step_n, jnp.int32))


_register(BlockPairFinder, ["dist_cutoff", "atom_static"],
          ["grid_dims", "sort_dims", "n_pad", "max_pairs", "max_jlist",
           "max_work_items", "n_steps", "hoist_mic", "ref_sides",
           "resetup_drift", "block", "lanes", "cluster", "max_occ"])


def decode_overflow(ov):
    """Turn the packed overflow word into cause-specific guidance.

    Bit layout (see `find`): bit 30 = hoisted-MIC extent guard; bit 29 =
    j-occurrence window overflow; bits 20-28 = block-pair overflow;
    bits 10-19 = per-block j-list overflow; bits 0-9 = work-item overflow.
    Returns a list of human-readable causes."""
    ov = int(ov)
    causes = []
    if ov & (1 << 30):
        causes.append(
            "hoisted-MIC extent guard: a block AABB plus 2*cutoff exceeds a "
            "periodic box side (box shrank or blocks grew); re-setup the "
            "finder for the current box or use hoist_mic=False")
    if ov & (1 << 29):
        causes.append(
            "j-occurrence window overflow: a j-cluster is listed by more "
            "work items than max_occ — j-side forces would be dropped; "
            "raise BlockPairFinder.max_occ")
    pair = (ov >> 20) & 0x1FF
    if pair:
        causes.append(f"block-pair list overflow by >= {pair}; raise "
                      "max_pairs (BlockPairFinder.setup max_nbr_blocks)")
    jl = (ov >> 10) & 0x3FF
    if jl:
        causes.append(f"per-block j-list overflow by >= {jl}; raise "
                      "max_jlist")
    wk = ov & 0x3FF
    if wk:
        causes.append(f"work-item list overflow by >= {wk}; raise "
                      "max_work_items")
    if not causes:
        causes.append(f"overflow word {ov}")
    return causes
