"""Decompose the BlockPairFinder.find() rebuild cost on the 6mrr system.

Deltas between full / no-exclusion variants isolate the pair_mask build;
standalone stage replicas (same math and shapes as find()) cover the rest.
All timings use queued dispatch (tools/qtime.py) — per-call blocking reads
a flat ~28 ms tunnel-latency floor on this platform and is useless.

Run on TPU: python tools/rebuild_decompose.py
"""
import os

os.environ.setdefault("MOLLYTPU_LANES", "512")

import jax
import jax.numpy as jnp

import bench
from qtime import qtime


def main():
    sys = bench.build()
    finder = sys.neighbor_finder
    coords, boundary, excl = sys.coords, sys.boundary, sys.exclusions

    full = qtime(jax.jit(lambda c: finder.find(c, boundary, excl, 0)), coords)
    print(f"find full (with exclusion mask): {full:.3f} ms", flush=True)

    noex = qtime(jax.jit(lambda c: finder.find(c, boundary, None, 0)), coords)
    print(f"find without exclusions:         {noex:.3f} ms "
          f"(mask+tables delta = {full - noex:.3f})", flush=True)

    BLOCK, LANES = finder.block, finder.lanes
    n = coords.shape[0]
    n_pad = finder.n_pad
    b = finder.n_blocks
    t_max = finder.max_pairs
    nbs = jax.jit(lambda c: finder.find(c, boundary, excl, 0))(coords)
    p_max = min(finder.max_work_items, b * (finder.max_jlist // LANES))
    print(f"config: BLOCK={BLOCK} LANES={LANES} b={b} t_max={t_max} "
          f"max_jlist={finder.max_jlist} p_max={p_max} "
          f"n_pairs={int(nbs.n_pairs[0])} n_items={int(nbs.n_items[0])} "
          f"max_jcount={int(jnp.max(nbs.jcount))}", flush=True)

    @jax.jit
    def stage_sort(c):
        frac = boundary.fractional(boundary.wrap(c))
        frac = jnp.clip(frac, 0.0, 1.0 - 1e-7)
        dims = jnp.asarray(finder.sort_dims[:3], dtype=jnp.int32)
        q = jnp.minimum((frac * dims[None, :].astype(frac.dtype)).astype(
            jnp.int32), dims[None, :] - 1)
        rank = q[:, 0]
        for k in range(1, 3):
            nk = dims[k]
            flip = rank % 2 == 1
            qk = jnp.where(flip, nk - 1 - q[:, k], q[:, k])
            if k == 2:
                last_flip = flip
            rank = rank * nk + qk
        zq = jnp.minimum((frac[:, -1] * 1024.0).astype(jnp.int32), 1023)
        zq = jnp.where(last_flip, 1023 - zq, zq)
        code = rank * 1024 + zq
        order = jnp.argsort(code).astype(jnp.int32)
        order = jnp.concatenate([order,
                                 jnp.full((n_pad - n,), n, jnp.int32)])
        inv_order = jnp.argsort(order).astype(jnp.int32)
        return order, inv_order

    print(f"  sort+argsort+inv:          {qtime(stage_sort, coords):.3f} ms",
          flush=True)
    order, _ = stage_sort(coords)

    @jax.jit
    def stage_aabb_gap(c, order):
        from mollytpu.ops.blockpairs import mic_components
        wrapped = boundary.wrap(c)
        safe = jnp.minimum(order, n - 1)
        s3 = wrapped.T[:, safe]
        s3b = s3.reshape(-1, b, BLOCK)
        mins = jnp.min(s3b, axis=2)
        maxs = jnp.max(s3b, axis=2)
        centers = 0.5 * (mins + maxs)
        exts = 0.5 * (maxs - mins)
        rc2 = finder.dist_cutoff ** 2
        dcs = [centers[k][None, :] - centers[k][:, None] for k in range(3)]
        dcs = mic_components(boundary, *dcs)
        gap2 = jnp.zeros((b, b), dtype=c.dtype)
        for k in range(3):
            e = exts[k]
            gap = jnp.maximum(jnp.abs(dcs[k]) - (e[None, :] + e[:, None]),
                              0.0)
            gap2 = gap2 + gap * gap
        return gap2 < rc2, s3, centers, exts

    print(f"  AABB+gap matrix:           "
          f"{qtime(stage_aabb_gap, coords, order):.3f} ms", flush=True)
    interacting, s3, centers, exts = stage_aabb_gap(coords, order)

    @jax.jit
    def stage_paircompact(interacting):
        iota2 = jnp.arange(b * b, dtype=jnp.int32)
        pkeys = jnp.where(interacting.reshape(-1), iota2,
                          jnp.int32(b * b + 1))
        sk, sv = jax.lax.sort_key_val(pkeys, iota2)
        pair_ok = sk[:t_max] <= b * b
        pair_i = jnp.where(pair_ok, sv[:t_max] // b, b - 1)
        pair_j = jnp.where(pair_ok, sv[:t_max] % b, 0)
        return pair_ok, pair_i, pair_j

    print(f"  pair compaction sort:      "
          f"{qtime(stage_paircompact, interacting):.3f} ms", flush=True)
    pair_ok, pair_i, pair_j = stage_paircompact(interacting)

    @jax.jit
    def stage_refine(s3, centers, exts, pair_ok, pair_i, pair_j):
        from mollytpu.ops.blockpairs import mic_components
        rc2 = finder.dist_cutoff ** 2
        lane = jnp.arange(BLOCK, dtype=jnp.int32)
        cand = (pair_j[:, None] * BLOCK + lane[None, :])
        cand_flat = cand.reshape(-1)
        t4 = t_max // 4
        cxyz = s3[:, cand_flat].reshape(-1, t4, 4 * BLOCK)

        def per_lane(v):
            return jnp.repeat(v.reshape(t4, 4), BLOCK, axis=1)

        dcs = [cxyz[k] - per_lane(centers[k][pair_i]) for k in range(3)]
        dcs = mic_components(boundary, *dcs)
        d2 = jnp.zeros((t4, 4 * BLOCK), dtype=s3.dtype)
        for k in range(3):
            g = jnp.maximum(jnp.abs(dcs[k]) - per_lane(exts[k][pair_i]), 0.0)
            d2 = d2 + g * g
        keep = (per_lane(pair_ok.astype(jnp.int32)) * (d2 < rc2)
                ).reshape(-1) > 0
        return keep, cand_flat

    print(f"  per-atom refine:           "
          f"{qtime(stage_refine, s3, centers, exts, pair_ok, pair_i, pair_j):.3f} ms",
          flush=True)
    keep, cand_flat = stage_refine(s3, centers, exts, pair_ok, pair_i, pair_j)

    CL = getattr(finder, "cluster", 1) or 1
    BC = BLOCK // CL

    @jax.jit
    def stage_compactsort(keep, cand_flat):
        # cluster-granular compact (production form): OR member keeps, sort
        # T*BLOCK/CL cluster slots
        keep_c = jnp.any(keep.reshape(t_max, BC, CL), axis=2).reshape(-1)
        cand_c = cand_flat.reshape(t_max, BC, CL)[:, :, 0].reshape(-1) // CL
        tbc = t_max * BC
        fidx = jnp.arange(tbc, dtype=jnp.int32)
        akeys = jnp.where(keep_c, fidx, tbc + fidx)
        sk, svals = jax.lax.sort_key_val(akeys, cand_c)
        return jnp.where(sk < tbc, svals, n_pad // CL)

    print(f"  global compact sort (tbc={t_max * BC}): "
          f"{qtime(stage_compactsort, keep, cand_flat):.3f} ms", flush=True)

    @jax.jit
    def stage_counts(keep, pair_i):
        kcum = jnp.cumsum(keep.astype(jnp.int32))
        pstart = jnp.searchsorted(pair_i, jnp.arange(b + 1, dtype=jnp.int32),
                                  method="sort").astype(jnp.int32)
        bnd = jnp.where(pstart > 0, kcum[jnp.maximum(pstart * BLOCK - 1, 0)],
                        0)
        return (bnd[1:] - bnd[:-1]).astype(jnp.int32), bnd[:-1]

    print(f"  cumsum+counts:             "
          f"{qtime(stage_counts, keep, pair_i):.3f} ms", flush=True)

    # mask build replica at observed shapes
    svals = stage_compactsort(keep, cand_flat)
    jcount, kstart = stage_counts(keep, pair_i)
    w_e = excl.excl_table.shape[1]
    w_s = excl.spec_table.shape[1]
    flat_i = nbs.flat_i
    work_idx = nbs.work_idx
    pm = work_idx.shape[0] // LANES
    safe = jnp.minimum(order, n - 1)

    @jax.jit
    def stage_mask(order, work_idx, flat_i):
        order_ext = jnp.concatenate([order, jnp.full((1,), n, jnp.int32)])
        oe2 = jnp.stack([order_ext, order_ext])
        jid = oe2[:, work_idx][0].reshape(pm, 1, LANES)
        ie = excl.excl_table[safe].reshape(b, BLOCK, w_e)
        isp = excl.spec_table[safe].reshape(b, BLOCK, w_s)
        ie_p = ie[flat_i]
        isp_p = isp[flat_i]
        m_e = jnp.zeros((pm, BLOCK, LANES), bool)
        for w in range(w_e):
            m_e = m_e | (ie_p[:, :, w][:, :, None] == jid)
        m_s = jnp.zeros((pm, BLOCK, LANES), bool)
        for w in range(w_s):
            m_s = m_s | (isp_p[:, :, w][:, :, None] == jid)
        return m_e.astype(jnp.int8) | (m_s.astype(jnp.int8) << 1)

    print(f"  pair_mask build (w={w_e}+{w_s}, P={pm}): "
          f"{qtime(stage_mask, order, work_idx, flat_i):.3f} ms", flush=True)

    @jax.jit
    def stage_jgather(svals, kstart, flat_i, jcount):
        # cluster-granular work tiles + the derived member-strided work_idx
        CPL = LANES // CL
        flat_c = jnp.zeros_like(flat_i)
        lanes_c = jnp.arange(CPL, dtype=jnp.int32)
        offs = flat_c[:, None] * CPL + lanes_c[None, :]
        src = jnp.minimum(kstart[flat_i][:, None] + offs, t_max * BC - 1)
        sv2 = jnp.stack([svals, svals])
        gathered = sv2[:, src][0]
        valid = offs < jcount[flat_i][:, None]
        ci2 = jnp.where(valid, gathered, n_pad // CL)
        mem = jnp.arange(CL, dtype=jnp.int32)
        wi = ci2[:, None, :] * CL + mem[None, :, None]
        return jnp.where(ci2[:, None, :] < n_pad // CL, wi, n_pad).reshape(-1)

    svals_c = stage_compactsort(keep, cand_flat)
    jcount_c = (jcount + CL - 1) // CL
    print(f"  work tiles gather:         "
          f"{qtime(stage_jgather, svals_c, kstart, flat_i, jcount_c):.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
