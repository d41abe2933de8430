"""Pairwise force/energy evaluation: dense all-pairs and neighbor-list paths.

This is the XLA analogue of the reference's force engine hot loops
(/root/reference/src/force.jl:722-969 CPU, src/kernels.jl:114-567 GPU): the
per-pair scalar kernel is a composed sum of interaction energies; its
distance-derivative comes from one fused value_and_grad, forces scatter with
segment-sum instead of atomics, and the pair virial accumulates as
-(dU/dr / r) dr (x) dr, matching the reference's dr (x) f convention
(src/force.jl:849-851).

TPU layout: pair geometry is kept as per-component (N, K) / (N, N) arrays —
never (N, K, 3) — because TPU tiling pads the minor dimension to 128 and a
trailing 3 wastes 43x memory/bandwidth. The separately-optimized Pallas tile
kernel (pallas_pairwise.py) implements the same contract for the dominant
LJ + Coulomb/RF case.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp



def _scatter_add_rows(vals, idx, num_segments):
    """Row scatter-add via .at[].add — jax.ops.segment_sum lowers ~400x
    slower on TPU."""
    return jnp.zeros((num_segments, vals.shape[1]), vals.dtype).at[idx].add(
        vals)

def _split_inters(inters):
    conservative = tuple(i for i in inters if not getattr(i, "uses_velocity", False))
    velocity_dep = tuple(i for i in inters if getattr(i, "uses_velocity", False))
    return conservative, velocity_dep


def _pair_energy_fn(inters):
    def e(r, ai, aj, special):
        tot = 0.0
        for inter in inters:
            tot = tot + inter.energy(r, ai, aj, special)
        return tot

    return e


def _gather_atoms(atoms, idx):
    return jax.tree.map(lambda a: a[idx] if a is not None else None, atoms)


def dense_pair_mask(n_atoms, exclusions, dtype=jnp.int8):
    """(N, N) pair codes: 0 normal, 1 excluded (incl. diagonal), 2 special."""
    mask = jnp.zeros((n_atoms, n_atoms), dtype=dtype)
    mask = mask.at[jnp.arange(n_atoms), jnp.arange(n_atoms)].set(1)
    if exclusions is not None:
        ei, ej = exclusions.excl_i, exclusions.excl_j
        mask = mask.at[ei, ej].set(1)
        mask = mask.at[ej, ei].set(1)
        si, sj = exclusions.spec_i, exclusions.spec_j
        mask = mask.at[si, sj].set(2)
        mask = mask.at[sj, si].set(2)
    return mask


def _dense_geometry(coords, boundary):
    """Per-component (N, N) displacement arrays dr[d][i, j] = xj_d - xi_d
    (minimum image) and r^2."""
    d = coords.shape[1]
    comps = tuple(coords[:, k] for k in range(d))
    diffs = tuple(c[None, :] - c[:, None] for c in comps)
    drs = boundary.mic_parts(diffs)
    r2 = sum(x * x for x in drs)
    return drs, r2


def _neighbor_geometry(coords, boundary, safe_j):
    d = coords.shape[1]
    comps = tuple(coords[:, k] for k in range(d))
    diffs = tuple(c[safe_j] - c[:, None] for c in comps)
    drs = boundary.mic_parts(diffs)
    r2 = sum(x * x for x in drs)
    return drs, r2


def _virial_from_components(coef, drs, dtype, scale=1.0):
    d = len(drs)
    rows = []
    for a in range(d):
        row = [jnp.sum(coef * drs[a] * drs[b]) for b in range(d)]
        rows.append(jnp.stack(row))
    return (-scale) * jnp.stack(rows).astype(dtype)


def dense_energy(inters, atoms, coords, boundary, pair_mask):
    """All-pairs energy: 1/2 sum over ordered pairs (one fused elementwise
    pass over (N, N))."""
    if not inters:
        return jnp.zeros((), dtype=coords.dtype)
    e_fn = _pair_energy_fn(inters)
    _, d2 = _dense_geometry(coords, boundary)
    live = pair_mask != 1
    special = pair_mask == 2
    r = jnp.sqrt(jnp.where(live, d2, 1.0))

    def row(ri, ai, live_i, spec_i):
        return jax.vmap(lambda rr, aj, lv, sp:
                        jnp.where(lv, e_fn(jnp.where(lv, rr, 1.0), ai, aj, sp), 0.0)
                        )(ri, atoms, live_i, spec_i)

    e = jax.vmap(row)(r, atoms, live, special)
    return 0.5 * jnp.sum(e)


def dense_forces(inters, atoms, coords, boundary, pair_mask, velocities=None,
                 step_n=0, needs_virial=False):
    """All-pairs forces (N, D) and virial (D, D)."""
    n, d = coords.shape
    zero_vir = jnp.zeros((d, d), dtype=coords.dtype)
    if not inters:
        return jnp.zeros_like(coords), zero_vir
    cons, veldep = _split_inters(inters)

    drs, d2 = _dense_geometry(coords, boundary)
    live = pair_mask != 1
    special = pair_mask == 2
    r = jnp.sqrt(jnp.where(live, d2, 1.0))

    forces = jnp.zeros_like(coords)
    vir = zero_vir

    if cons:
        e_fn = _pair_energy_fn(cons)
        g_fn = jax.grad(e_fn, argnums=0)

        def row(ri, ai, live_i, spec_i):
            return jax.vmap(lambda rr, aj, lv, sp:
                            jnp.where(lv, g_fn(jnp.where(lv, rr, 1.0), ai, aj, sp), 0.0)
                            )(ri, atoms, live_i, spec_i)

        g = jax.vmap(row)(r, atoms, live, special)  # dU/dr per ordered pair
        coef = g / r
        # F_i = sum_j (dU/dr / r) dr_ij ; both orderings present, no scatter
        fcols = [jnp.sum(coef * drs[k], axis=1) for k in range(d)]
        forces = forces + jnp.stack(fcols, axis=-1)
        if needs_virial:
            vir = vir + _virial_from_components(coef, drs, coords.dtype, scale=0.5)

    for inter in veldep:
        ii = jnp.arange(n)
        r_safe = jnp.where(live, r, 1.0)

        def row_f(dr_i, ri, i_idx, ai, vi, live_i, spec_i):
            def one(drx, dry, drz, rr, j_idx, aj, vj, lv, sp):
                drv = jnp.stack([drx, dry, drz])
                f = inter.force_vec(drv, rr, i_idx, j_idx, ai, aj, vi, vj, sp, step_n)
                return jnp.where(lv, 1.0, 0.0) * f

            return jax.vmap(one)(dr_i[0], dr_i[1], dr_i[2], ri, ii, atoms,
                                 velocities, live_i, spec_i)

        fv = jax.vmap(row_f)((drs[0], drs[1], drs[2]), r_safe, ii, atoms,
                             velocities, live, special)  # (N, N, D): force on j
        forces = forces - jnp.sum(fv, axis=1)
        if needs_virial:
            drv = jnp.stack(drs, axis=-1)
            vir = vir + 0.5 * jnp.einsum("ijd,ije->de", drv, fv)

    return forces, vir


def neighbor_energy(inters, atoms, coords, boundary, neighbors):
    """Energy over the compact (N, K) neighbor table (each pair once)."""
    if not inters or neighbors is None:
        return jnp.zeros((), dtype=coords.dtype)
    n = coords.shape[0]
    e_fn = _pair_energy_fn(inters)
    idx = neighbors.idx
    live = idx < n
    safe_j = jnp.minimum(idx, n - 1)
    _, d2 = _neighbor_geometry(coords, boundary, safe_j)
    r = jnp.sqrt(jnp.where(live, d2, 1.0))
    aj = _gather_atoms(atoms, safe_j)

    def row(ri, a_i, a_j, live_i, spec_i):
        return jax.vmap(lambda rr, ajj, lv, sp:
                        jnp.where(lv, e_fn(jnp.where(lv, rr, 1.0), a_i, ajj, sp), 0.0)
                        )(ri, a_j, live_i, spec_i)

    e = jax.vmap(row)(r, atoms, aj, live, neighbors.special)
    return jnp.sum(e)


def neighbor_forces(inters, atoms, coords, boundary, neighbors, velocities=None,
                    step_n=0, needs_virial=False):
    """Forces and virial over the compact neighbor table."""
    n, d = coords.shape
    zero_vir = jnp.zeros((d, d), dtype=coords.dtype)
    if not inters or neighbors is None:
        return jnp.zeros_like(coords), zero_vir
    cons, veldep = _split_inters(inters)
    idx = neighbors.idx
    live = idx < n
    safe_j = jnp.minimum(idx, n - 1)
    drs, d2 = _neighbor_geometry(coords, boundary, safe_j)
    r = jnp.sqrt(jnp.where(live, d2, 1.0))
    aj = _gather_atoms(atoms, safe_j)

    forces = jnp.zeros_like(coords)
    vir = zero_vir

    if cons:
        e_fn = _pair_energy_fn(cons)
        g_fn = jax.grad(e_fn, argnums=0)

        def row(ri, a_i, a_j, live_i, spec_i):
            return jax.vmap(lambda rr, ajj, lv, sp:
                            jnp.where(lv, g_fn(jnp.where(lv, rr, 1.0), a_i, ajj, sp), 0.0)
                            )(ri, a_j, live_i, spec_i)

        g = jax.vmap(row)(r, atoms, aj, live, neighbors.special)
        coef = g / r  # (N, K)
        flat_j = safe_j.reshape(-1)
        fcols = []
        for k in range(d):
            fk = coef * drs[k]  # contribution to row atom i along axis k
            col = jnp.sum(fk, axis=1)
            col = col + jnp.zeros((n,), fk.dtype).at[flat_j].add(
                -fk.reshape(-1))
            fcols.append(col)
        forces = forces + jnp.stack(fcols, axis=-1)
        if needs_virial:
            vir = vir + _virial_from_components(coef, drs, coords.dtype, scale=1.0)

    if veldep:
        vj_all = velocities[safe_j]
        ii = jnp.arange(n)
        r_safe = jnp.where(live, r, 1.0)
        for inter in veldep:
            def row_f(dr_i, ri, i_idx, a_i, v_i, a_j, v_j, j_idx, live_i, spec_i):
                def one(drx, dry, drz, rr, ajj, vjj, jj, lv, sp):
                    drv = jnp.stack([drx, dry, drz])
                    f = inter.force_vec(drv, rr, i_idx, jj, a_i, ajj, v_i, vjj,
                                        sp, step_n)
                    return jnp.where(lv, 1.0, 0.0) * f

                return jax.vmap(one)(dr_i[0], dr_i[1], dr_i[2], ri, a_j, v_j,
                                     j_idx, live_i, spec_i)

            fv = jax.vmap(row_f)((drs[0], drs[1], drs[2]), r_safe, ii, atoms,
                                 velocities, aj, vj_all, safe_j, live,
                                 neighbors.special)  # (N, K, D): force on j
            forces = forces - jnp.sum(fv, axis=1)
            forces = forces + _scatter_add_rows(
                fv.reshape(-1, d), safe_j.reshape(-1), num_segments=n)
            if needs_virial:
                drv = jnp.stack(drs, axis=-1)
                vir = vir + jnp.einsum("ikd,ike->de", drv, fv)

    return forces, vir
