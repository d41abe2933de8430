"""Runtime launch-config autotuner for the Pallas block-pair kernel.

TPU analogue of the reference's per-(device, N, box, interaction) tile-shape
benchmark with a cached global launch config
(/root/reference/ext/MollyCUDAExt.jl:566-639, `autotune_launch_config` +
`LAUNCH_CONFIG_CACHE`).  Candidate (block, lanes) tile shapes are timed on
the live device against the *actual* system configuration — one neighbor
rebuild (`BlockPairFinder.find`) plus one fused force evaluation
(`pallas_block_nonbonded`) — and scored by amortized per-step cost
`t_force + t_find / n_steps` where `n_steps` is the rebuild cadence.  The
winner is cached in-process and on disk (`~/.cache/mollytpu/autotune.json`)
keyed by device kind, atom count, box shape, cutoff, dtype and the fused
interaction signature, so production runs only ever pay the sweep once per
(machine, workload) pair.

Usage:
    finder = tuned_block_pairs(boundary, cutoff, n_atoms, coords=coords,
                               atoms=atoms, exclusions=excl,
                               inters=nl_inters, n_steps=cadence)
falls back to a default-shape `BlockPairFinder.setup` whenever the
interactions are outside the fused set or the sweep is disabled
(`MOLLYTPU_AUTOTUNE=0`).
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

from .blockpairs import BLOCK as _DEFAULT_BLOCK
from .blockpairs import LANES as _DEFAULT_LANES
from .blockpairs import BlockPairFinder

# (block, lanes) sweep candidates.  Blocks are i-cluster sizes (sublane-dim
# multiples of 8), lanes are j-gather chunk widths (lane-dim multiples of
# 128).  The set spans the measured optima across system sizes: small blocks
# win on low-occupancy/small systems, wide lanes win once the j-gather
# dominates.
CANDIDATES = (
    (32, 256),
    (64, 128),
    (64, 256),
    (64, 512),
    (128, 128),
    (128, 256),
    (128, 512),
    (128, 1024),
    (256, 256),
    (256, 512),
    (256, 1024),
)

_CACHE_PATH = os.path.join(
    os.environ.get("MOLLYTPU_CACHE_DIR",
                   os.path.expanduser("~/.cache/mollytpu")),
    "autotune.json")

# in-process cache: key -> (block, lanes)
_MEM_CACHE = {}


def _spec_signature(inters):
    """Stable signature of the fused-interaction set: class names plus the
    scalar fields that change the kernel's instruction mix."""
    parts = []
    for inter in sorted(inters, key=lambda i: type(i).__name__):
        name = type(inter).__name__
        cut = getattr(inter, "cutoff", None)
        cname = type(cut).__name__ if cut is not None else "-"
        parts.append(f"{name}/{cname}")
    return ",".join(parts)


def cache_key(n_atoms, boundary, dist_cutoff, inters, dtype, n_steps):
    dev = jax.devices()[0]
    mat = np.asarray(jax.device_get(boundary.box_matrix()), dtype=np.float64)
    box = "x".join(f"{s:.2f}" for s in mat[np.tril_indices(mat.shape[0])])
    tric = type(boundary).__name__
    return "|".join([
        getattr(dev, "device_kind", dev.platform),
        str(int(n_atoms)),
        box, tric,
        f"{float(dist_cutoff):.3f}",
        np.dtype(dtype).name,
        str(int(n_steps)),
        _spec_signature(inters),
    ])


def _load_disk_cache():
    try:
        with open(_CACHE_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _store_disk_cache(key, block, lanes, score_ms):
    data = _load_disk_cache()
    data[key] = {"block": int(block), "lanes": int(lanes),
                 "ms_per_step": float(score_ms)}
    try:
        os.makedirs(os.path.dirname(_CACHE_PATH), exist_ok=True)
        tmp = _CACHE_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, _CACHE_PATH)
    except OSError:
        pass  # read-only cache dir: in-process cache still holds the result


def _time_candidate(finder, coords, boundary, atoms, exclusions, spec,
                    n_steps, reps):
    """Amortized ms/step of (find / n_steps + fused force kernel) for one
    finder shape.  Returns None when the shape overflows or fails."""
    from .pallas_pairwise import pallas_block_nonbonded

    find_fn = jax.jit(lambda c: finder.find(c, boundary, exclusions))
    try:
        nbs = find_fn(coords)
        if int(jax.device_get(nbs.overflow)) != 0:
            return None
    except Exception:
        return None

    def force_fn(c, nbs):
        f, _, _ = pallas_block_nonbonded(spec, c, boundary, atoms,
                                         exclusions, nbs, finder)
        return f

    force_fn = jax.jit(force_fn)
    try:
        jax.block_until_ready(force_fn(coords, nbs))  # compile + warm
    except Exception:
        return None

    # queued timing: on tunneled TPUs every *blocked* dispatch pays a ~28 ms
    # completion-latency round trip after the session's first device_get, so
    # per-call blocking would read ~28 ms for every candidate and the sweep
    # would be a coin flip. Queue Q calls, block once, divide.
    def qtime(fn, *args, q=10):
        out = fn(*args)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(max(2, reps)):
            t0 = time.perf_counter()
            for _ in range(q):
                out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / q)
        return best

    t_find = qtime(find_fn, coords)
    t_force = qtime(force_fn, coords, nbs)
    return 1e3 * (t_force + t_find / max(1, n_steps))


def tune_tile_shape(boundary, dist_cutoff, n_atoms, coords, atoms,
                    exclusions, inters, n_steps=1, candidates=CANDIDATES,
                    reps=3, verbose=False):
    """Sweep candidate tile shapes on the live device; return the winning
    (block, lanes).  Results are cached in-process and on disk."""
    key = cache_key(n_atoms, boundary, dist_cutoff, inters,
                    coords.dtype, n_steps)
    if key in _MEM_CACHE:
        return _MEM_CACHE[key]
    disk = _load_disk_cache().get(key)
    if disk is not None:
        shape = (disk["block"], disk["lanes"])
        _MEM_CACHE[key] = shape
        return shape

    from .pallas_pairwise import build_fused_spec
    spec = build_fused_spec(inters)
    if spec is None:  # outside the fused set: tile shape is irrelevant
        return (_DEFAULT_BLOCK, _DEFAULT_LANES)

    best, best_ms = (_DEFAULT_BLOCK, _DEFAULT_LANES), np.inf
    for blk, lanes in candidates:
        try:
            finder = BlockPairFinder.setup(
                boundary, dist_cutoff, n_atoms, n_steps=n_steps,
                coords=coords, atoms=atoms, block=blk, lanes=lanes)
        except Exception:
            continue
        ms = _time_candidate(finder, coords, boundary, atoms, exclusions,
                             spec, n_steps, reps)
        if verbose:
            print(f"autotune: block={blk} lanes={lanes} -> "
                  f"{'fail' if ms is None else f'{ms:.3f} ms/step'}",
                  flush=True)
        if ms is not None and ms < best_ms:
            best, best_ms = (blk, lanes), ms

    _MEM_CACHE[key] = best
    if np.isfinite(best_ms):
        _store_disk_cache(key, best[0], best[1], best_ms)
    return best


def _neighbor_shapes(blk, lanes):
    """Hill-climb moves on the (block, lanes) lattice (powers of two,
    sublane/lane-dim hardware bounds)."""
    out = []
    for b2, l2 in ((blk * 2, lanes), (blk // 2, lanes),
                   (blk, lanes * 2), (blk, lanes // 2)):
        if 32 <= b2 <= 256 and 128 <= l2 <= 2048:
            out.append((b2, l2))
    return out


def tune_launch(boundary, rc_pair, n_atoms, coords, atoms=None,
                exclusions=None, inters=(), cadence=20, skin=0.15,
                skins=(0.10, 0.20, 0.30), budget_s=None, verbose=False):
    """Joint launch-config autotune: (block, lanes) tile shape by greedy
    hill-climb from the heuristic default, then the neighbor skin (with the
    rebuild cadence scaled by the random-walk safety rule) with the winning
    shape. Returns dict(block, lanes, skin, cadence).

    Scoring: amortized ms/step = t_force(skin) + t_find(skin) / cadence(skin)
    on the live device (queued timing). cadence(s) = cadence_anchor *
    (s / skin_anchor)^2 — between rebuilds an atom's displacement grows as a
    random walk (~sigma * sqrt(n)), so the safe step count scales with the
    square of the half-skin; the anchor pair is the validated production
    config. Hill-climb typically visits 5-9 candidates instead of the full
    11-shape sweep; a time budget (MOLLYTPU_AUTOTUNE_BUDGET seconds,
    default 600) stops expansion early and keeps the best seen. Results
    cache on disk like tune_tile_shape (reference precedent: default-on
    autotune at setup, ext/MollyCUDAExt.jl:566-639, setup.jl:532)."""
    from .pallas_pairwise import build_fused_spec

    if budget_s is None:
        budget_s = float(os.environ.get("MOLLYTPU_AUTOTUNE_BUDGET", "600"))
    key = "joint|" + cache_key(n_atoms, boundary, rc_pair, inters,
                               coords.dtype, cadence)
    if key in _MEM_CACHE:
        return _MEM_CACHE[key]
    disk = _load_disk_cache().get(key)
    if disk is not None:
        _MEM_CACHE[key] = disk
        return disk

    nl = tuple(i for i in inters if getattr(i, "use_neighbors", False))
    spec = build_fused_spec(nl or inters)
    fallback = {"block": _DEFAULT_BLOCK, "lanes": _DEFAULT_LANES,
                "skin": float(skin), "cadence": int(cadence)}
    if spec is None:
        return fallback

    t0 = time.time()
    scores = {}

    def cadence_of(s):
        return max(1, int(round(cadence * (s / skin) ** 2)))

    def measure(blk, lanes, s):
        k = (blk, lanes, round(s, 4))
        if k in scores:
            return scores[k]
        try:
            finder = BlockPairFinder.setup(
                boundary, rc_pair + s, n_atoms, n_steps=cadence_of(s),
                coords=coords, atoms=atoms, block=blk, lanes=lanes)
            ms = _time_candidate(finder, coords, boundary, atoms,
                                 exclusions, spec, cadence_of(s), reps=3)
        except Exception:
            ms = None
        scores[k] = ms
        if verbose:
            print(f"autotune: block={blk} lanes={lanes} skin={s:.2f} "
                  f"cadence={cadence_of(s)} -> "
                  f"{'fail' if ms is None else f'{ms:.3f} ms/step'}",
                  flush=True)
        return ms

    # stage 1: hill-climb the tile shape at the anchor skin
    cur = (_DEFAULT_BLOCK, _DEFAULT_LANES)
    cur_ms = measure(*cur, skin)
    if cur_ms is None:
        return fallback
    improved = True
    while improved and time.time() - t0 < budget_s:
        improved = False
        for cand in _neighbor_shapes(*cur):
            if (cand[0], cand[1], round(skin, 4)) in scores:
                continue
            ms = measure(*cand, skin)
            if ms is not None and ms < cur_ms:
                cur, cur_ms = cand, ms
                improved = True
                break  # greedy: re-expand from the new optimum
            if time.time() - t0 >= budget_s:
                break

    # stage 2: skin sweep with the winning shape
    best_skin, best_ms = float(skin), cur_ms
    for s in skins:
        if abs(s - skin) < 1e-9 or time.time() - t0 >= budget_s:
            continue
        ms = measure(*cur, s)
        if ms is not None and ms < best_ms:
            best_skin, best_ms = float(s), ms

    result = {"block": int(cur[0]), "lanes": int(cur[1]),
              "skin": best_skin, "cadence": cadence_of(best_skin),
              "ms_per_step": float(best_ms)}
    _MEM_CACHE[key] = result
    data = _load_disk_cache()
    data[key] = result
    try:
        os.makedirs(os.path.dirname(_CACHE_PATH), exist_ok=True)
        tmp = _CACHE_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, _CACHE_PATH)
    except OSError:
        pass
    return result


def tuned_block_pairs(boundary, dist_cutoff, n_atoms, coords, atoms=None,
                      exclusions=None, inters=(), n_steps=1, **setup_kwargs):
    """Build a `BlockPairFinder` with the autotuned tile shape for this
    (device, system, interaction) triple.  Falls back to the default shape
    when `MOLLYTPU_AUTOTUNE=0`, the interactions are outside the fused set,
    or the sweep fails."""
    if os.environ.get("MOLLYTPU_AUTOTUNE", "1") != "0" and inters:
        nl = tuple(i for i in inters
                   if getattr(i, "use_neighbors", False))
        blk, lanes = tune_tile_shape(
            boundary, dist_cutoff, n_atoms, coords, atoms, exclusions,
            nl or inters, n_steps=n_steps,
            verbose=os.environ.get("MOLLYTPU_AUTOTUNE_VERBOSE", "0") == "1")
    else:
        blk, lanes = _DEFAULT_BLOCK, _DEFAULT_LANES
    return BlockPairFinder.setup(
        boundary, dist_cutoff, n_atoms, n_steps=n_steps, coords=coords,
        atoms=atoms, block=blk, lanes=lanes, **setup_kwargs)
