"""Per-finder tile shapes + runtime launch-config autotuner
(reference analogue: ext/MollyCUDAExt.jl:566-639 autotune_launch_config)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mollytpu as mt
from mollytpu.ops import autotune
from mollytpu.ops.blockpairs import BlockPairFinder
from mollytpu.ops.pallas_pairwise import build_fused_spec, \
    pallas_block_nonbonded


def _lj_coul_system(n=500, box=3.0, dtype=jnp.float32):
    key = jax.random.PRNGKey(0)
    boundary = mt.cubic(box, dtype=dtype)
    coords = mt.place_atoms(key, boundary, n, min_dist=0.2, dtype=dtype)
    q = jax.random.uniform(jax.random.PRNGKey(1), (n,), minval=-0.5,
                           maxval=0.5)
    q = (q - jnp.mean(q)).astype(dtype)
    atoms = mt.make_atoms(n=n, mass=10.0, sigma=0.3, epsilon=0.2, charge=q,
                          dtype=dtype)
    excl = mt.Exclusions.build(n, excl_pairs=[(0, 1), (2, 3)],
                               special_pairs=[(4, 5)])

    def mk(un):
        return (mt.LennardJones(cutoff=mt.ShiftedForceCutoff(0.9),
                                use_neighbors=un, weight_special=0.5),
                mt.CoulombReactionField(dist_cutoff=0.9, use_neighbors=un,
                                        weight_special=0.8333))

    sys_dense = mt.System(coords=coords, boundary=boundary, atoms=atoms,
                          exclusions=excl, pairwise_inters=mk(False))
    return sys_dense, mk(True)


@pytest.mark.parametrize("blk,lanes", [
    pytest.param(64, 128, marks=pytest.mark.slow),
    (32, 256),
    pytest.param(256, 256, marks=pytest.mark.slow),
])
def test_non_default_tile_shapes_match_dense(blk, lanes):
    """The fused kernel at non-default per-finder (block, lanes) matches
    the dense O(N^2) reference path. (n kept small: interpret-mode Pallas
    work items execute one by one on CPU; the 64x128 shape at n=500 took
    ~8 min of emulation.)"""
    sys_d, nl_inters = _lj_coul_system(n=160, box=2.2)
    f_ref = np.asarray(mt.forces(sys_d))
    e_ref = float(mt.potential_energy(sys_d))
    spec = build_fused_spec(nl_inters)
    assert spec is not None

    finder = BlockPairFinder.setup(sys_d.boundary, 0.9, sys_d.n_atoms,
                                   coords=sys_d.coords, block=blk,
                                   lanes=lanes)
    assert (finder.block, finder.lanes) == (blk, lanes)
    nbs = finder.find(sys_d.coords, sys_d.boundary, sys_d.exclusions)
    assert int(jax.device_get(nbs.overflow)) == 0
    f, e, _ = pallas_block_nonbonded(spec, sys_d.coords, sys_d.boundary,
                                     sys_d.atoms, sys_d.exclusions, nbs,
                                     finder, compute_energy=True)
    scale = max(1.0, np.abs(f_ref).max())
    assert np.max(np.abs(np.asarray(f) - f_ref)) / scale < 1e-5
    assert e == pytest.approx(e_ref, rel=2e-5)


@pytest.mark.slow
def test_resetup_preserves_tile_shape():
    """resetup() (the NPT box-drift rebuild) keeps the per-finder launch
    config."""
    sys_d, _ = _lj_coul_system(n=300)
    finder = BlockPairFinder.setup(sys_d.boundary, 0.9, sys_d.n_atoms,
                                   coords=sys_d.coords, block=64, lanes=128)
    re = finder.resetup(sys_d.boundary, sys_d.n_atoms, coords=sys_d.coords)
    assert (re.block, re.lanes) == (64, 128)


def test_autotuner_picks_candidate_and_caches(tmp_path, monkeypatch):
    """tune_tile_shape returns a swept candidate, persists it on disk, and
    serves repeat queries from the cache without re-timing."""
    monkeypatch.setattr(autotune, "_CACHE_PATH",
                        str(tmp_path / "autotune.json"))
    monkeypatch.setattr(autotune, "_MEM_CACHE", {})
    sys_d, nl_inters = _lj_coul_system(n=300)
    cands = ((32, 128), (64, 128))
    shape = autotune.tune_tile_shape(
        sys_d.boundary, 0.9, sys_d.n_atoms, sys_d.coords, sys_d.atoms,
        sys_d.exclusions, nl_inters, n_steps=10, candidates=cands, reps=1)
    assert shape in cands
    with open(tmp_path / "autotune.json") as f:
        disk = json.load(f)
    (key, entry), = disk.items()
    assert (entry["block"], entry["lanes"]) == shape
    assert entry["ms_per_step"] > 0

    # poison the timing path: a cache hit must not re-run it
    monkeypatch.setattr(autotune, "_time_candidate",
                        lambda *a, **k: pytest.fail("cache miss"))
    again = autotune.tune_tile_shape(
        sys_d.boundary, 0.9, sys_d.n_atoms, sys_d.coords, sys_d.atoms,
        sys_d.exclusions, nl_inters, n_steps=10, candidates=cands, reps=1)
    assert again == shape
    monkeypatch.setattr(autotune, "_MEM_CACHE", {})  # disk-only hit
    again = autotune.tune_tile_shape(
        sys_d.boundary, 0.9, sys_d.n_atoms, sys_d.coords, sys_d.atoms,
        sys_d.exclusions, nl_inters, n_steps=10, candidates=cands, reps=1)
    assert again == shape


def test_tuned_block_pairs_outside_fused_set(monkeypatch, tmp_path):
    """Interactions outside the fused set fall back to default shape
    without sweeping."""
    monkeypatch.setattr(autotune, "_CACHE_PATH",
                        str(tmp_path / "autotune.json"))
    monkeypatch.setattr(autotune, "_MEM_CACHE", {})
    sys_d, _ = _lj_coul_system(n=300)
    inters = (mt.Gravity(use_neighbors=True),)  # not fusable
    finder = autotune.tuned_block_pairs(
        sys_d.boundary, 0.9, sys_d.n_atoms, coords=sys_d.coords,
        atoms=sys_d.atoms, exclusions=sys_d.exclusions, inters=inters)
    assert (finder.block, finder.lanes) == (autotune._DEFAULT_BLOCK,
                                            autotune._DEFAULT_LANES)
