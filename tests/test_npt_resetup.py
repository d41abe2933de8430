"""NPT x neighbor-finder staleness: re-setup policy on box drift
(VERDICT r1 weak item 7; reference analogue: the CUDA tile engine re-derives
its launch geometry per rebuild, ext/MollyCUDAExt.jl:566-639)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mollytpu as mt
from mollytpu.ops.blockpairs import BlockPairFinder
from mollytpu.ops.celltiles import CellTileFinder
from tests.test_simulation import lj_fluid


def test_box_drift_exceeded_thresholds():
    b3 = mt.cubic(3.0, dtype=jnp.float64)
    f = BlockPairFinder.setup(b3, 0.9, 64, n_steps=5)
    assert f.ref_sides == (3.0, 3.0, 3.0)
    assert not f.box_drift_exceeded(mt.cubic(3.1, dtype=jnp.float64))
    assert f.box_drift_exceeded(mt.cubic(3.2, dtype=jnp.float64))
    assert f.box_drift_exceeded(mt.cubic(2.8, dtype=jnp.float64))
    ct = CellTileFinder.setup(b3, 0.9, 64, n_steps=5)
    assert not ct.box_drift_exceeded(mt.cubic(3.05, dtype=jnp.float64))
    assert ct.box_drift_exceeded(mt.cubic(2.7, dtype=jnp.float64))


def test_resetup_rederives_geometry():
    b = mt.cubic(4.0, dtype=jnp.float64)
    f = BlockPairFinder.setup(b, 0.9, 128, n_steps=5)
    f2 = f.resetup(mt.cubic(2.0, dtype=jnp.float64), 128)
    assert f2.ref_sides == (2.0, 2.0, 2.0)
    assert f2.grid_dims != f.grid_dims or f2.sort_dims != f.sort_dims
    assert f2.n_steps == f.n_steps and f2.dist_cutoff == f.dist_cutoff


def test_simulate_resetups_finder_on_barostat_drift():
    """A Berendsen-barostat run whose box compresses beyond the drift band
    picks up a re-derived finder mid-run and finishes with zero overflow."""
    finder = CellTileFinder.setup(mt.cubic(2.4, dtype=jnp.float64), 0.9, 48,
                                  n_steps=4)
    # tighten the band so the short test run trips it
    finder = dataclasses.replace(finder, resetup_drift=0.01)
    sys = lj_fluid(n_atoms=48, box=2.4, neighbor_finder=finder,
                   use_neighbors=True)
    baro = mt.BerendsenBarostat(pressure=500.0, coupling_const=0.05,
                                compressibility=4.6e-4, n_steps=1)
    sim = mt.Langevin(dt=0.002, temperature=100.0, friction=1.0,
                      coupling=(baro,))
    out, logs = mt.simulate(sys, sim, 40, key=jax.random.PRNGKey(4),
                            loggers={"T": mt.TemperatureLogger(interval=8)})
    sides0 = np.asarray(jax.device_get(sys.boundary.side_lengths))
    sides1 = np.asarray(jax.device_get(out.boundary.side_lengths))
    assert np.all(sides1 < sides0)          # compression happened
    assert out.neighbor_finder.ref_sides != sys.neighbor_finder.ref_sides
    assert np.all(np.isfinite(np.asarray(out.coords)))
