"""Throughput benchmark (run by the driver on real TPU hardware).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Current benchmark: ns/day of a 19,652-atom Lennard-Jones fluid (argon-like,
density and cutoff chosen to match the 6mrr solvated-protein pair workload of
/root/reference/benchmark/protein.jl: ~20k atoms, 1 nm cutoff) advanced by
velocity Verlet with cell-list neighbors, f32, dt = 2 fs, fully jit-compiled
scan. This is the pair-force kernel proxy until force-field ingestion lands;
it will switch to the real 6mrr system then.

vs_baseline: ratio to 100 ns/day, a ballpark for Molly-CUDA on a ~20k-atom
system derived from the reference's "~5x slower than OpenMM" statement
(README.md:50) with OpenMM ~500 ns/day at this size on a modern GPU.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

SKIN = float(os.environ.get("MOLLYTPU_BENCH_SKIN", "0.2"))
CADENCE = int(os.environ.get("MOLLYTPU_BENCH_CADENCE", "40"))
# autotuned for this workload (tools/sweep.py): 512-lane j-chunks halve the
# kernel grid dispatch count; must be set before mollytpu imports
os.environ.setdefault("MOLLYTPU_LANES", "512")


def build(n_side=27, dtype=jnp.float32):
    import mollytpu as mt

    n_atoms = n_side ** 3  # 27^3 = 19683
    # liquid-argon-ish density 26.3 atoms/nm^3
    box = (n_atoms / 26.3) ** (1 / 3)
    boundary = mt.cubic(box, dtype=dtype)
    lin = (jnp.arange(n_side, dtype=dtype) + 0.5) * (box / n_side)
    grid = jnp.stack(jnp.meshgrid(lin, lin, lin, indexing="ij"), axis=-1)
    coords = grid.reshape(-1, 3)
    atoms = mt.make_atoms(n=n_atoms, mass=39.95, sigma=0.34, epsilon=0.994,
                          dtype=dtype)
    vels = mt.random_velocities(jax.random.PRNGKey(1), atoms.mass, 120.0,
                                dtype=dtype)
    from mollytpu.ops.blockpairs import BlockPairFinder
    # skin on the cluster lists so the rebuild amortizes over the cadence
    # (margins: rms displacement over CADENCE steps at 120 K is ~8x below
    # SKIN/2); the kernel still cuts pairs at the interaction cutoff
    # capacity trial on a jittered (liquid-like) configuration: the perfect
    # lattice undersizes j-lists by ~13% vs the equilibrated fluid
    trial_coords = coords + 0.05 * jax.random.normal(
        jax.random.PRNGKey(2), coords.shape, dtype=dtype)
    finder = BlockPairFinder.setup(boundary, 1.0 + SKIN, n_atoms,
                                   n_steps=CADENCE,
                                   coords=trial_coords, atoms=atoms)
    lj = mt.LennardJones(cutoff=mt.ShiftedForceCutoff(1.0), use_neighbors=True)
    sys = mt.System(atoms=atoms, coords=coords, boundary=boundary,
                    velocities=vels, pairwise_inters=(lj,),
                    neighbor_finder=finder)
    return sys


def main():
    import mollytpu as mt
    from mollytpu.ops.neighbors import find_neighbors
    from mollytpu.sim.simulate import _make_chunk_fn
    from functools import partial

    dt_ps = 0.002
    sys = build()
    sim = mt.VelocityVerlet(dt=dt_ps)
    nbs = find_neighbors(sys.neighbor_finder, sys.coords, sys.boundary,
                         sys.exclusions, 0)
    aux = sim.init_aux(sys, nbs)

    n_chunk = 100
    # nested-scan chunk: inner scans between rebuilds, unconditional rebuild
    # at each cadence boundary (no per-step lax.cond)
    run_chunk = jax.jit(partial(
        _make_chunk_fn(sim, False, sys.neighbor_finder, align=0),
        n=n_chunk))

    key = jax.random.PRNGKey(0)
    # warmup + compile
    sys, nbs, aux, key = run_chunk(sys, nbs, aux, key, 0)
    jax.block_until_ready(sys.coords)

    n_timed = 300
    t0 = time.perf_counter()
    step0 = n_chunk
    for _ in range(n_timed // n_chunk):
        sys, nbs, aux, key = run_chunk(sys, nbs, aux, key, step0)
        step0 += n_chunk
    jax.block_until_ready(sys.coords)
    elapsed = time.perf_counter() - t0

    over = int(jax.device_get(nbs.overflow))
    if over:
        raise RuntimeError(f"neighbor overflow {over:#x}: forces degraded")

    s_per_step = elapsed / n_timed
    ns_day = dt_ps * 1e-3 * 86400.0 / s_per_step
    print(json.dumps({
        "metric": "ns/day LJ fluid 19683 atoms (6mrr-scale pair workload proxy)",
        "value": round(ns_day, 2),
        "unit": "ns/day",
        "vs_baseline": round(ns_day / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
