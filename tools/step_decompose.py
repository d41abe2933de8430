"""Decompose the 6mrr full-step time: forces vs constraints vs integrator
arithmetic vs neighbor rebuild. Run on TPU (default env).

All variants run the SAME nested-scan chunk path (rebuild every CADENCE with
align=0) so the per-step lax.cond overhead of the naive path never pollutes
the numbers; components are isolated by stripping parts of the System.
"""
import os
import time
from functools import partial

os.environ.setdefault("MOLLYTPU_LANES", "512")

import jax
import jax.numpy as jnp
import numpy as np

import mollytpu as mt
import bench
from mollytpu.ops.neighbors import find_neighbors
from mollytpu.sim.simulate import _make_chunk_fn


def time_chunk(sim, sys, label, n=20, reps=5):
    nbs = find_neighbors(sys.neighbor_finder, sys.coords, sys.boundary,
                         sys.exclusions, 0)
    aux = sim.init_aux(sys, nbs)
    run = jax.jit(partial(_make_chunk_fn(sim, False, sys.neighbor_finder,
                                         align=0), n=n))
    key = jax.random.PRNGKey(0)
    out = run(sys, nbs, aux, key, 0)
    jax.block_until_ready(out[0].coords)
    out = run(*out[:4], n)
    jax.block_until_ready(out[0].coords)
    t0 = time.perf_counter()
    s0 = 2 * n
    for r in range(reps):
        out = run(*out[:4], s0)
        s0 += n
    jax.block_until_ready(out[0].coords)
    ms = (time.perf_counter() - t0) / (reps * n) * 1e3
    print("%-38s %.3f ms/step" % (label, ms), flush=True)
    return ms


def main():
    sys = bench.build()
    sim = mt.Langevin(dt=0.002, temperature=300.0, friction=1.0)

    full = time_chunk(sim, sys, "full step")
    nc = time_chunk(sim, sys.update(constraints=()), "- constraints")
    pme = tuple(g for g in sys.general_inters
                if type(g).__name__ != "PME")
    npme = time_chunk(sim, sys.update(general_inters=pme), "- PME")
    nbond = time_chunk(sim, sys.update(specific_lists=()), "- bonded")
    ew = tuple(p for p in sys.pairwise_inters
               if type(p).__name__ not in ("LennardJones", "CoulombEwald"))
    npair = time_chunk(sim, sys.update(pairwise_inters=ew), "- pair kernel")
    bare = time_chunk(sim, sys.update(
        constraints=(), pairwise_inters=(), general_inters=(),
        specific_lists=()), "integrator+rebuild only")
    print("diffs: constraints %.3f  PME %.3f  bonded %.3f  pair %.3f  base %.3f"
          % (full - nc, full - npme, full - nbond, full - npair, bare),
          flush=True)

    finder = sys.neighbor_finder
    reb = jax.jit(lambda c: finder.find(c, sys.boundary, sys.exclusions, 0))
    nbs = reb(sys.coords)
    jax.block_until_ready(nbs.order)
    t0 = time.perf_counter()
    for _ in range(10):
        nbs = reb(sys.coords)
    jax.block_until_ready(nbs.order)
    print("one rebuild: %.3f ms (amortized /%d = %.3f ms/step)"
          % ((time.perf_counter() - t0) / 10 * 1e3, finder.n_steps,
             (time.perf_counter() - t0) / 10 * 1e3 / finder.n_steps),
          flush=True)

    # constraints split: SHAKE (position) vs RATTLE (velocity), single calls
    cons = sys.constraints[0] if sys.constraints else None
    if cons is not None:
        coords = sys.coords
        vels = sys.velocities

        @jax.jit
        def shake20(c):
            def body(cc, i):
                c2, v2 = cons.apply_position_constraints(
                    cc, cc + 1e-5, vels, sys.masses, sys.boundary, 0.002)
                return c2, None
            out, _ = jax.lax.scan(body, c, jnp.arange(20))
            return out

        @jax.jit
        def rattle20(v):
            def body(vv, i):
                v2 = cons.apply_velocity_constraints(
                    coords, vv, sys.masses, sys.boundary)
                return v2, None
            out, _ = jax.lax.scan(body, v, jnp.arange(20))
            return out

        for name, fn, arg in [("SHAKE x1", shake20, coords),
                              ("RATTLE x1", rattle20, vels)]:
            out = fn(arg)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn(arg)
            jax.block_until_ready(out)
            print("%-38s %.3f ms" % (name, (time.perf_counter() - t0) / 100
                                     * 1e3), flush=True)


if __name__ == "__main__":
    main()
