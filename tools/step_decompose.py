"""Decompose the 6mrr full-step time: forces vs constraints vs integrator
arithmetic vs neighbor rebuild. Run on TPU (default env).

All variants run the SAME nested-scan chunk path (rebuild every CADENCE with
align=0) so the per-step lax.cond overhead of the naive path never pollutes
the numbers; components are isolated by stripping parts of the System.

Timing discipline (the round-2 profiler reported phantom numbers because it
blocked on ONE output leaf once after queueing several chunks, and that did
not synchronize with device execution on this platform): every timed call is
individually bracketed by jax.block_until_ready on the FULL output pytree,
and the reported number is the median of per-call times. A final consistency
line compares the sum of strip-out diffs + floor against the measured full
step — if they disagree by >25% the tool prints a loud warning instead of
letting the numbers stand.
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


def _timed_calls(fn, first_args, next_args, reps):
    """Run fn reps times, blocking on ALL output leaves per call; returns
    (per-call seconds list, last output). next_args(out, r) -> args tuple."""
    out = jax.block_until_ready(fn(*first_args))
    times = []
    args = next_args(out, 0)
    for r in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
        args = next_args(out, r + 1)
    return times, out


def time_chunk(sim, sys, label, n=20, reps=7):
    nbs = find_neighbors(sys.neighbor_finder, sys.coords, sys.boundary,
                         sys.exclusions, 0)
    aux = sim.init_aux(sys, nbs)
    run = jax.jit(partial(_make_chunk_fn(sim, False, sys.neighbor_finder,
                                         align=0), n=n))
    key = jax.random.PRNGKey(0)

    def next_args(out, r):
        return out[:4] + ((r + 1) * n,)

    times, _ = _timed_calls(run, (sys, nbs, aux, key, 0), next_args, reps)
    ms = float(np.median(times)) / n * 1e3
    print("%-38s %.3f ms/step   (min %.3f, max %.3f)"
          % (label, ms, min(times) / n * 1e3, max(times) / n * 1e3),
          flush=True)
    return ms


def time_rebuild(sys, reps=10):
    finder = sys.neighbor_finder
    reb = jax.jit(lambda c: finder.find(c, sys.boundary, sys.exclusions, 0))
    times, _ = _timed_calls(reb, (sys.coords,),
                            lambda out, r: (sys.coords,), reps)
    ms = float(np.median(times)) * 1e3
    print("one rebuild: %.3f ms (amortized /%d = %.3f ms/step)"
          % (ms, finder.n_steps, ms / finder.n_steps), flush=True)
    return ms / finder.n_steps


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
    d_cons, d_pme = full - nc, full - npme
    d_bond, d_pair = full - nbond, full - npair
    print("strip-out diffs (overlapping, need not sum to full): "
          "constraints %.3f  PME %.3f  bonded %.3f  pair %.3f  floor %.3f"
          % (d_cons, d_pme, d_bond, d_pair, bare), flush=True)
    approx = d_cons + d_pme + d_bond + d_pair + bare
    rel = abs(approx - full) / full
    print("consistency: diffs+floor = %.3f vs full %.3f (%.0f%% apart)"
          % (approx, full, rel * 100), flush=True)
    if rel > 0.25:
        print("WARNING: parts do not reconcile with the whole — treat the "
              "component numbers as suspect (overlap or timing error)",
              flush=True)

    amort = time_rebuild(sys)

    # constraints split: SHAKE (position) vs RATTLE (velocity), 20x scans
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
            times, _ = _timed_calls(fn, (arg,), lambda out, r: (arg,), 5)
            print("%-38s %.3f ms" % (name, float(np.median(times)) / 20 * 1e3),
                  flush=True)


if __name__ == "__main__":
    main()
