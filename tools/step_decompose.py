"""Decompose the 6mrr full-step time: forces vs constraints vs integrator
arithmetic vs neighbor rebuild. Run on TPU (default env):
    PYTHONPATH=/root/.axon_site:/root/repo:/root/repo/tools python tools/step_decompose.py

All variants run the SAME nested-scan chunk path (rebuild every CADENCE with
align=0) so the per-step lax.cond overhead of the naive path never pollutes
the numbers; components are isolated by stripping parts of the System.

Timing discipline: queued dispatch via tools/qtime.py. Per-call
block_until_ready reads a flat ~28 ms tunnel-latency floor on this platform
(the round-2 profiler was wrong the other way: it never synchronized at
all). Queued reps with one final block measure true device time. A final
consistency line compares the sum of strip-out diffs + floor against the
measured full step.
"""
import os
from functools import partial

os.environ.setdefault("MOLLYTPU_LANES", "512")

import jax
import jax.numpy as jnp

import mollytpu as mt
import bench
from qtime import qtime
from mollytpu.ops.neighbors import find_neighbors
from mollytpu.sim.simulate import _make_chunk_fn


def time_chunk(sim, sys, label, n=20, reps=5):
    nbs = find_neighbors(sys.neighbor_finder, sys.coords, sys.boundary,
                         sys.exclusions, 0)
    aux = sim.init_aux(sys, nbs)
    run = jax.jit(partial(_make_chunk_fn(sim, False, sys.neighbor_finder,
                                         align=0), n=n))
    key = jax.random.PRNGKey(0)
    # steady-state re-dispatch of the same chunk (step0=0) — step index only
    # shifts RNG streams, not the work
    ms = qtime(lambda: run(sys, nbs, aux, key, 0), reps=reps, inner=n)
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

    finder = sys.neighbor_finder
    reb = jax.jit(lambda c: finder.find(c, sys.boundary, sys.exclusions, 0))
    ms = qtime(reb, sys.coords, reps=10)
    print("one rebuild: %.3f ms (amortized /%d = %.3f ms/step)"
          % (ms, finder.n_steps, ms / finder.n_steps), flush=True)

    # standalone per-op probes (queued, single op per dispatch)
    nbs = find_neighbors(finder, sys.coords, sys.boundary, sys.exclusions, 0)
    from mollytpu.forces import forces_virial
    from mollytpu.ops.bonded import all_specific_forces

    f_pair_sys = sys.update(general_inters=(), specific_lists=(),
                            constraints=())
    print("pair kernel forces x1:                 %.3f ms" % qtime(
        jax.jit(lambda c: forces_virial(f_pair_sys.update(coords=c), nbs)[0]),
        sys.coords), flush=True)

    pme_only = tuple(g for g in sys.general_inters
                     if type(g).__name__ == "PME")
    if pme_only:
        g = pme_only[0]
        print("PME reciprocal+excl forces x1:         %.3f ms" % qtime(
            jax.jit(lambda c: g.force_virial(c, sys.boundary, sys.atoms,
                                             needs_virial=False)[0]),
            sys.coords), flush=True)

    if sys.specific_lists:
        print("bonded forces x1:                      %.3f ms" % qtime(
            jax.jit(lambda c: all_specific_forces(sys.specific_lists, c,
                                                  sys.boundary)[0]),
            sys.coords), flush=True)

    cons = sys.constraints[0] if sys.constraints else None
    if cons is not None:
        coords, vels = sys.coords, sys.velocities
        print("SHAKE x1:                              %.3f ms" % qtime(
            jax.jit(lambda c: cons.apply_position_constraints(
                c, c + 1e-5, vels, sys.masses, sys.boundary, 0.002)[0]),
            coords), flush=True)
        print("RATTLE x1:                             %.3f ms" % qtime(
            jax.jit(lambda v: cons.apply_velocity_constraints(
                coords, v, sys.masses, sys.boundary)),
            vels), flush=True)


if __name__ == "__main__":
    main()
