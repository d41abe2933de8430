"""6mrr solvated protein on TPU: component profile + ns/day.

The driver north-star config (BASELINE.md): ~16k-atom solvated protein,
ff99SBildn + TIP3P, PME electrostatics, H-bond constraints. This script
builds the system host-side (f32), swaps in the Pallas block-pair finder,
and times each step component on the TPU.
"""
import os
import time

os.environ.setdefault("MOLLYTPU_LANES", "512")

import jax
import jax.numpy as jnp
import numpy as np

import mollytpu as mt
from mollytpu.models.forcefield import ForceField
from mollytpu.models.setup import system_from_pdb
from mollytpu.ops.blockpairs import BlockPairFinder
from mollytpu.ops.neighbors import find_neighbors
from mollytpu.ops import pallas_pairwise as pp

DATA = "/root/reference/data"
SKIN = float(os.environ.get("MOLLYTPU_BENCH_SKIN", "0.15"))
CADENCE = int(os.environ.get("MOLLYTPU_BENCH_CADENCE", "20"))


def timeit(fn, *args, n=5, warmup=2, inner=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n / inner * 1e3


def scan20(fn, *consts):
    @jax.jit
    def run(x):
        def body(c, i):
            return fn(c, i, *consts), None
        out, _ = jax.lax.scan(body, x, jnp.arange(20))
        return out
    return run


CACHE = "/tmp/6mrr_sys.pkl"


def build(dtype=jnp.float32):
    import pickle
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as fh:
            sys = pickle.load(fh)
    else:
        ff = ForceField(f"{DATA}/force_fields/ff99SBildn.xml",
                        f"{DATA}/force_fields/tip3p_standard.xml")
        sys = system_from_pdb(f"{DATA}/6mrr_equil.pdb", ff,
                              nonbonded_method="pme", dtype=dtype,
                              constraints="hbonds", rigid_water=True,
                              dist_neighbors=1.0 + SKIN)
        sys = jax.device_get(sys)
        with open(CACHE, "wb") as fh:
            pickle.dump(sys, fh)
    sys = jax.tree_util.tree_map(jnp.asarray, sys)
    finder = BlockPairFinder.setup(
        sys.boundary, 1.0 + SKIN, sys.n_atoms, n_steps=CADENCE,
        coords=sys.coords, atoms=sys.atoms)
    sys = sys.update(neighbor_finder=finder)
    vels = mt.random_velocities(jax.random.PRNGKey(1), sys.masses, 300.0,
                                dtype=dtype)
    sys = sys.update(velocities=vels)
    return sys


def main():
    t0 = time.perf_counter()
    sys = build()
    print("build %.1f s; n=%d" % (time.perf_counter() - t0, sys.n_atoms),
          flush=True)
    print("specific lists:", [(s.kind, s.n_terms) for s in sys.specific_lists],
          flush=True)
    print("general:", [type(g).__name__ for g in sys.general_inters],
          flush=True)
    print("constraints:", type(sys.constraints).__name__
          if sys.constraints is not None else None, flush=True)
    finder = sys.neighbor_finder
    print("finder hoist=%s n_pad=%d max_jlist=%d" % (
        finder.hoist_mic, finder.n_pad, finder.max_jlist), flush=True)

    nbs = find_neighbors(finder, sys.coords, sys.boundary, sys.exclusions, 0)
    jc = np.asarray(jax.device_get(nbs.jcount))
    print("overflow", hex(int(jax.device_get(nbs.overflow))),
          "items", int(jax.device_get(nbs.n_items)[0]),
          "jcount mean/max", float(jc.mean()), int(jc.max()), flush=True)

    spec = pp.build_fused_spec(
        tuple(i for i in sys.pairwise_inters
              if getattr(i, "use_neighbors", False)))
    print("fused spec:", spec, flush=True)
    print("excl width", sys.exclusions.excl_table.shape,
          "spec width", sys.exclusions.spec_table.shape, flush=True)

    coords = sys.coords

    # 1. pallas pair kernel
    def f_pair(c, i, nb):
        f, _, _ = pp.pallas_block_nonbonded(
            spec, c, sys.boundary, sys.atoms, sys.exclusions, nb, finder)
        return c + 1e-9 * f
    print("pallas pair     %.3f ms" % (
        timeit(scan20(f_pair, nbs), coords) / 20), flush=True)

    # 2. PME reciprocal (+ exclusions)
    pme = [g for g in sys.general_inters if type(g).__name__ == "PME"]
    if pme:
        pme = pme[0]
        def f_pme(c, i):
            f, v = pme.force_virial(c, sys.boundary, sys.atoms)
            return c + 1e-9 * f
        print("PME recip       %.3f ms" % (
            timeit(scan20(f_pme), coords) / 20), flush=True)

    # 3. bonded terms
    from mollytpu.ops.bonded import specific_forces
    def f_bond(c, i):
        out = c
        for sl in sys.specific_lists:
            f, _ = specific_forces(sl, c, sys.boundary)
            out = out + 1e-9 * f
        return out
    print("bonded          %.3f ms" % (
        timeit(scan20(f_bond), coords) / 20), flush=True)

    # 4. full forces dispatcher
    from mollytpu.forces import forces_virial
    def f_all(c, i, nb):
        s2 = sys.update(coords=c)
        f, _ = forces_virial(s2, nb)
        return c + 1e-9 * f
    print("forces total    %.3f ms" % (
        timeit(scan20(f_all, nbs), coords) / 20), flush=True)

    # 5. constraints (SHAKE position + RATTLE velocity)
    cons_list = sys.constraints or ()
    if not isinstance(cons_list, (tuple, list)):
        cons_list = (cons_list,)
    for cons in cons_list:
        vels = sys.velocities
        print("constraint set:", type(cons).__name__,
              getattr(cons, "n_constraints", "?"), flush=True)
        def f_shake(c, i):
            c2, v2 = cons.apply_position_constraints(
                c, c + 1e-5, vels, sys.masses, sys.boundary, 0.002)
            return c2
        try:
            print("SHAKE           %.3f ms" % (
                timeit(scan20(f_shake), coords) / 20), flush=True)
        except Exception as ex:
            print("SHAKE timing skipped:", ex, flush=True)

    # 6. full integrator step via simulator chunk
    from mollytpu.sim.simulate import _make_chunk_fn
    from functools import partial
    sim = mt.Langevin(dt=0.002, temperature=300.0, friction=1.0)
    aux = sim.init_aux(sys, nbs)
    run_chunk = jax.jit(partial(
        _make_chunk_fn(sim, False, finder, align=0), n=CADENCE * 2))
    key = jax.random.PRNGKey(0)
    out = run_chunk(sys, nbs, aux, key, 0)
    jax.block_until_ready(out[0].coords)
    t0 = time.perf_counter()
    reps = 3
    for r in range(reps):
        out = run_chunk(out[0], out[1], out[2], out[3], (r + 1) * CADENCE * 2)
    jax.block_until_ready(out[0].coords)
    ms = (time.perf_counter() - t0) / (reps * CADENCE * 2) * 1e3
    print("full step       %.3f ms  (%.1f ns/day @2fs)" % (
        ms, 0.002e-3 * 86400.0 / (ms * 1e-3)), flush=True)
    print("final overflow", hex(int(jax.device_get(out[1].overflow))),
          flush=True)


if __name__ == "__main__":
    main()
