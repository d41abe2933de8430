"""Decompose the 6mrr full-step time: forces vs constraints vs integrator
arithmetic vs neighbor rebuild. Run on TPU (default env)."""
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


def time_chunk(sim, sys, label, n=20, reps=5, rebuild=True):
    finder = sys.neighbor_finder if rebuild else None
    nbs = find_neighbors(sys.neighbor_finder, sys.coords, sys.boundary,
                         sys.exclusions, 0)
    aux = sim.init_aux(sys, nbs)
    run = jax.jit(partial(_make_chunk_fn(sim, False, finder, align=0), n=n))
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
    print("%-34s %.3f ms/step" % (label, ms), flush=True)
    return ms


def main():
    sys = bench.build()
    sim = mt.Langevin(dt=0.002, temperature=300.0, friction=1.0)

    full = time_chunk(sim, sys, "full step + rebuild/20")
    norb = time_chunk(sim, sys, "full step, no rebuild", rebuild=False)
    print("  -> rebuild amortized: %.3f ms/step" % (full - norb), flush=True)

    sys_nc = sys.update(constraints=())
    nc = time_chunk(sim, sys_nc, "no constraints, no rebuild", rebuild=False)
    print("  -> constraints: %.3f ms/step" % (norb - nc), flush=True)

    sys_nf = sys.update(constraints=(), pairwise_inters=(),
                        general_inters=(), specific_lists=())
    nf = time_chunk(sim, sys_nf, "integrator only (no forces)",
                    rebuild=False)
    print("  -> forces: %.3f ms/step" % (nc - nf), flush=True)

    # forces split: pairwise only / +pme / +bonded
    sys_pw = sys.update(constraints=(), general_inters=(), specific_lists=())
    pw = time_chunk(sim, sys_pw, "pairwise only", rebuild=False)
    sys_pme = sys.update(constraints=(), specific_lists=())
    pm = time_chunk(sim, sys_pme, "pairwise + PME/disp", rebuild=False)
    print("  -> pair kernel: %.3f  PME+disp: %.3f  bonded: %.3f ms/step"
          % (pw - nf, pm - pw, nc - pm), flush=True)

    # single rebuild cost
    finder = sys.neighbor_finder
    reb = jax.jit(lambda c: finder.find(c, sys.boundary, sys.exclusions, 0))
    nbs = reb(sys.coords)
    jax.block_until_ready(nbs.order)
    t0 = time.perf_counter()
    for _ in range(10):
        nbs = reb(sys.coords)
    jax.block_until_ready(nbs.order)
    print("one rebuild: %.3f ms" % ((time.perf_counter() - t0) / 10 * 1e3),
          flush=True)


if __name__ == "__main__":
    main()
