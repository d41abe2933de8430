"""Roofline decomposition of the Pallas pair kernel on the 6mrr bench config.

Splits the pair-kernel strip-out cost (full step minus step-without-pair)
into: XLA prep (layout + the per-step j-coordinate gather), kernel DMA +
grid overhead, distance/mask VPU math, and force-term VPU math — via
trace-time kernel variants (MOLLYTPU_PAIR_VARIANT in ops/pallas_pairwise.py):

  preponly       prep runs, pallas_call skipped
  gather_only    prep + all tile DMA, body touches tiles only
  distance_only  prep + DMA + distances/masks/accumulation, force math cut
  nogather       full kernel, j-coord gather replaced by a broadcast fill
  (normal)       full kernel

Timing discipline: in-chunk strip-out diffs on the real nested-scan step
program (the only trustworthy method on this tunneled chip — see
tools/step_decompose.py). Run on TPU:
    PYTHONPATH=/root/.axon_site:/root/repo:/root/repo/tools \
        python tools/pair_roofline.py
"""
import os
from functools import partial

os.environ.setdefault("MOLLYTPU_LANES", "512")

import jax

import mollytpu as mt
import bench
from qtime import qtime
from mollytpu.ops.neighbors import find_neighbors
from mollytpu.sim.simulate import _make_chunk_fn


def time_variant(sim, sys, variant, label, n=20, reps=5):
    os.environ["MOLLYTPU_PAIR_VARIANT"] = variant
    try:
        nbs = find_neighbors(sys.neighbor_finder, sys.coords, sys.boundary,
                             sys.exclusions, 0)
        aux = sim.init_aux(sys, nbs)
        run = jax.jit(partial(_make_chunk_fn(sim, False, sys.neighbor_finder,
                                             align=0), n=n))
        key = jax.random.PRNGKey(0)
        ms = qtime(lambda: run(sys, nbs, aux, key, 0), reps=reps, inner=n)
    finally:
        os.environ.pop("MOLLYTPU_PAIR_VARIANT", None)
    print("%-38s %.3f ms/step" % (label, ms), flush=True)
    return ms


def main():
    sys = bench.build()
    sim = mt.Langevin(dt=0.002, temperature=300.0, friction=1.0)

    full = time_variant(sim, sys, "", "full step")
    ew = tuple(p for p in sys.pairwise_inters
               if type(p).__name__ not in ("LennardJones", "CoulombEwald"))
    nopair = time_variant(sim, sys.update(pairwise_inters=ew), "",
                          "- pair kernel")
    prep = time_variant(sim, sys, "preponly", "variant: preponly")
    gath = time_variant(sim, sys, "gather_only", "variant: gather_only")
    dist = time_variant(sim, sys, "distance_only", "variant: distance_only")
    nog = time_variant(sim, sys, "nogather", "variant: nogather")

    d_pair = full - nopair
    print("\n--- pair kernel roofline (all numbers ms/step) ---")
    print("pair total (strip-out):         %.3f" % d_pair)
    print("XLA prep incl. j-gather:        %.3f" % (prep - nopair))
    print("  of which the j-coord gather:  %.3f (full - nogather)"
          % (full - nog))
    print("tile DMA + grid overhead:       %.3f (gather_only - preponly)"
          % (gath - prep))
    print("distance/mask VPU math:         %.3f (distance_only - gather_only)"
          % (dist - gath))
    print("force-term VPU math:            %.3f (full - distance_only)"
          % (full - dist))
    print("reconcile: prep+DMA+dist+force = %.3f vs pair total %.3f"
          % ((prep - nopair) + (gath - prep) + (dist - gath) + (full - dist),
             d_pair))


if __name__ == "__main__":
    main()
