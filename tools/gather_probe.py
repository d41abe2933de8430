"""Probe: is the batched (rows, N)[:, idx] gather per-INDEX or per-ELEMENT?

The pair-kernel roofline (tools/pair_roofline.py) pins the per-step
j-coordinate gather at ~0.96 ms for 383k indices x 3 rows. If the cost
scales with the index count rather than the element count, regrouping the
j-list into 8-atom serpentine clusters (8x fewer indices, same bytes via a
(24, N/8) source layout) recovers most of it.

Forms timed (equal output bytes, k gathers chained in one lax.scan so the
~1.4 ms per-program dispatch tax amortizes; the carry feeds the source so
XLA cannot hoist the gather):
  rows3   (3, N)[:, idx]        383k indices  (the production form)
  rows24  (24, N/8)[:, idx8]     48k indices  (cluster form)
  rows12  (12, N/4)[:, idx4]     96k indices  (4-cluster form)
  rows6   (6, N/2)[:, idx2]     192k indices  (pair form)
"""
import os

os.environ.setdefault("MOLLYTPU_LANES", "512")

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, os.path.dirname(__file__))
from qtime import qtime  # noqa: E402

N = 16384
SLOTS = 748 * 512  # the bench j-list size


def make_case(group):
    rows = 3 * group
    src = jnp.asarray(np.random.randn(rows, N // group + 1), jnp.float32)
    idx = jnp.asarray(
        np.random.randint(0, N // group, size=SLOTS // group), jnp.int32)

    def run(src, k=100):
        def body(c, _):
            g = c[:, idx]
            # fold the gather back into the carry so every iteration depends
            # on the last (defeats CSE/hoisting); one cheap column reduce
            upd = jnp.sum(g, axis=1) * 1e-12
            return c + upd[:, None], ()
        c, _ = jax.lax.scan(body, src, None, length=k)
        return c

    return jax.jit(run), src


def main():
    print("device:", jax.devices()[0].device_kind)
    for group in (1, 2, 4, 8, 16):
        run, src = make_case(group)
        ms = qtime(run, src, reps=5, inner=100)
        print("group=%2d  rows=%2d  indices=%7d  ->  %.4f ms/gather"
              % (group, 3 * group, SLOTS // group, ms), flush=True)


if __name__ == "__main__":
    main()
