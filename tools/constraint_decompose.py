"""Decompose SHAKE/RATTLE cost on the 6mrr constraint set: which bucket
(triangle waters / star / path / single) and which phase (reads, solve,
writeback) dominates.
Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/constraint_decompose.py
"""
import dataclasses
import os

os.environ.setdefault("MOLLYTPU_LANES", "512")

import jax
import jax.numpy as jnp

import bench
from qtime import qtime


def timeit(fn, *args, **kw):
    return qtime(fn, *args, reps=10)


def main():
    sys = bench.build()
    cons = sys.constraints[0]
    coords, vels = sys.coords, sys.velocities
    masses, boundary = sys.masses, sys.boundary

    print(f"buckets: {[(b.pattern, b.atoms.shape, b.slice_start >= 0) for b in cons.clusters]}",
          flush=True)
    print(f"newton_iters={cons.newton_iters}", flush=True)

    def scan20(fn):
        @jax.jit
        def run(x):
            def body(c, i):
                return fn(c), None
            out, _ = jax.lax.scan(body, x, jnp.arange(20))
            return out
        return run

    # full rattle / shake
    t = timeit(scan20(lambda v: cons.apply_velocity_constraints(
        coords, v, masses, boundary)), vels)
    print(f"RATTLE all buckets:    {t / 20:.3f} ms", flush=True)
    t = timeit(scan20(lambda c: cons.apply_position_constraints(
        c, c + 1e-5, None, masses, boundary, 0.002)[0]), coords)
    print(f"SHAKE all buckets:     {t / 20:.3f} ms", flush=True)

    for bi, b in enumerate(cons.clusters):
        sub = dataclasses.replace(cons, clusters=(b,))
        t = timeit(scan20(lambda v: sub.apply_velocity_constraints(
            coords, v, masses, boundary)), vels)
        print(f"RATTLE bucket {bi} {str(b.pattern):28s} C={b.atoms.shape[0]:6d}"
              f" slice={b.slice_start >= 0}: {t / 20:.3f} ms", flush=True)
        t = timeit(scan20(lambda c: sub.apply_position_constraints(
            c, c + 1e-5, None, masses, boundary, 0.002)[0]), coords)
        print(f"SHAKE  bucket {bi} {str(b.pattern):28s} C={b.atoms.shape[0]:6d}"
              f" slice={b.slice_start >= 0}: {t / 20:.3f} ms", flush=True)

    # phase probes on the biggest bucket: read-only, read+writeback
    big = max(cons.clusters, key=lambda b: b.atoms.shape[0])

    def read_wb(v):
        x = cons._bucket_read_t(v, big)
        return cons._bucket_writeback_t(v, big, x * 1.0000001)

    t = timeit(scan20(read_wb), vels)
    print(f"read+writeback only (biggest bucket): {t / 20:.3f} ms",
          flush=True)

    # tiny-op chain overhead probe: 200 dependent elementwise ops on (3, C)
    C = big.atoms.shape[0]
    x0 = jnp.ones((3, C), jnp.float32)

    @jax.jit
    def chain(x):
        for _ in range(200):
            x = x * 1.0000001 + 1e-9
        return x

    t = timeit(chain, x0)
    print(f"200-op fused chain on (3,{C}): {t:.3f} ms", flush=True)

    @jax.jit
    def chain_sums(x):
        # 200 ops with reduction barriers every 4 ops (fusion breakers)
        for i in range(50):
            s = jnp.sum(x, axis=0)
            x = x + s[None, :] * 1e-9
        return x

    t = timeit(chain_sums, x0)
    print(f"50 sum-barrier rounds on (3,{C}): {t:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
