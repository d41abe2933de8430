"""Micro-profile SHAKE/RATTLE pieces on the 6mrr constraint set (TPU)."""
import time

import jax
import jax.numpy as jnp

import bench

def timeit(label, fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print("%-40s %8.1f us" % (label, (time.perf_counter() - t0) / reps * 1e6),
          flush=True)
    return out


def main():
    sys = bench.build()
    cons = sys.constraints[0]
    coords, vels, masses = sys.coords, sys.velocities, sys.masses
    boundary = sys.boundary
    inv_m = jnp.where(masses > 0, 1.0 / jnp.where(masses > 0, masses, 1.0), 0.0)
    print("buckets:", [(b.pattern, b.atoms.shape) for b in cons.clusters],
          flush=True)

    timeit("full RATTLE", jax.jit(
        lambda v: cons.apply_velocity_constraints(coords, v, masses,
                                                  boundary)), vels)
    timeit("full SHAKE", jax.jit(
        lambda c: cons.apply_position_constraints(
            c, c + 1e-5, vels, masses, boundary, 0.002)[0]), coords)

    # pieces for the largest bucket
    b = max(cons.clusters, key=lambda b: b.atoms.shape[0])

    def reads(c, v):
        xc = cons._bucket_read_t(c, b)
        vv = cons._bucket_read_t(v, b)
        return xc.sum() + vv.sum()
    timeit("bucket_read_t xc+v (largest bucket)", jax.jit(reads), coords,
           vels)

    def writeback(v):
        delta = cons._bucket_read_t(v, b)
        return cons._bucket_writeback_t(v, b, delta)
    timeit("bucket_writeback_t (largest)", jax.jit(writeback), vels)

    def one_bucket(v):
        return cons._cluster_velocities(coords, v, inv_m, boundary)
    timeit("cluster_velocities all buckets", jax.jit(one_bucket), vels)


if __name__ == "__main__":
    main()
