"""TPU validation (hoist-MIC path vs probe-subset direct sum) + step timing."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import bench
import mollytpu as mt
from mollytpu.ops.neighbors import find_neighbors
from mollytpu.ops import pallas_pairwise as pp
from mollytpu.ops import blockpairs as bp


def main():
    print("BLOCK", bp.BLOCK, "LANES", bp.LANES, flush=True)
    sys = bench.build()
    finder = sys.neighbor_finder
    print("hoist_mic", finder.hoist_mic, "n_pad", finder.n_pad,
          "max_jlist", finder.max_jlist, "max_work_items",
          finder.max_work_items, flush=True)
    # jitter: on the perfect lattice net forces cancel to ~0, so a relative
    # comparison is meaningless noise-vs-noise
    coords = sys.coords + 0.04 * jax.random.normal(
        jax.random.PRNGKey(3), sys.coords.shape, dtype=sys.coords.dtype)
    n = coords.shape[0]
    nbs = find_neighbors(finder, coords, sys.boundary, sys.exclusions, 0)
    jc = np.asarray(jax.device_get(nbs.jcount))
    print("overflow", hex(int(jax.device_get(nbs.overflow))),
          "n_items", int(jax.device_get(nbs.n_items)[0]),
          "cap", nbs.flat_i.shape[0],
          "jcount mean/max", float(jc.mean()), int(jc.max()), flush=True)
    spec = pp.build_fused_spec(sys.pairwise_inters)

    @jax.jit
    def force(c, nb):
        return pp.pallas_block_nonbonded(
            spec, c, sys.boundary, sys.atoms, sys.exclusions, nb, finder,
            compute_energy=True)

    f, e, v = force(coords, nbs)

    # probe-subset direct sum: 512 random atoms vs ALL atoms, f32 on device
    probe = jax.random.permutation(jax.random.PRNGKey(7), n)[:512]
    box = jnp.asarray(sys.boundary.side_lengths, coords.dtype)
    rc = 1.0

    @jax.jit
    def direct(c):
        pi = c[probe]                       # (512, 3)
        dr = c[None, :, :] - pi[:, None, :]  # (512, N, 3)
        dr = dr - jnp.round(dr / box) * box
        r2 = jnp.sum(dr * dr, axis=-1)
        same = probe[:, None] == jnp.arange(n)[None, :]
        r2 = jnp.where(same, 1e10, r2)
        sig, eps = 0.34, 0.994
        inv_r2 = 1.0 / r2
        s2 = sig * sig * inv_r2
        six = s2 ** 3
        twelve = six * six
        coef = -24.0 * eps * (2.0 * twelve - six) * inv_r2
        # shifted-force cutoff at rc
        r = jnp.sqrt(r2)
        s2c = sig * sig / (rc * rc)
        sixc = s2c ** 3
        dudr_rc = -24.0 * eps * (2.0 * sixc * sixc - sixc) / rc
        coef = coef - dudr_rc / r
        coef = jnp.where(r2 < rc * rc, coef, 0.0)
        return jnp.sum(coef[:, :, None] * dr, axis=1)

    fd = direct(coords)
    fp = f[probe]
    scale = float(jnp.max(jnp.abs(fd)))
    print("probe force maxdiff rel",
          float(jnp.max(jnp.abs(fp - fd))) / scale, flush=True)

    # timing: force path in 20-step scan
    @jax.jit
    def scan_force(c, nb):
        def body(cc, i):
            ff, _, _ = pp.pallas_block_nonbonded(
                spec, cc, sys.boundary, sys.atoms, sys.exclusions, nb, finder)
            return cc + 1e-7 * ff, None
        out, _ = jax.lax.scan(body, c, jnp.arange(20))
        return out

    for _ in range(2):
        out = scan_force(coords, nbs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = scan_force(coords, nbs)
    jax.block_until_ready(out)
    t = (time.perf_counter() - t0) / 5 / 20 * 1e3
    print("force path %.3f ms/step" % t, flush=True)

    @jax.jit
    def rebuild(c):
        return finder.find(c, sys.boundary, sys.exclusions, 0)
    for _ in range(2):
        nb2 = rebuild(coords)
    jax.block_until_ready(nb2.order)
    t0 = time.perf_counter()
    for _ in range(5):
        nb2 = rebuild(coords)
    jax.block_until_ready(nb2.order)
    print("rebuild %.3f ms" % ((time.perf_counter() - t0) / 5 * 1e3),
          flush=True)


if __name__ == "__main__":
    main()
