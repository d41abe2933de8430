"""Discriminate Mosaic lowering bug: compiled vs interpret kernel on TPU."""
import jax
import jax.numpy as jnp
import numpy as np

import bench
from mollytpu.ops.neighbors import find_neighbors
from mollytpu.ops import pallas_pairwise as pp
from mollytpu.ops import blockpairs as bp

sys = bench.build()
finder = sys.neighbor_finder
coords = sys.coords
n = coords.shape[0]
nbs = find_neighbors(finder, coords, sys.boundary, sys.exclusions, 0)
spec = pp.build_fused_spec(sys.pairwise_inters)

f_c, e_c, v_c = pp.pallas_block_nonbonded(
    spec, coords, sys.boundary, sys.atoms, sys.exclusions, nbs, finder,
    compute_energy=True, interpret=False)
f_i, e_i, v_i = pp.pallas_block_nonbonded(
    spec, coords, sys.boundary, sys.atoms, sys.exclusions, nbs, finder,
    compute_energy=True, interpret=True)
f_c, f_i = jax.device_get(f_c), jax.device_get(f_i)
scale = np.max(np.abs(f_i))
d = np.abs(f_c - f_i)
print("compiled vs interpret maxdiff rel", float(np.max(d)) / scale,
      flush=True)
print("energy", float(e_c), float(e_i), flush=True)
bad = np.unique(np.argwhere(d > 1e-3 * scale)[:, 0])
print("bad atoms", bad.shape[0], bad[:20], flush=True)
if bad.shape[0]:
    inv = jax.device_get(nbs.inv_order)
    pos = inv[bad]           # sorted positions of bad atoms
    print("bad sorted positions (block, lane)",
          [(int(p) // bp.BLOCK, int(p) % bp.BLOCK) for p in pos[:20]],
      flush=True)
