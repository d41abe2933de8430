"""Sweep BLOCK/LANES on the 6mrr pair kernel (uses the /tmp system cache)."""
import os
import subprocess
import sys

SCRIPT = r'''
import os, time, jax, jax.numpy as jnp, numpy as np
import pickle
import mollytpu as mt
from mollytpu.ops.blockpairs import BlockPairFinder
from mollytpu.ops.neighbors import find_neighbors
from mollytpu.ops import pallas_pairwise as pp
sys_ = pickle.load(open("/tmp/6mrr_sys.pkl", "rb"))
sys_ = jax.tree_util.tree_map(jnp.asarray, sys_)
finder = BlockPairFinder.setup(sys_.boundary, 1.15, sys_.n_atoms, n_steps=20,
                               coords=sys_.coords, atoms=sys_.atoms)
sys_ = sys_.update(neighbor_finder=finder)
nbs = find_neighbors(finder, sys_.coords, sys_.boundary, sys_.exclusions, 0)
spec = pp.build_fused_spec(tuple(i for i in sys_.pairwise_inters
                                 if getattr(i, "use_neighbors", False)))
@jax.jit
def scanf(c, nb):
    def body(cc, i):
        f, _, _ = pp.pallas_block_nonbonded(
            spec, cc, sys_.boundary, sys_.atoms, sys_.exclusions, nb, finder)
        return cc + 1e-9 * f, None
    out, _ = jax.lax.scan(body, c, jnp.arange(20))
    return out
for _ in range(2):
    out = scanf(sys_.coords, nbs)
jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(5):
    out = scanf(sys_.coords, nbs)
jax.block_until_ready(out)
items = int(jax.device_get(nbs.n_items)[0])
print("RESULT %.3f ms items=%d hoist=%s" % (
    (time.perf_counter() - t0) / 100 * 1e3, items, finder.hoist_mic))
'''

for blk, lanes in [(128, 512), (128, 256), (64, 256), (64, 512), (192, 256), (256, 256)]:
    env = dict(os.environ)
    env.update(MOLLYTPU_BLOCK=str(blk), MOLLYTPU_LANES=str(lanes))
    try:
        r = subprocess.run([sys.executable, "-c", SCRIPT], env=env,
                           capture_output=True, text=True, timeout=2000,
                           cwd="/root/repo")
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        err = r.stderr.splitlines()[-1] if r.stderr.splitlines() else ""
        print(f"B={blk} L={lanes}:", line[-1] if line else "FAIL " + err,
              flush=True)
    except subprocess.TimeoutExpired:
        print(f"B={blk} L={lanes}: TIMEOUT", flush=True)
