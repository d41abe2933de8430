"""Time + accuracy probe: moment-matmul precision HIGH vs HIGHEST on 6mrr."""
import os
os.environ.setdefault("MOLLYTPU_LANES", "512")
import importlib
import jax, jax.numpy as jnp, numpy as np
import bench
from qtime import qtime
from mollytpu.forces import forces_virial
from mollytpu.ops.neighbors import find_neighbors

sys_ = bench.build()
pair_sys = sys_.update(general_inters=(), specific_lists=(), constraints=())
nbs = find_neighbors(sys_.neighbor_finder, sys_.coords, sys_.boundary,
                     sys_.exclusions, 0)

def run(tag):
    import mollytpu.ops.pallas_pairwise as pp
    importlib.reload(pp)  # re-read env
    fn = jax.jit(lambda c: forces_virial(pair_sys.update(coords=c), nbs)[0])
    t = qtime(fn, sys_.coords)
    f = np.asarray(jax.device_get(fn(sys_.coords)))
    print(f"{tag}: {t:.3f} ms", flush=True)
    return f

f_hi = run("HIGHEST")
os.environ["MOLLYTPU_MOMENT_HIGH"] = "1"
f_hg = run("HIGH")
d = np.linalg.norm(f_hi - f_hg, axis=1)
s = np.linalg.norm(f_hi, axis=1).max()
print(f"max |df| = {d.max():.5f} kJ/mol/nm (max |f| = {s:.1f}), "
      f"rel {d.max()/s:.2e}", flush=True)
