"""Time sub-128 blocks with the per-pair-MIC kernel variant vs the default."""
import os, dataclasses
os.environ.setdefault("MOLLYTPU_LANES", "512")
import jax
import numpy as np
import bench
from qtime import qtime
from mollytpu.ops.blockpairs import BlockPairFinder
from mollytpu.ops.pallas_pairwise import build_fused_spec, pallas_block_nonbonded

sys_ = bench.build()
spec = build_fused_spec(tuple(i for i in sys_.pairwise_inters
                              if getattr(i, "use_neighbors", False)))
ref = None
for blk, lanes, hoist in [(128, 512, None), (64, 256, False), (64, 512, False),
                          (32, 256, False), (32, 512, False)]:
    finder = BlockPairFinder.setup(sys_.boundary, 1.15, sys_.n_atoms,
                                   n_steps=20, coords=sys_.coords,
                                   atoms=sys_.atoms, block=blk, lanes=lanes)
    if hoist is not None:
        finder = dataclasses.replace(finder, hoist_mic=hoist)
    find = jax.jit(lambda c, f=finder: f.find(c, sys_.boundary,
                                              sys_.exclusions, 0))
    nbs = find(sys_.coords)
    ov = int(jax.device_get(nbs.overflow))
    force = jax.jit(lambda c, n, f=finder: pallas_block_nonbonded(
        spec, c, sys_.boundary, sys_.atoms, sys_.exclusions, n, f)[0])
    t_funcs = qtime(force, sys_.coords, nbs, reps=20)
    t_find = qtime(find, sys_.coords, reps=10)
    f = np.asarray(jax.device_get(force(sys_.coords, nbs)))
    if ref is None:
        ref = f
        err = 0.0
    else:
        err = float(np.abs(f - ref).max())
    print(f"({blk},{lanes},hoist={finder.hoist_mic}) ov={ov} "
          f"force={t_funcs:.3f}ms find={t_find:.3f}ms items={int(nbs.n_items[0])} "
          f"maxdiff={err:.2e}", flush=True)
