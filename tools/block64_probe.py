"""Capture the actual exception for sub-128 BLOCK kernel compilation."""
import os, traceback
os.environ.setdefault("MOLLYTPU_LANES", "512")
import jax
import bench
from mollytpu.ops.blockpairs import BlockPairFinder
from mollytpu.ops.pallas_pairwise import build_fused_spec, pallas_block_nonbonded

sys_ = bench.build()
spec = build_fused_spec(tuple(i for i in sys_.pairwise_inters
                              if getattr(i, "use_neighbors", False)))
for blk, lanes in [(64, 256), (32, 256)]:
    try:
        finder = BlockPairFinder.setup(sys_.boundary, 1.15, sys_.n_atoms,
                                       n_steps=20, coords=sys_.coords,
                                       atoms=sys_.atoms, block=blk,
                                       lanes=lanes)
        nbs = jax.jit(lambda c: finder.find(c, sys_.boundary,
                                            sys_.exclusions, 0))(sys_.coords)
        print(f"({blk},{lanes}) find ok, overflow={int(jax.device_get(nbs.overflow))}",
              flush=True)
        f, _, _ = jax.jit(lambda c, n: pallas_block_nonbonded(
            spec, c, sys_.boundary, sys_.atoms, sys_.exclusions, n,
            finder))(sys_.coords, nbs)
        jax.block_until_ready(f)
        print(f"({blk},{lanes}) kernel OK", flush=True)
    except Exception as e:
        print(f"({blk},{lanes}) FAIL:", flush=True)
        traceback.print_exc()
        print("---", flush=True)
