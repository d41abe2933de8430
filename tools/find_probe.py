"""End-to-end find() timing on the 6mrr config."""
import os
os.environ.setdefault("MOLLYTPU_LANES", "512")
import jax
import bench
from qtime import qtime
sys_ = bench.build()
f = sys_.neighbor_finder
fn = jax.jit(lambda c: f.find(c, sys_.boundary, sys_.exclusions, 0))
print("find():", round(qtime(fn, sys_.coords, reps=20), 3), "ms", flush=True)
