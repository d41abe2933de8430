"""Run the launch-config sweep on the 6mrr bench config and print scores."""
import os

os.environ.setdefault("MOLLYTPU_AUTOTUNE", "0")  # build defaults, sweep here

import bench
from mollytpu.ops.autotune import tune_tile_shape


def main():
    sys = bench.build()
    shape = tune_tile_shape(sys.boundary, 1.0 + bench.SKIN, sys.n_atoms,
                            sys.coords, sys.atoms, sys.exclusions,
                            sys.pairwise_inters, n_steps=bench.CADENCE,
                            verbose=True)
    print("WINNER:", shape)


if __name__ == "__main__":
    main()
