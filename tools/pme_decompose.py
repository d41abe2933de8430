"""Decompose the PME reciprocal pipeline on the 6mrr system (TPU).

Stage costs come from CUMULATIVE pipelines (tables; tables+spread;
tables+spread+conv; ...) so the ~1.4 ms per-dispatch device gap of the
tunneled TPU cancels in the differences (standalone per-op timings are
inflated by that constant; see tools/qtime.py).

Note: the model builders fold Ewald exclusion corrections into the fused
bonded engine (ops/ewald.py ewald_exclusion_list), so the final "+ excl
corr" delta is ~0 on bench systems; it only measures the in-PME escape
hatch when PME was built with excl_pairs directly.

    PYTHONPATH=/root/.axon_site:/root/repo:/root/repo/tools python tools/pme_decompose.py
"""
import os

os.environ.setdefault("MOLLYTPU_LANES", "512")

import jax

import bench
from qtime import qtime
from mollytpu.ops.ewald import _effective_charges


def main():
    sys = bench.build()
    pme = next(g for g in sys.general_inters if type(g).__name__ == "PME")
    coords, boundary, atoms = sys.coords, sys.boundary, sys.atoms
    dtype = coords.dtype
    q = _effective_charges(atoms, pme.scheduler)
    print(f"mesh_dims={pme.mesh_dims} order={pme.order} alpha={pme.alpha:.3f}"
          f" n_excl_in_pme={pme.excl_i.shape[0]}", flush=True)

    def upto_tables(c):
        tabs, recip = pme._dense_tables(c, boundary, q, dtype)
        return tabs[0][0]

    def upto_spread(c):
        tabs, recip = pme._dense_tables(c, boundary, q, dtype)
        return pme._spread_dense(tabs, q, dtype)

    def upto_conv(c):
        tabs, recip = pme._dense_tables(c, boundary, q, dtype)
        grid = pme._spread_dense(tabs, q, dtype)
        return pme._convolve(grid, boundary, dtype)[1]

    def upto_interp(c):
        tabs, recip = pme._dense_tables(c, boundary, q, dtype)
        grid = pme._spread_dense(tabs, q, dtype)
        _, phi, _ = pme._convolve(grid, boundary, dtype)
        return pme._interp_dense(phi, tabs, q, recip, dtype)

    def upto_full(c):
        return pme.force_virial(c, boundary, atoms)[0]

    prev = 0.0
    for name, fn in [("dense tables", upto_tables),
                     ("+ spread", upto_spread),
                     ("+ FFT/influence/iFFT", upto_conv),
                     ("+ interp", upto_interp),
                     ("+ excl corr (= full)", upto_full)]:
        t = qtime(jax.jit(fn), coords)
        print(f"  {name:24s} {t:7.3f} ms  (delta {t - prev:+.3f})",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
