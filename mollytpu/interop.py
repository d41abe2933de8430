"""Interop layer: external calculators and calculator facade.

Parity with the reference's L8 (SURVEY.md 2.13):
- `ExternalCalculator` ~ ASECalculator (ext/MollyPythonCallExt.jl:1-133):
  wraps an arbitrary host-side Python energy/force function (an ASE
  calculator, a torch model, ...) as a general interaction. The host call
  crosses the jit boundary through `jax.pure_callback`, so external
  potentials compose with the jitted simulate loop (the callback runs on
  the host each step, exactly like the reference's PythonCall round trip).
- `Calculator` ~ MollyCalculator (src/types.jl:1756-1872): exposes a built
  System's force engine as plain energy/forces functions for external
  drivers (geometry optimizers, ML training loops).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ExternalCalculator:
    """General interaction backed by a host Python function.

    fn(coords_np (N,3) nm, box_np (3,) nm) -> (energy kJ/mol,
    forces (N,3) kJ/mol/nm) as numpy arrays. Unit conversion from e.g. ASE
    (eV/Angstrom) is the caller's job; `from_ase` builds the standard one.
    """

    fn: object = dataclasses.field(metadata={"static": True})
    n_atoms: int = dataclasses.field(default=0, metadata={"static": True})
    # host fn returning the (3,3) virial (kJ/mol): fn_virial(coords, box).
    # Under PBC the virial CANNOT be recovered from absolute coordinates
    # (-sum x (x) f is boundary-frame dependent), so NPT with an external
    # potential requires the calculator to supply it (e.g. from an ASE
    # stress tensor); without it, needs_virial raises instead of silently
    # producing a wrap-dependent pressure.
    fn_virial: object = dataclasses.field(default=None,
                                          metadata={"static": True})

    def _call(self, coords, boundary, with_virial=False):
        dtype = coords.dtype
        box = jnp.asarray(boundary.side_lengths, dtype)

        def host(c, b):
            e, f = self.fn(np.asarray(c, np.float64), np.asarray(b, np.float64))
            out = [np.asarray(e, c.dtype).reshape(()),
                   np.asarray(f, c.dtype).reshape(c.shape)]
            if with_virial:
                v = self.fn_virial(np.asarray(c, np.float64),
                                   np.asarray(b, np.float64))
                out.append(np.asarray(v, c.dtype).reshape(3, 3))
            return tuple(out)

        out_shape = [jax.ShapeDtypeStruct((), dtype),
                     jax.ShapeDtypeStruct(coords.shape, dtype)]
        if with_virial:
            out_shape.append(jax.ShapeDtypeStruct((3, 3), dtype))
        return jax.pure_callback(host, tuple(out_shape), coords, box)

    def energy(self, coords, boundary, atoms):
        e, _ = self._call(coords, boundary)
        return e

    def force_virial(self, coords, boundary, atoms, needs_virial=False):
        sl = boundary.side_lengths
        if isinstance(sl, jax.core.Tracer):
            # under jit the box values are traced; assume periodic (the
            # conservative branch — NPT in open boundaries is ill-posed)
            periodic = True
        else:
            periodic = bool(np.any(np.isfinite(np.asarray(
                jax.device_get(sl)))))
        if self.fn_virial is not None:
            e, f, vir = self._call(coords, boundary, with_virial=True)
            return f, vir
        e, f = self._call(coords, boundary)
        if not periodic:
            # open boundaries: the absolute-coordinate form is frame-exact
            return f, -jnp.einsum("na,nb->ab", coords, f)
        if needs_virial:
            raise ValueError(
                "ExternalCalculator cannot compute a virial under periodic "
                "boundaries from forces alone; pass fn_virial (e.g. from an "
                "ASE stress tensor) to run NPT with an external potential")
        return f, jnp.zeros((3, 3), coords.dtype)

    @classmethod
    def from_ase(cls, ase_atoms, calc, n_atoms=0, use_stress=False):
        """Wrap an ASE calculator: converts nm -> Angstrom in, eV -> kJ/mol
        out (ext/MollyPythonCallExt.jl unit plumbing). With use_stress=True
        the calculator's potential stress tensor supplies the PBC virial
        (W = -V sigma in the repo's W = sum r (x) f convention)."""
        EV_TO_KJMOL = 96.48533212331002

        def fn(coords_nm, box_nm):
            ase_atoms.set_positions(coords_nm * 10.0)
            if np.all(np.isfinite(box_nm)):
                ase_atoms.set_cell(np.diag(box_nm * 10.0))
            ase_atoms.calc = calc
            e = ase_atoms.get_potential_energy() * EV_TO_KJMOL
            f = ase_atoms.get_forces() * (EV_TO_KJMOL / 0.1)  # eV/A -> kJ/mol/nm
            return e, f

        fn_virial = None
        if use_stress:
            def fn_virial(coords_nm, box_nm):
                ase_atoms.set_positions(coords_nm * 10.0)
                if np.all(np.isfinite(box_nm)):
                    ase_atoms.set_cell(np.diag(box_nm * 10.0))
                ase_atoms.calc = calc
                s = np.asarray(ase_atoms.get_stress(voigt=False))
                s = s * (EV_TO_KJMOL * 1000.0)   # eV/A^3 -> kJ/mol/nm^3
                vol = float(np.prod(box_nm))
                return -vol * s

        return cls(fn=fn, n_atoms=n_atoms, fn_virial=fn_virial)


jax.tree_util.register_dataclass(ExternalCalculator, data_fields=[],
                                 meta_fields=["fn", "n_atoms", "fn_virial"])


class Calculator:
    """Expose a System's force engine as standalone jitted callables
    (MollyCalculator parity). Useful for external optimizers and for
    training loops differentiating through energies."""

    def __init__(self, sys):
        from .forces import potential_energy, forces
        from .ops.neighbors import find_neighbors
        self.sys = sys

        def _nbs(coords):
            return find_neighbors(sys.neighbor_finder, coords, sys.boundary,
                                  sys.exclusions, 0)

        self._energy = jax.jit(
            lambda c: potential_energy(sys.update(coords=c), _nbs(c)))
        self._forces = jax.jit(
            lambda c: forces(sys.update(coords=c), _nbs(c)))

    def energy(self, coords):
        return self._energy(jnp.asarray(coords))

    def forces(self, coords):
        return self._forces(jnp.asarray(coords))

    def energy_and_forces(self, coords):
        c = jnp.asarray(coords)
        return self._energy(c), self._forces(c)
