"""Top-level force / energy dispatchers.

Parity with the reference's L3 engine (src/force.jl `forces!` :722-806,
src/energy.jl `potential_energy`/`total_energy` :13-175): pairwise
interactions split by `use_neighbors` into the dense and neighbor-list paths,
bonded terms evaluate via segment-sum, general interactions (PME, GBSA,
dispersion, biases) contribute last, and virtual-site forces redistribute to
their parents. Everything here is jit-compatible and returns new arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from .ops import nonbonded
from .ops.bonded import all_specific_forces, specific_energy
from .ops.celltiles import CellTiles, tile_energy, tile_forces
from .ops.blockpairs import BlockPairs
from .spatial import kinetic_energy as _ke


def _pallas_dispatch(sys, nl, neighbors):
    """Use the fused Pallas kernel when the neighbor structure is block
    pairs, the box is orthorhombic or triclinic (3-D; the in-kernel MIC is
    the reduced-cell back-substitution covering both) and the interactions
    are in the fused set."""
    if not isinstance(neighbors, BlockPairs):
        return None
    from .boundary import Orthorhombic, Triclinic
    if isinstance(sys.boundary, Orthorhombic):
        if sys.boundary.side_lengths.shape[-1] != 3:
            return None
    elif not isinstance(sys.boundary, Triclinic):
        return None
    from .ops.pallas_pairwise import build_fused_spec
    return build_fused_spec(nl)


def _split_by_neighbors(inters):
    nonl = tuple(i for i in inters if not getattr(i, "use_neighbors", False))
    nl = tuple(i for i in inters if getattr(i, "use_neighbors", False))
    return nonl, nl


def potential_energy(sys, neighbors=None, step_n=0):
    """Total potential energy (kJ/mol)."""
    coords, boundary, atoms = sys.coords, sys.boundary, sys.atoms
    e = jnp.zeros((), dtype=coords.dtype)
    nonl, nl = _split_by_neighbors(sys.pairwise_inters)
    if nonl:
        mask = nonbonded.dense_pair_mask(sys.n_atoms, sys.exclusions)
        e = e + nonbonded.dense_energy(nonl, atoms, coords, boundary, mask)
    if nl:
        if neighbors is None:
            raise ValueError("neighbor-list interactions present but neighbors is None")
        spec = _pallas_dispatch(sys, nl, neighbors)
        if spec is not None:
            from .ops.pallas_pairwise import pallas_block_nonbonded
            _, e_nb, _ = pallas_block_nonbonded(
                spec, coords, boundary, atoms, sys.exclusions, neighbors,
                sys.neighbor_finder, compute_energy=True)
            e = e + e_nb
        elif isinstance(neighbors, CellTiles):
            e = e + tile_energy(nl, atoms, coords, boundary, neighbors,
                                sys.neighbor_finder, sys.exclusions)
        else:
            e = e + nonbonded.neighbor_energy(nl, atoms, coords, boundary, neighbors)
    for slist in sys.specific_lists:
        e = e + specific_energy(slist, coords, boundary)
    for gi in sys.general_inters:
        e = e + gi.energy(coords, boundary, atoms)
    return e


def forces_virial(sys, neighbors=None, step_n=0, needs_virial=False):
    """(forces (N, D) kJ/mol/nm, virial (D, D) kJ/mol)."""
    coords, boundary, atoms = sys.coords, sys.boundary, sys.atoms
    d = sys.n_dims
    fs = jnp.zeros_like(coords)
    vir = jnp.zeros((d, d), dtype=coords.dtype)
    nonl, nl = _split_by_neighbors(sys.pairwise_inters)
    if nonl:
        mask = nonbonded.dense_pair_mask(sys.n_atoms, sys.exclusions)
        f, v = nonbonded.dense_forces(nonl, atoms, coords, boundary, mask,
                                      velocities=sys.velocities, step_n=step_n,
                                      needs_virial=needs_virial)
        fs, vir = fs + f, vir + v
    if nl:
        if neighbors is None:
            raise ValueError("neighbor-list interactions present but neighbors is None")
        spec = _pallas_dispatch(sys, nl, neighbors)
        if spec is not None:
            from .ops.pallas_pairwise import pallas_block_nonbonded
            f, _, v = pallas_block_nonbonded(
                spec, coords, boundary, atoms, sys.exclusions, neighbors,
                sys.neighbor_finder, compute_energy=needs_virial)
        elif isinstance(neighbors, CellTiles):
            f, v = tile_forces(nl, atoms, coords, boundary, neighbors,
                               sys.neighbor_finder, sys.exclusions,
                               velocities=sys.velocities, step_n=step_n,
                               needs_virial=needs_virial)
        else:
            f, v = nonbonded.neighbor_forces(nl, atoms, coords, boundary, neighbors,
                                             velocities=sys.velocities, step_n=step_n,
                                             needs_virial=needs_virial)
        fs, vir = fs + f, vir + v
    if sys.specific_lists:
        f, v = all_specific_forces(sys.specific_lists, coords, boundary,
                                   needs_virial=needs_virial)
        fs, vir = fs + f, vir + v
    for gi in sys.general_inters:
        f, v = gi.force_virial(coords, boundary, atoms, needs_virial=needs_virial)
        fs, vir = fs + f, vir + v
    if sys.virtual_sites is not None:
        fs = sys.virtual_sites.distribute_forces(coords, boundary, fs)
    return fs, vir


def forces(sys, neighbors=None, step_n=0):
    return forces_virial(sys, neighbors, step_n, needs_virial=False)[0]


def accelerations(sys, neighbors=None, step_n=0):
    """F/m with zero acceleration for massless (virtual) sites
    (reference: calc_accels, src/force.jl:17)."""
    f = forces(sys, neighbors, step_n)
    m = sys.masses
    safe_m = jnp.where(m > 0, m, 1.0)
    return jnp.where((m > 0)[:, None], f / safe_m[:, None], 0.0)


def kinetic_energy(sys):
    return _ke(sys.masses, sys.velocities)


def total_energy(sys, neighbors=None, step_n=0):
    return potential_energy(sys, neighbors, step_n) + kinetic_energy(sys)
