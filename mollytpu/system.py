"""The System container — an immutable pytree of simulation state.

TPU-native re-design of the reference's mutable `System`
(/root/reference/src/types.jl:795-1098): instead of in-place mutation driven
from the host every step, a System here is a frozen dataclass whose array
leaves (coords, velocities, box, interaction parameters) flow through a fully
jit-compiled step; "mutation" is `dataclasses.replace` / `.update(...)`,
which XLA turns into in-place buffer donation under jit. Static structure
(which interactions exist, list kinds, table sizes) lives in pytree metadata,
so a simulation loop traces once.

Exclusion bookkeeping: the reference materializes eligible/special masks in
the neighbor finder (src/neighbors.jl:104-364). Here exclusions are stored
sparsely as (i, j) index arrays plus fixed-width per-atom lookup tables used
by the neighbor engine for branch-free membership tests.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .atoms import Atoms
from .spatial import n_dof as calc_n_dof


def _pad_tables(n_atoms, pairs_i, pairs_j, width):
    """Build (N, width) per-atom partner tables from sparse symmetric pairs;
    unfilled slots hold the sentinel n_atoms."""
    table = np.full((n_atoms, width), n_atoms, dtype=np.int32)
    fill = np.zeros(n_atoms, dtype=np.int64)
    for a, b in zip(np.asarray(pairs_i), np.asarray(pairs_j)):
        for x, y in ((a, b), (b, a)):
            if fill[x] >= width:
                raise ValueError(
                    f"atom {x} has more than {width} excluded/special partners; "
                    "increase table width"
                )
            table[x, fill[x]] = y
            fill[x] += 1
    return table


#: windowed-bitmap half-width: partner offsets d = j - i with |d| <= 31 are
#: representable as bits; pairs outside the window go to the far lists.
EXCL_WINDOW = 32


def _bitmap_tables(n_atoms, pairs_i, pairs_j):
    """((N+1, 2) int32 windowed bitmaps, (F, 2) far pairs).

    Bit k of word (k // 32) at row i marks partner i + (k - EXCL_WINDOW),
    for k - EXCL_WINDOW in [-32, 31]. Bonded exclusions are id-local in
    every standard topology (6mrr max span: 22), so the far list is almost
    always empty; the Pallas kernel tests bits on the fly and the dense
    correction pass handles the far remainder exactly."""
    bits = np.zeros((n_atoms + 1, 2), dtype=np.uint32)
    far = []
    for a, b in zip(np.asarray(pairs_i), np.asarray(pairs_j)):
        a, b = int(a), int(b)
        # symmetric rule |b - a| <= 31: both directions representable, so a
        # pair is either fully in-window or fully in the far list
        if abs(b - a) <= EXCL_WINDOW - 1:
            for x, y in ((a, b), (b, a)):
                d = y - x + EXCL_WINDOW
                bits[x, d // 32] |= np.uint32(1) << np.uint32(d % 32)
        else:
            far.append((min(a, b), max(a, b)))
    far_arr = (np.asarray(far, dtype=np.int32).reshape(-1, 2)
               if far else np.zeros((0, 2), np.int32))
    return bits.view(np.int32), far_arr


@dataclasses.dataclass(frozen=True)
class Exclusions:
    """Sparse excluded (1-2/1-3) and special (1-4) pair lists + padded
    per-atom tables for O(1) membership tests in the dense/cell-tile
    engines + windowed per-atom bitmaps (|j - i| < 32) for the Pallas
    block-pair kernel, with far-pair remainder lists corrected densely."""

    excl_i: jax.Array  # (E,) int32, i < j
    excl_j: jax.Array
    spec_i: jax.Array  # (S,) int32, i < j
    spec_j: jax.Array
    excl_table: jax.Array  # (N, We) int32, sentinel = N
    spec_table: jax.Array  # (N, Ws) int32, sentinel = N
    excl_bits: jax.Array = None  # (N+1, 2) int32 windowed bitmap, row N = 0
    spec_bits: jax.Array = None  # (N+1, 2) int32
    far_excl: jax.Array = None   # (F, 2) int32 pairs outside the window
    far_spec: jax.Array = None   # (F', 2) int32

    @classmethod
    def build(cls, n_atoms, excl_pairs=(), special_pairs=(), max_excl=16, max_special=16):
        def norm(pairs):
            if len(pairs) == 0:
                return np.zeros((0,), np.int32), np.zeros((0,), np.int32)
            arr = np.asarray(pairs, dtype=np.int32).reshape(-1, 2)
            lo = np.minimum(arr[:, 0], arr[:, 1])
            hi = np.maximum(arr[:, 0], arr[:, 1])
            uniq = np.unique(np.stack([lo, hi], axis=1), axis=0)
            return uniq[:, 0], uniq[:, 1]

        ei, ej = norm(excl_pairs)
        si, sj = norm(special_pairs)
        et = _pad_tables(n_atoms, ei, ej, max_excl)
        st = _pad_tables(n_atoms, si, sj, max_special)
        eb, fe = _bitmap_tables(n_atoms, ei, ej)
        sb, fs = _bitmap_tables(n_atoms, si, sj)
        return cls(jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(si), jnp.asarray(sj),
                   jnp.asarray(et), jnp.asarray(st),
                   excl_bits=jnp.asarray(eb), spec_bits=jnp.asarray(sb),
                   far_excl=jnp.asarray(fe), far_spec=jnp.asarray(fs))

    @classmethod
    def empty(cls, n_atoms):
        z = jnp.zeros((0,), jnp.int32)
        t = jnp.full((n_atoms, 1), n_atoms, dtype=jnp.int32)
        zb = jnp.zeros((n_atoms + 1, 2), jnp.int32)
        zp = jnp.zeros((0, 2), jnp.int32)
        return cls(z, z, z, z, t, t, excl_bits=zb, spec_bits=zb,
                   far_excl=zp, far_spec=zp)


jax.tree_util.register_dataclass(
    Exclusions,
    data_fields=["excl_i", "excl_j", "spec_i", "spec_j", "excl_table",
                 "spec_table", "excl_bits", "spec_bits", "far_excl",
                 "far_spec"],
    meta_fields=[],
)


@dataclasses.dataclass(frozen=True)
class System:
    """Complete simulation state + model description (reference parity:
    src/types.jl:795-1098, minus loggers which are passed to `simulate`)."""

    atoms: Atoms
    coords: jax.Array           # (N, D) nm
    boundary: object            # Orthorhombic | Triclinic
    velocities: jax.Array = None  # (N, D) nm/ps
    pairwise_inters: Tuple = ()
    specific_lists: Tuple = ()
    general_inters: Tuple = ()
    constraints: Tuple = ()
    virtual_sites: object = None  # ops.virtual_sites.VirtualSites | None
    exclusions: Exclusions = None
    neighbor_finder: object = None  # ops.neighbors finder (static config pytree)
    molecule_ids: jax.Array = None  # (N,) int32
    n_molecules: int = dataclasses.field(default=1, metadata={"static": True})
    n_dof: int = dataclasses.field(default=0, metadata={"static": True})
    # k_B is fixed by the internal unit system (see units.py).

    def __post_init__(self):
        if self.velocities is None:
            object.__setattr__(self, "velocities", jnp.zeros_like(self.coords))
        if self.exclusions is None:
            object.__setattr__(self, "exclusions", Exclusions.empty(self.n_atoms))
        if self.molecule_ids is None:
            object.__setattr__(self, "molecule_ids",
                               jnp.zeros((self.n_atoms,), dtype=jnp.int32))
        if self.n_dof == 0:
            n_frozen = 0
            n_constr = sum(getattr(c, "n_constraints", 0) for c in self.constraints)
            if self.virtual_sites is not None:
                n_frozen = self.virtual_sites.n_sites
            object.__setattr__(
                self, "n_dof",
                calc_n_dof(self.n_atoms, n_constr, self.n_dims, True, n_frozen))

    @property
    def n_atoms(self) -> int:
        return self.coords.shape[0]

    @property
    def n_dims(self) -> int:
        return self.coords.shape[1]

    @property
    def masses(self):
        return self.atoms.mass

    def update(self, **kw):
        return dataclasses.replace(self, **kw)


jax.tree_util.register_dataclass(
    System,
    data_fields=[
        "atoms", "coords", "boundary", "velocities", "pairwise_inters",
        "specific_lists", "general_inters", "constraints", "virtual_sites",
        "exclusions", "neighbor_finder", "molecule_ids",
    ],
    meta_fields=["n_molecules", "n_dof"],
)


def molecule_ids_from_bonds(n_atoms, bond_pairs):
    """Connected components of the bond graph -> per-atom molecule id
    (reference: MolecularTopology via Graphs.jl, src/types.jl:575-603).
    Host-side union-find at setup time."""
    parent = np.arange(n_atoms)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in bond_pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[ra] = rb
    roots = np.array([find(i) for i in range(n_atoms)])
    _, ids = np.unique(roots, return_inverse=True)
    return jnp.asarray(ids, dtype=jnp.int32), int(ids.max()) + 1 if n_atoms else 0
