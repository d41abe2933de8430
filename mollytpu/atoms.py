"""Per-atom parameter arrays (structure-of-arrays Atom record).

The reference keeps a 32-byte bits-type `Atom` per particle
(/root/reference/src/types.jl:466-545) in an array-of-structs; the TPU-native
layout is structure-of-arrays so each field is a contiguous (N,) device array
feeding the vector units. A single `Atoms` dataclass serves both the batched
form (array leaves) and the per-atom view produced by tree indexing / vmap
(scalar leaves).

Non-bits metadata (names, residues, elements) lives host-side in `AtomData`,
mirroring the reference's sidecar (src/types.jl:556-564).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Alchemical roles (src/free_energy/alchemy.jl:1-5).
ALCH_CORE = 0
ALCH_INSERT = 1
ALCH_DELETE = 2


@dataclasses.dataclass(frozen=True)
class Atoms:
    """SoA atom parameters. Optional fields stay None when unused so the
    pytree remains minimal."""

    mass: jax.Array                      # (N,) u
    charge: jax.Array                    # (N,) e
    sigma: jax.Array                     # (N,) nm
    epsilon: jax.Array                   # (N,) kJ/mol
    atom_type: jax.Array = None          # (N,) int32 — NBFix / FF type id
    lam: jax.Array = None                # (N,) alchemical lambda in [0, 1]
    alch_role: jax.Array = None          # (N,) int32 (ALCH_*)
    buck_A: Optional[jax.Array] = None   # Buckingham A (kJ/mol)
    buck_B: Optional[jax.Array] = None   # Buckingham B (1/nm)
    buck_C: Optional[jax.Array] = None   # Buckingham C (kJ/mol nm^6)

    @property
    def n_atoms(self) -> int:
        return self.mass.shape[0]

    def view(self, i):
        """Per-atom (or gathered) view — tree-index every non-None leaf."""
        return jax.tree.map(lambda a: a[i], self)


jax.tree_util.register_dataclass(
    Atoms,
    data_fields=[
        "mass", "charge", "sigma", "epsilon", "atom_type", "lam", "alch_role",
        "buck_A", "buck_B", "buck_C",
    ],
    meta_fields=[],
)


def make_atoms(n=None, mass=1.0, charge=0.0, sigma=0.0, epsilon=0.0,
               atom_type=None, lam=1.0, alch_role=ALCH_CORE,
               buck_A=None, buck_B=None, buck_C=None, dtype=jnp.float32):
    """Convenience constructor broadcasting scalars to (N,) arrays."""

    def arr(x, dt=dtype):
        x = jnp.asarray(x, dtype=dt)
        if x.ndim == 0:
            if n is None:
                raise ValueError("n must be given when all params are scalars")
            x = jnp.full((n,), x, dtype=dt)
        return x

    fields = dict(
        mass=arr(mass), charge=arr(charge), sigma=arr(sigma), epsilon=arr(epsilon),
        lam=arr(lam),
    )
    n_atoms = fields["mass"].shape[0]
    fields["atom_type"] = (
        arr(atom_type, jnp.int32) if atom_type is not None
        else jnp.zeros((n_atoms,), dtype=jnp.int32)
    )
    fields["alch_role"] = arr(alch_role, jnp.int32)
    for name, val in (("buck_A", buck_A), ("buck_B", buck_B), ("buck_C", buck_C)):
        fields[name] = None if val is None else arr(val)
    return Atoms(**fields)


@dataclasses.dataclass
class AtomData:
    """Host-side per-atom metadata (never shipped to device)."""

    atom_name: np.ndarray = None      # str
    residue_name: np.ndarray = None   # str
    residue_number: np.ndarray = None # int
    chain_id: np.ndarray = None       # str
    element: np.ndarray = None        # str
    hetero_atom: np.ndarray = None    # bool
