"""Bonded ("specific") interactions: bonds, angles, torsions, restraints.

TPU-native re-design of the reference's InteractionList{1..5}Atoms + per-type
SpecificInteraction structs (/root/reference/src/types.jl:62-440 and
src/interactions/{harmonic_bond,morse_bond,fene_bond,harmonic_angle,
cosine_angle,urey_bradley,periodic_torsion,rb_torsion,harmonic_torsion,
harmonic_position_restraint}.jl).

Design: every bonded term type is a row in a `SpecificList` — a SoA pytree of
(K, arity) atom indices plus named (K,)-shaped parameter arrays. A registry
maps the static `kind` tag to a scalar term-energy function of the gathered
term coordinates; forces are JAX autodiff of that scalar, scattered back with
segment-sum (the functional replacement for the reference's per-thread chunks
and GPU atomic adds, src/kernels.jl:142-391). A per-term `weight` column
implements zero-padding to static shapes and alchemical term scaling.

Periodic images: term geometry is built from minimum-image displacement
vectors; jnp.round's zero gradient makes the image choice constant under
autodiff, exactly the semantics the reference gets by recomputing MIC vectors
per term (src/force.jl:971-1194).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SpecificList:
    """SoA list of same-kind bonded terms.

    kind: static registry tag; atom_idx: (K, arity) int32; params: dict of
    (K,)-shaped arrays, always including 'weight'.
    """

    kind: str = dataclasses.field(metadata={"static": True})
    atom_idx: jax.Array = None
    params: Dict[str, jax.Array] = None

    @property
    def n_terms(self) -> int:
        return self.atom_idx.shape[0]

    @property
    def arity(self) -> int:
        return self.atom_idx.shape[1]


jax.tree_util.register_dataclass(
    SpecificList, data_fields=["atom_idx", "params"], meta_fields=["kind"]
)


def _angle(v1, v2):
    """Differentiable angle between two vectors via atan2 (stable near 0/pi
    where acos' gradient blows up)."""
    cross = jnp.cross(v1, v2)
    sin_t = jnp.sqrt(jnp.sum(cross * cross) + 1e-24)
    cos_t = jnp.dot(v1, v2)
    return jnp.arctan2(sin_t, cos_t)


def _dihedral(r_i, r_j, r_k, r_l, boundary):
    """Signed dihedral angle between planes (i,j,k) and (j,k,l), matching the
    reference's torsion_angle convention."""
    b1 = boundary.displacement(r_i, r_j)
    b2 = boundary.displacement(r_j, r_k)
    b3 = boundary.displacement(r_k, r_l)
    c1 = jnp.cross(b1, b2)
    c2 = jnp.cross(b2, b3)
    b2n = jnp.sqrt(jnp.sum(b2 * b2) + 1e-24)
    x = jnp.dot(c1, c2)
    y = jnp.dot(jnp.cross(c1, c2), b2) / b2n
    return jnp.arctan2(y, x)


def _dist(r_a, r_b, boundary):
    dr = boundary.displacement(r_a, r_b)
    return jnp.sqrt(jnp.sum(dr * dr) + 1e-24)


# --- term energy functions: fn(coords (A, 3), boundary, p) -> scalar --------


def _e_harmonic_bond(c, boundary, p):
    r = _dist(c[0], c[1], boundary)
    return 0.5 * p["k"] * (r - p["r0"]) ** 2


def _e_morse_bond(c, boundary, p):
    r = _dist(c[0], c[1], boundary)
    x = 1.0 - jnp.exp(-p["a"] * (r - p["r0"]))
    return p["D"] * x * x


def _e_fene_bond(c, boundary, p):
    # -(k/2) r0^2 ln(1-(r/r0)^2) + WCA(sigma, epsilon) (fene_bond.jl)
    r = _dist(c[0], c[1], boundary)
    ratio2 = jnp.clip((r / p["r0"]) ** 2, 0.0, 0.999999)
    fene = -0.5 * p["k"] * p["r0"] ** 2 * jnp.log(1.0 - ratio2)
    sig, eps = p["sigma"], p["epsilon"]
    r_wca = 2.0 ** (1.0 / 6.0) * sig
    six = (sig / r) ** 6
    wca = jnp.where((r < r_wca) & (eps > 0), 4.0 * eps * (six * six - six) + eps, 0.0)
    return fene + wca


def _e_harmonic_angle(c, boundary, p):
    v_ji = boundary.displacement(c[1], c[0])
    v_jk = boundary.displacement(c[1], c[2])
    theta = _angle(v_ji, v_jk)
    return 0.5 * p["k"] * (theta - p["theta0"]) ** 2


def _e_cosine_angle(c, boundary, p):
    v_ji = boundary.displacement(c[1], c[0])
    v_jk = boundary.displacement(c[1], c[2])
    theta = _angle(v_ji, v_jk)
    return p["k"] * (1.0 + jnp.cos(theta - p["theta0"]))


def _e_urey_bradley(c, boundary, p):
    v_ji = boundary.displacement(c[1], c[0])
    v_jk = boundary.displacement(c[1], c[2])
    theta = _angle(v_ji, v_jk)
    r13 = _dist(c[0], c[2], boundary)
    return (0.5 * p["kangle"] * (theta - p["theta0"]) ** 2
            + 0.5 * p["kbond"] * (r13 - p["r0"]) ** 2)


def _e_periodic_torsion(c, boundary, p):
    phi = _dihedral(c[0], c[1], c[2], c[3], boundary)
    return p["k"] * (1.0 + jnp.cos(p["periodicity"] * phi - p["phase"]))


def _e_rb_torsion(c, boundary, p):
    # GROMACS Ryckaert-Bellemans: V = sum_n c_n cos(psi)^n, psi = phi - pi.
    phi = _dihedral(c[0], c[1], c[2], c[3], boundary)
    cos_psi = jnp.cos(phi - jnp.pi)
    e = p["c0"]
    cp = cos_psi
    for n in range(1, 6):
        e = e + p[f"c{n}"] * cp
        cp = cp * cos_psi
    return e


def _e_harmonic_torsion(c, boundary, p):
    # V = k (theta - theta0)^2 — note no 1/2 factor (harmonic_torsion.jl).
    phi = _dihedral(c[0], c[1], c[2], c[3], boundary)
    # Wrap the difference into (-pi, pi] so the harmonic well is periodic.
    dphi = phi - p["theta0"]
    dphi = dphi - 2.0 * jnp.pi * jnp.round(dphi / (2.0 * jnp.pi))
    return p["k"] * dphi ** 2


def _e_position_restraint(c, boundary, p):
    dr = boundary.displacement(c[0], jnp.stack([p["x0"], p["y0"], p["z0"]]))
    return 0.5 * p["k"] * jnp.sum(dr * dr)


def _e_ewald_exclusion(c, boundary, p):
    # -ke qi qj erf(alpha r)/r: cancels the reciprocal-space interaction of a
    # pair excluded from the Ewald sum (reference models this as a 2-atom
    # bonded interaction too: EwaldExclusion, ewald.jl:978-1008). Living here
    # rides the fused all-families gather+scatter instead of paying its own
    # standalone scatter pass (measured 0.44 ms/step standalone at 6mrr scale
    # vs ~0.05 ms marginal in the fused engine).
    dr = boundary.displacement(c[0], c[1])
    r = jnp.sqrt(jnp.sum(dr * dr) + 1e-24)
    return -p["kqq"] * jax.scipy.special.erf(p["alpha"] * r) / r


TERM_FUNCS = {
    "harmonic_bond": _e_harmonic_bond,
    "morse_bond": _e_morse_bond,
    "fene_bond": _e_fene_bond,
    "harmonic_angle": _e_harmonic_angle,
    "cosine_angle": _e_cosine_angle,
    "urey_bradley": _e_urey_bradley,
    "periodic_torsion": _e_periodic_torsion,
    "rb_torsion": _e_rb_torsion,
    "harmonic_torsion": _e_harmonic_torsion,
    "position_restraint": _e_position_restraint,
    "ewald_exclusion": _e_ewald_exclusion,
}


def register_term(kind, fn):
    """Extension hook: register a custom bonded term energy function."""
    TERM_FUNCS[kind] = fn


# --- list builders (reference ctor parity) ----------------------------------


def _soa(kind, idx_cols, **params):
    idx = jnp.stack([jnp.asarray(c, dtype=jnp.int32) for c in idx_cols], axis=1)
    n = idx.shape[0]
    p = {k: jnp.asarray(v) for k, v in params.items()}
    if "weight" not in p:
        p["weight"] = jnp.ones((n,), dtype=jnp.float32)
    return SpecificList(kind=kind, atom_idx=idx, params=p)


def harmonic_bonds(i, j, k, r0, weight=None):
    return _soa("harmonic_bond", (i, j), k=k, r0=r0,
                **({} if weight is None else {"weight": weight}))


def morse_bonds(i, j, D, a, r0):
    return _soa("morse_bond", (i, j), D=D, a=a, r0=r0)


def fene_bonds(i, j, k, r0, sigma, epsilon):
    return _soa("fene_bond", (i, j), k=k, r0=r0, sigma=sigma, epsilon=epsilon)


def harmonic_angles(i, j, k_idx, k, theta0):
    return _soa("harmonic_angle", (i, j, k_idx), k=k, theta0=theta0)


def cosine_angles(i, j, k_idx, k, theta0):
    return _soa("cosine_angle", (i, j, k_idx), k=k, theta0=theta0)


def urey_bradleys(i, j, k_idx, kangle, theta0, kbond, r0):
    return _soa("urey_bradley", (i, j, k_idx), kangle=kangle, theta0=theta0,
                kbond=kbond, r0=r0)


def periodic_torsions(i, j, k_idx, l, periodicity, phase, k):
    """One row per Fourier term; multi-periodicity torsions flatten to
    several rows with the same atom indices (the reference packs them in
    NTuples, src/interactions/periodic_torsion.jl)."""
    return _soa("periodic_torsion", (i, j, k_idx, l),
                periodicity=jnp.asarray(periodicity, dtype=jnp.float32),
                phase=phase, k=k)


def rb_torsions(i, j, k_idx, l, coeffs):
    """coeffs: (K, 6) Ryckaert-Bellemans coefficients."""
    coeffs = jnp.asarray(coeffs)
    return _soa("rb_torsion", (i, j, k_idx, l),
                **{f"c{n}": coeffs[:, n] for n in range(6)})


def harmonic_torsions(i, j, k_idx, l, k, theta0):
    return _soa("harmonic_torsion", (i, j, k_idx, l), k=k, theta0=theta0)


def position_restraints(i, k, x0):
    x0 = jnp.asarray(x0)
    return _soa("position_restraint", (i,), k=k,
                x0=x0[:, 0], y0=x0[:, 1], z0=x0[:, 2])


def ewald_exclusions(i, j, kqq, alpha):
    """Reciprocal-space correction terms for pairs excluded from an Ewald
    sum: U = -kqq erf(alpha r)/r with kqq = ke qi qj / epsilon_r baked at
    setup (fixed-charge force fields; charge-varying alchemical schedules
    keep the in-PME correction instead)."""
    return _soa("ewald_exclusion", (i, j), kqq=kqq, alpha=alpha)


# --- evaluation engine -------------------------------------------------------


def _pad_single_term(slist: SpecificList) -> SpecificList:
    """Duplicate a lone term with weight 0 so no (1,)-shaped arrays reach XLA.

    XLA:CPU evaluates single-element f64 transcendentals (exp/sin/atan2)
    through a scalar codegen path with only float32-level accuracy; any
    vectorized shape is bit-accurate. Duplicating the real row keeps the
    geometry non-degenerate so gradients stay finite under the zero weight.
    """
    if slist.n_terms != 1:
        return slist
    idx = jnp.concatenate([slist.atom_idx, slist.atom_idx], axis=0)
    params = {
        k: jnp.concatenate([v, jnp.zeros_like(v) if k == "weight" else v])
        for k, v in slist.params.items()
    }
    return dataclasses.replace(slist, atom_idx=idx, params=params)


def _gather_terms(coords, atom_idx):
    """(K, A, D) gathered term coordinates via the batched row-gather form
    (coords.T[:, idx] runs at ~0.4 ns/element on TPU; the direct
    coords[idx2d] row gather lowers ~20x slower)."""
    k, a = atom_idx.shape
    g = coords.T[:, atom_idx.reshape(-1)]          # (D, K*A)
    return jnp.moveaxis(g.reshape(coords.shape[1], k, a), 0, -1)


def specific_energy(slist: SpecificList, coords, boundary):
    """Total energy of all terms in the list."""
    if slist.n_terms == 0:
        return jnp.zeros((), dtype=coords.dtype)
    slist = _pad_single_term(slist)
    fn = TERM_FUNCS[slist.kind]
    gathered = _gather_terms(coords, slist.atom_idx)  # (K, A, 3)

    def one(c, p):
        w = p["weight"]
        pp = {k: v for k, v in p.items() if k != "weight"}
        return w * fn(c, boundary, pp)

    energies = jax.vmap(one)(gathered, slist.params)
    return jnp.sum(energies)


def _term_grads(slist: SpecificList, coords, boundary):
    """(gathered (K, A, 3), term forces -dE/dx (K, A, 3)) for one list."""
    fn = TERM_FUNCS[slist.kind]
    gathered = _gather_terms(coords, slist.atom_idx)

    def one(c, p):
        w = p["weight"]
        pp = {k: v for k, v in p.items() if k != "weight"}
        return w * fn(c, boundary, pp)

    grads = jax.vmap(jax.grad(one))(gathered, slist.params)
    return gathered, -grads


def all_specific_forces(slists, coords, boundary, needs_virial=False):
    """(forces (N,3), virial (3,3)) of ALL bonded lists with ONE fused
    scatter-add over the concatenated term rows (the reference evaluates
    per-arity loops with atomic adds, src/force.jl:971-1194; on TPU each
    separate scatter pays a full pass over the (N,3) accumulator, so the
    6 per-family scatters of the naive loop cost more than the math)."""
    n = coords.shape[0]
    d = coords.shape[1]
    vir = jnp.zeros((3, 3), dtype=coords.dtype)
    idx_parts, f_parts = [], []
    for slist in slists:
        if slist.n_terms == 0:
            continue
        slist = _pad_single_term(slist)
        gathered, term_forces = _term_grads(slist, coords, boundary)
        idx_parts.append(slist.atom_idx.reshape(-1))
        f_parts.append(term_forces.reshape(-1, d))
        if needs_virial:
            ref = gathered[:, :1, :]
            rel = jax.vmap(jax.vmap(boundary.displacement, in_axes=(0, 0)),
                           in_axes=(0, 0))(
                jnp.broadcast_to(ref, gathered.shape), gathered)
            vir = vir + jnp.einsum("kad,kae->de", rel, term_forces)
    if not idx_parts:
        return jnp.zeros_like(coords), vir
    # one scatter of sum(K_l * arity_l) rows — measured faster on TPU than a
    # per-atom incidence gather-sum and ~400x faster than
    # jax.ops.segment_sum
    flat_idx = jnp.concatenate(idx_parts)
    flat_f = jnp.concatenate(f_parts)
    forces = jnp.zeros((n, d), flat_f.dtype).at[flat_idx].add(flat_f)
    return forces, vir


def specific_forces(slist: SpecificList, coords, boundary, needs_virial=False):
    """(forces (N,3), virial (3,3)) contribution of one list.

    Virial per term: W += sum_a dr_a (x) f_a with dr_a the MIC vector from
    the term's first atom to atom a — the reference-atom scheme of
    src/force.jl:1079-1194.
    """
    return all_specific_forces((slist,), coords, boundary,
                               needs_virial=needs_virial)
