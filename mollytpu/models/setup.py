"""System construction from coordinate files + force fields.

Re-design of the reference's setup path (/root/reference/src/setup.jl:430-1171
and src/residues.jl): PDB read -> residue template matching -> bond creation
(intra-template, peptide links, disulfides, CONECT) -> bonded-topology
enumeration (angles/torsions/impropers/CMAPs from the bond graph, same
semantics as residues.jl:618-724) -> parameter resolution through the
force-field resolvers -> exclusions (1-2/1-3 excluded, 1-4 special) ->
nonbonded method selection (:cutoff reaction field / :pme / :none) ->
device-array System assembly.

All of this is host-side numpy; only the final System holds device arrays.
"""

from __future__ import annotations

import dataclasses
import math
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from .. import boundary as bnd
from ..atoms import make_atoms, AtomData
from ..system import System, Exclusions, molecule_ids_from_bonds
from ..ops import bonded
from ..ops.cutoffs import DistanceCutoff
from ..ops.pairwise import LennardJones, CoulombReactionField, CoulombEwald
from ..ops.general import LJDispersionCorrection
from ..ops.ewald import PME
from ..ops.neighbors import CellListNeighborFinder, DistanceNeighborFinder
from ..ops.virtual_sites import VirtualSites
from .pdb import read_pdb, element_mass

_AA3 = {
    "ALA", "ARG", "ASN", "ASP", "ASH", "CYS", "CYX", "CYM", "GLN", "GLU",
    "GLH", "GLY", "HIS", "HID", "HIE", "HIP", "ILE", "LEU", "LYS", "LYN",
    "MET", "PHE", "PRO", "SER", "THR", "TRP", "TYR", "VAL",
}


def is_water(res_name):
    return res_name in ("HOH", "WAT", "TIP3", "TIP4", "SOL", "T3P", "T4P")


def _build_bonds(struct, templates, atom_map):
    """All bonds as (i, j) global index pairs."""
    bonds = set()
    # intra-residue from templates
    for ri, (res, tmpl) in enumerate(zip(struct.residues, templates)):
        mapping = atom_map[ri]  # template atom idx -> global atom idx
        for (a, b) in tmpl.bonds:
            i, j = mapping[a], mapping[b]
            bonds.add((min(i, j), max(i, j)))
    # peptide / nucleic links between consecutive residues in a chain
    for ri in range(len(struct.residues) - 1):
        r1, r2 = struct.residues[ri], struct.residues[ri + 1]
        if r1.chain != r2.chain:
            continue
        if is_water(r1.name) or is_water(r2.name):
            continue
        for (n1, n2, dmax) in (("C", "N", 0.25), ("O3'", "P", 0.25)):
            if n1 in r1.atom_names and n2 in r2.atom_names:
                i = r1.atom_indices[r1.atom_names.index(n1)]
                j = r2.atom_indices[r2.atom_names.index(n2)]
                d = np.linalg.norm(struct.coords[i] - struct.coords[j])
                if d < dmax:
                    bonds.add((min(i, j), max(i, j)))
    # disulfides (reference: residues.jl:190-349 disulfide detection)
    sg = [i for i, (nm, el) in enumerate(zip(struct.atom_names, struct.elements))
          if nm == "SG" and el.upper() == "S"]
    for a in range(len(sg)):
        for b in range(a + 1, len(sg)):
            i, j = sg[a], sg[b]
            if np.linalg.norm(struct.coords[i] - struct.coords[j]) < 0.25:
                bonds.add((i, j))
    for (i, j) in struct.conect:
        bonds.add((min(i, j), max(i, j)))
    return sorted(bonds)


def _adjacency(n, bonds):
    adj = [[] for _ in range(n)]
    for (i, j) in bonds:
        adj[i].append(j)
        adj[j].append(i)
    for lst in adj:
        lst.sort()
    return adj


def build_angles(adj, bonds):
    """(i, j, k) with j central, i < k (reference: residues.jl:618-641)."""
    angles = set()
    for (b1, b2) in bonds:
        for a in adj[b1]:
            if a != b2:
                angles.add((a, b1, b2) if a < b2 else (b2, b1, a))
        for a in adj[b2]:
            if a != b1:
                angles.add((b1, b2, a) if a > b1 else (a, b2, b1))
    return sorted(angles)


def build_torsions(adj, angles):
    """(i, j, k, l) proper torsions with i < l ordering convention
    (residues.jl:644-668)."""
    tors = set()
    for (a1, a2, a3) in angles:
        for a in adj[a1]:
            if a not in (a1, a2, a3):
                tors.add((a, a1, a2, a3) if a < a3 else (a3, a2, a1, a))
        for a in adj[a3]:
            if a not in (a1, a2, a3):
                tors.add((a1, a2, a3, a) if a > a1 else (a, a3, a2, a1))
    return sorted(tors)


def build_impropers(adj):
    """(center, j, k, l) for every atom with >= 3 neighbors, ascending
    neighbor combinations (residues.jl:713-724)."""
    imps = []
    for c, nb in enumerate(adj):
        if len(nb) > 2:
            m = len(nb)
            for x in range(m):
                for y in range(x + 1, m):
                    for z in range(y + 1, m):
                        imps.append((c, nb[x], nb[y], nb[z]))
    return imps


def build_cmaps(adj, torsions):
    """5-atom CMAP chains from torsions (residues.jl:670-688)."""
    cmaps = set()
    for tor in torsions:
        for a in adj[tor[0]]:
            if a not in tor:
                cmaps.add((a,) + tor)
        for a in adj[tor[3]]:
            if a not in tor:
                cmaps.add(tor + (a,))
    return sorted(cmaps)


def bfs_exclusions(adj, n):
    """(excl_pairs, special_pairs): graph distance 1-2 -> excluded,
    3 -> special 1-4 (shorter path wins, as in OpenMM/the reference)."""
    excl, spec = [], []
    for i in range(n):
        dist = {i: 0}
        frontier = [i]
        for d in (1, 2, 3):
            nxt = []
            for a in frontier:
                for b in adj[a]:
                    if b not in dist:
                        dist[b] = d
                        nxt.append(b)
            frontier = nxt
        for j, d in dist.items():
            if j > i:
                if d <= 2:
                    excl.append((i, j))
                else:
                    spec.append((i, j))
    return excl, spec


def _improper_ordering(ff, rule, perm, c, j, k, l, struct, type_of):
    """OpenMM atom-ordering semantics for improper terms; returns the stored
    atom order (p1, p2, center, p4) with the central atom third
    (reference: setup.jl:856-1007).

    The matched permutation is applied first so the peripherals sit in the
    rule's pattern positions; ordering-specific tie-break swaps follow. Amber
    tie-breaks compare (residue index, position within residue)."""
    ordering = getattr(rule, "ordering", "default")
    res_of = struct.res_index_of_atom
    elements = struct.elements

    # put peripherals in rule-pattern positions (setup.jl:876-883)
    src = (c, j, k, l)
    j = src[perm[1] - 1]
    k = src[perm[2] - 1]
    l = src[perm[3] - 1]

    def pos_in_res(a):
        res = struct.residues[res_of[a]]
        return res.atom_indices.index(a)

    if ordering == "amber":
        t2, t3, t4 = type_of[j], type_of[k], type_of[l]
        r2, r3, r4 = res_of[j], res_of[k], res_of[l]
        n2, n3, n4 = pos_in_res(j), pos_in_res(k), pos_in_res(l)
        if not rule.has_wild:
            if t2 == t4 and (r2 > r4 or (r2 == r4 and n2 > n4)):
                j, l = l, j
                r2, r4, n2, n4 = r4, r2, n4, n2
            if t3 == t4 and (r3 > r4 or (r3 == r4 and n3 > n4)):
                k, l = l, k
                r3, r4, n3, n4 = r4, r3, n4, n3
            if t2 == t3 and (r2 > r3 or (r2 == r3 and n2 > n3)):
                j, k = k, j
        else:
            e2, e3, e4 = elements[j], elements[k], elements[l]
            if e2 == e4 and (r2 > r4 or (r2 == r4 and n2 > n4)):
                j, l = l, j
                r2, r4, n2, n4 = r4, r2, n4, n2
                e2, e4 = e4, e2
            if e3 == e4 and (r3 > r4 or (r3 == r4 and n3 > n4)):
                k, l = l, k
                r3, r4, n3, n4 = r4, r3, n4, n3
                e3, e4 = e4, e3
            if r2 > r3 or (r2 == r3 and n2 > n3):
                j, k = k, j
        return (j, k, c, l)
    if ordering == "charmm":
        if rule.has_wild:
            e2, e3, e4 = elements[j], elements[k], elements[l]
            r2, r3, r4 = res_of[j], res_of[k], res_of[l]
            n2, n3, n4 = pos_in_res(j), pos_in_res(k), pos_in_res(l)
            if e2 == e4 and (r2 > r4 or (r2 == r4 and n2 > n4)):
                j, l = l, j
                r2, r4, n2, n4 = r4, r2, n4, n2
                e2, e4 = e4, e2
            if e3 == e4 and (r3 > r4 or (r3 == r4 and n3 > n4)):
                k, l = l, k
        return (j, k, c, l)
    # "default": element/carbon/mass tie-break on the first two peripherals
    # when the match used a wildcard (OpenMM's amber-consistency workaround)
    if rule.has_wild:
        a1, a2, a4 = j, k, l
        e1, e2 = elements[a1], elements[a2]
        m1 = ff.atom_types[type_of[a1]].mass
        m2 = ff.atom_types[type_of[a2]].mass
        if e1 == e2:
            if a1 > a2:
                a1, a2 = a2, a1
        elif e1 != "C" and (e2 == "C" or m1 < m2):
            a1, a2 = a2, a1
        return (a1, a2, c, a4)
    return (j, k, c, l)


BUILD_CACHE_VERSION = 6   # bumped: padding-item sentinel clusters + max_occ sizing


def _models_code_fingerprint():
    """Hash of the models/ AND ops/ sources: a cached build is invalidated
    whenever the setup pipeline's code changes — ops/ matters too because
    the pickles embed finder/neighbor dataclasses (BlockPairFinder et al.)
    whose field sets evolve (stale pickles of evolving dataclasses are
    caught by the load-time try/except anyway; this avoids even trying)."""
    import hashlib
    import os as _os
    # pallas_pairwise.py / autotune.py never contribute pickled structures
    # (the kernel reads BlockPairs, it doesn't shape them) — excluding them
    # keeps kernel-math iterations from invalidating ~15-min builds
    skip = {"pallas_pairwise.py", "autotune.py"}
    h = hashlib.sha256()
    base = _os.path.dirname(__file__)
    for d in (base, _os.path.join(_os.path.dirname(base), "ops")):
        for f in sorted(_os.listdir(d)):
            if f.endswith(".py") and f not in skip:
                with open(_os.path.join(d, f), "rb") as fh:
                    h.update(fh.read())
    return h.hexdigest()


def _build_cache_path(path, ff, kwargs):
    import hashlib
    import os as _os
    cache_dir = _os.environ.get(
        "MOLLYTPU_BUILD_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache", "mollytpu"))
    if not cache_dir or cache_dir in ("0", "off", "none"):
        return None
    h = hashlib.sha256()
    h.update(b"sysbuild-v%d;" % BUILD_CACHE_VERSION)
    with open(path, "rb") as fh:
        h.update(fh.read())
    h.update(getattr(ff, "fingerprint", "").encode())
    h.update(repr(sorted((k, str(v)) for k, v in kwargs.items())).encode())
    h.update(_models_code_fingerprint().encode())
    return _os.path.join(cache_dir, h.hexdigest()[:32] + ".sysb")


def system_from_pdb(path, ff, nonbonded_method="cutoff", dist_cutoff=1.0,
                    dist_neighbors=1.2, neighbor_n_steps=10,
                    approximate_pme=True, pme_error_tol=0.0005,
                    solvent_dielectric=78.3, dtype=jnp.float32,
                    velocities=None, constraints="none", rigid_water=False,
                    constraint_algorithm="shake",
                    hydrogen_mass=None, center_coords=False,
                    neighbor_finder="cell", dispersion_correction=True,
                    implicit_solvent=None, implicit_solvent_kwargs=None,
                    build_cache=True):
    """Build a System from a PDB file and a ForceField.

    nonbonded_method: "cutoff" (LJ truncation + reaction field), "pme"
    (LJ truncation + CoulombEwald real space + PME reciprocal), or "none"
    (plain LJ + Coulomb, no cutoff — vacuum). Reference parity:
    System(coord_file, ff; nonbonded_method), setup.jl:430-533.

    Builds are cached on disk (MOLLYTPU_BUILD_CACHE dir, default
    ~/.cache/mollytpu; set to "off" or build_cache=False to disable), keyed
    by the PDB bytes, force-field content, options, and the models/ code.
    """
    import pickle
    import os as _os
    cache_path = None
    if build_cache and velocities is None:
        kwargs = dict(
            nonbonded_method=nonbonded_method, dist_cutoff=dist_cutoff,
            dist_neighbors=dist_neighbors, neighbor_n_steps=neighbor_n_steps,
            approximate_pme=approximate_pme, pme_error_tol=pme_error_tol,
            solvent_dielectric=solvent_dielectric, dtype=jnp.dtype(dtype).name,
            constraints=constraints, rigid_water=rigid_water,
            constraint_algorithm=constraint_algorithm,
            hydrogen_mass=hydrogen_mass, center_coords=center_coords,
            neighbor_finder=neighbor_finder,
            dispersion_correction=dispersion_correction,
            implicit_solvent=implicit_solvent,
            implicit_solvent_kwargs=implicit_solvent_kwargs)
        try:
            cache_path = _build_cache_path(path, ff, kwargs)
        except Exception:
            cache_path = None
        if cache_path and _os.path.exists(cache_path):
            try:
                with open(cache_path, "rb") as fh:
                    sys = pickle.load(fh)
                out = jax.tree_util.tree_map(jnp.asarray, sys)
                # atom_data is a host-side sidecar outside the pytree;
                # tree_map rebuilds the dataclass without it
                object.__setattr__(out, "atom_data",
                                   getattr(sys, "atom_data", None))
                return out
            except Exception:
                pass  # stale/corrupt cache: rebuild
    sys = _system_from_pdb_impl(
        path, ff, nonbonded_method=nonbonded_method, dist_cutoff=dist_cutoff,
        dist_neighbors=dist_neighbors, neighbor_n_steps=neighbor_n_steps,
        approximate_pme=approximate_pme, pme_error_tol=pme_error_tol,
        solvent_dielectric=solvent_dielectric, dtype=dtype,
        velocities=velocities, constraints=constraints,
        rigid_water=rigid_water, constraint_algorithm=constraint_algorithm,
        hydrogen_mass=hydrogen_mass, center_coords=center_coords,
        neighbor_finder=neighbor_finder,
        dispersion_correction=dispersion_correction,
        implicit_solvent=implicit_solvent,
        implicit_solvent_kwargs=implicit_solvent_kwargs)
    if cache_path:
        try:
            _os.makedirs(_os.path.dirname(cache_path), exist_ok=True)
            tmp = cache_path + ".tmp%d" % _os.getpid()
            sys_host = jax.device_get(sys)
            object.__setattr__(sys_host, "atom_data",
                               getattr(sys, "atom_data", None))
            with open(tmp, "wb") as fh:
                pickle.dump(sys_host, fh)
            _os.replace(tmp, cache_path)
        except Exception:
            pass
    return sys


def _system_from_pdb_impl(path, ff, nonbonded_method="cutoff", dist_cutoff=1.0,
                    dist_neighbors=1.2, neighbor_n_steps=10,
                    approximate_pme=True, pme_error_tol=0.0005,
                    solvent_dielectric=78.3, dtype=jnp.float32,
                    velocities=None, constraints="none", rigid_water=False,
                    constraint_algorithm="shake",
                    hydrogen_mass=None, center_coords=False,
                    neighbor_finder="cell", dispersion_correction=True,
                    implicit_solvent=None, implicit_solvent_kwargs=None):
    struct = read_pdb(path)
    n = struct.n_atoms

    # geometric bond detection feeds the residue graphs used for template
    # matching (the reference instead matches OpenMM's residues.xml bond
    # templates by name; geometry-based detection handles nonstandard naming)
    from .forcefield import detect_bonds, find_template_by_graph
    geo_bonds = sorted(set(detect_bonds(struct.coords, struct.elements))
                       | set(struct.conect))
    res_of = struct.res_index_of_atom
    internal = [[] for _ in struct.residues]
    external_count = np.zeros(n, dtype=np.int64)
    for (a, b) in geo_bonds:
        if res_of[a] == res_of[b]:
            ri = res_of[a]
            base = {g: loc for loc, g in enumerate(struct.residues[ri].atom_indices)}
            internal[ri].append((base[a], base[b]))
        else:
            external_count[a] += 1
            external_count[b] += 1

    # template matching + per-atom assignment: exact atom-name set first,
    # graph isomorphism as fallback (reference: residues.jl:383-603)
    templates, atom_map = [], []
    type_of = [None] * n
    charge_of = np.zeros(n)
    for ri, res in enumerate(struct.residues):
        mapping = None
        ext_counts = {nm: int(external_count[g])
                      for nm, g in zip(res.atom_names, res.atom_indices)}
        try:
            tmpl = ff.find_template(res.name, res.atom_names, ext_counts)
            name_to_global = dict(zip(res.atom_names, res.atom_indices))
            mapping = {ti: name_to_global[ta.name]
                       for ti, ta in enumerate(tmpl.atoms)}
        except KeyError:
            elems = [struct.elements[g] for g in res.atom_indices]
            ext = [external_count[g] for g in res.atom_indices]
            tmpl, local_map = find_template_by_graph(
                ff, res.name, elems, internal[ri], ext)
            mapping = {ti: res.atom_indices[local_map[ti]]
                       for ti in range(len(tmpl.atoms))}
        templates.append(tmpl)
        atom_map.append(mapping)
        for ti, ta in enumerate(tmpl.atoms):
            g = mapping[ti]
            type_of[g] = ta.type
            sig, eps, q_nb = ff.nonbonded_params(ta.type)
            charge_of[g] = ta.charge if ta.charge is not None else (q_nb or 0.0)

    sigma = np.zeros(n)
    epsilon = np.zeros(n)
    mass = np.zeros(n)
    for g in range(n):
        t = type_of[g]
        if t is None:
            raise ValueError(f"atom {g} ({struct.atom_names[g]}) has no type")
        sig, eps, _ = ff.nonbonded_params(t)
        sigma[g] = sig
        epsilon[g] = eps
        mass[g] = ff.atom_types[t].mass

    # virtual sites from templates
    vsite_specs = []
    for ri, tmpl in enumerate(templates):
        mapping = atom_map[ri]
        for vs in tmpl.virtual_sites:
            parents = tuple(mapping[p] for p in vs.atoms)
            vsite_specs.append((mapping[vs.index], vs.site_type, parents, vs.weights))
    for (sidx, _, _, _) in vsite_specs:
        mass[sidx] = 0.0

    bonds = _build_bonds(struct, templates, atom_map)
    adj = _adjacency(n, bonds)
    excl_pairs, spec_pairs = bfs_exclusions(adj, n)
    # virtual sites inherit their parent's exclusions (OpenMM semantics):
    # approximated by excluding site-parent pairs and treating the site as
    # bonded to its first parent in the graph used above only if template
    # listed a bond. TIP4P templates list no bond to M; add exclusions
    # manually between each site and everything its first parent excludes.
    if vsite_specs:
        excl_set = set(excl_pairs)
        spec_set = set(spec_pairs)
        partner_excl = {}
        for (a, b) in excl_pairs:
            partner_excl.setdefault(a, set()).add(b)
            partner_excl.setdefault(b, set()).add(a)
        partner_spec = {}
        for (a, b) in spec_pairs:
            partner_spec.setdefault(a, set()).add(b)
            partner_spec.setdefault(b, set()).add(a)
        for (sidx, _, parents, _) in vsite_specs:
            p0 = parents[0]
            for q in partner_excl.get(p0, set()) | {p0} | set(parents):
                if q != sidx:
                    excl_set.add((min(sidx, q), max(sidx, q)))
            for q in partner_spec.get(p0, set()):
                if q != sidx:
                    spec_set.add((min(sidx, q), max(sidx, q)))
        excl_pairs = sorted(excl_set)
        spec_pairs = sorted(s for s in spec_set if s not in excl_set)

    # bonded parameter resolution
    top_angles = build_angles(adj, bonds)
    top_torsions = build_torsions(adj, top_angles)
    top_impropers = build_impropers(adj)

    b_i, b_j, b_k, b_r0 = [], [], [], []
    constrained_bond_pairs = []
    for (i, j) in bonds:
        rule = ff.resolve_bond(type_of[i], type_of[j])
        if rule is None:
            continue
        b_i.append(i)
        b_j.append(j)
        b_k.append(rule.k)
        b_r0.append(rule.length)
    a_i, a_j, a_k, a_t0, a_kk = [], [], [], [], []
    ub_rows = []
    for (i, j, k) in top_angles:
        rule = ff.resolve_angle(type_of[i], type_of[j], type_of[k])
        if rule is None:
            continue
        a_i.append(i)
        a_j.append(j)
        a_k.append(k)
        a_t0.append(rule.theta0)
        a_kk.append(rule.k)
        if rule.ub_k != 0.0:
            ub_rows.append((i, j, k, rule.k, rule.theta0, rule.ub_k, rule.ub_d))
    pt_rows = []   # proper periodic torsions (i,j,k,l,per,phase,k)
    rb_rows = []   # (i,j,k,l,coeffs)
    for (i, j, k, l) in top_torsions:
        rule = ff.resolve_proper(type_of[i], type_of[j], type_of[k], type_of[l])
        if rule is None:
            continue
        if hasattr(rule, "terms"):
            for (per, phase, kk) in rule.terms:
                if kk != 0.0:
                    pt_rows.append((i, j, k, l, per, phase, kk))
        else:
            rb_rows.append((i, j, k, l, rule.coeffs))
    imp_rows = []
    imp_rb_rows = []
    for (c, j, k, l) in top_impropers:
        rule, perm = ff.resolve_improper(type_of[c], type_of[j], type_of[k],
                                         type_of[l])
        if rule is None:
            continue
        (p1, p2, cen, p4) = _improper_ordering(ff, rule, perm, c, j, k, l,
                                               struct, type_of)
        if hasattr(rule, "terms"):
            for (per, phase, kk) in rule.terms:
                if kk != 0.0:
                    imp_rows.append((p1, p2, cen, p4, per, phase, kk))
        else:
            imp_rb_rows.append((p1, p2, cen, p4, rule.coeffs))

    specific_lists = []
    if b_i:
        specific_lists.append(bonded.harmonic_bonds(
            b_i, b_j, k=jnp.asarray(b_k, dtype), r0=jnp.asarray(b_r0, dtype)))
    if a_i:
        specific_lists.append(bonded.harmonic_angles(
            a_i, a_j, a_k, k=jnp.asarray(a_kk, dtype),
            theta0=jnp.asarray(a_t0, dtype)))
    if pt_rows:
        arr = np.array([r[:4] for r in pt_rows], dtype=np.int64)
        specific_lists.append(bonded.periodic_torsions(
            arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3],
            periodicity=jnp.asarray([r[4] for r in pt_rows], dtype),
            phase=jnp.asarray([r[5] for r in pt_rows], dtype),
            k=jnp.asarray([r[6] for r in pt_rows], dtype)))
    if imp_rows:
        arr = np.array([r[:4] for r in imp_rows], dtype=np.int64)
        specific_lists.append(bonded.periodic_torsions(
            arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3],
            periodicity=jnp.asarray([r[4] for r in imp_rows], dtype),
            phase=jnp.asarray([r[5] for r in imp_rows], dtype),
            k=jnp.asarray([r[6] for r in imp_rows], dtype)))
    if ub_rows:
        specific_lists.append(bonded.urey_bradleys(
            [r[0] for r in ub_rows], [r[1] for r in ub_rows],
            [r[2] for r in ub_rows],
            kangle=jnp.zeros(len(ub_rows), dtype),  # angle part already added
            theta0=jnp.asarray([r[4] for r in ub_rows], dtype),
            kbond=jnp.asarray([r[5] for r in ub_rows], dtype),
            r0=jnp.asarray([r[6] for r in ub_rows], dtype)))
    if rb_rows:
        arr = np.array([r[:4] for r in rb_rows], dtype=np.int64)
        specific_lists.append(bonded.rb_torsions(
            arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3],
            coeffs=jnp.asarray(np.array([r[4] for r in rb_rows]), dtype)))
    if imp_rb_rows:
        arr = np.array([r[:4] for r in imp_rb_rows], dtype=np.int64)
        specific_lists.append(bonded.rb_torsions(
            arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3],
            coeffs=jnp.asarray(np.array([r[4] for r in imp_rb_rows]), dtype)))

    # CMAP terms (5-atom phi/psi correction maps)
    if ff.cmap_rules:
        cmap_rows = []
        for (a, b_, c_, d_, e_) in build_cmaps(adj, top_torsions):
            rule = ff.resolve_cmap(type_of[a], type_of[b_], type_of[c_],
                                   type_of[d_], type_of[e_])
            if rule is not None:
                cmap_rows.append((a, b_, c_, d_, e_, rule.map_index))
        if cmap_rows:
            from ..ops.cmap import cmap_coefficients, make_cmap_list
            sizes = {int(math.isqrt(len(m))) for m in ff.cmap_maps}
            n_grid = max(sizes)
            coeff_table = np.stack([
                cmap_coefficients(np.asarray(m).reshape(n_grid, n_grid))
                for m in ff.cmap_maps])
            arr = np.array(cmap_rows, dtype=np.int64)
            specific_lists.append(make_cmap_list(
                arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], arr[:, 4],
                arr[:, 5], jnp.asarray(coeff_table, dtype), n_grid))

    # hydrogen mass repartitioning (setup.jl:1634)
    if hydrogen_mass is not None:
        hm = float(hydrogen_mass)
        if not (0.9 <= hm <= 5.0):
            raise ValueError("hydrogen_mass must be between ~1 and 5 u")
        for (i, j) in bonds:
            hi, hj = struct.elements[i].upper() == "H", struct.elements[j].upper() == "H"
            if hi and not hj:
                mass[j] -= hm - mass[i]
                mass[i] = hm
            elif hj and not hi:
                mass[i] -= hm - mass[j]
                mass[j] = hm

    # boundary + coords
    if struct.box is None:
        boundary = bnd.rectangular([np.inf, np.inf, np.inf], dtype=dtype)
    elif struct.box.ndim == 1:
        boundary = bnd.rectangular(struct.box, dtype=dtype)
    else:
        boundary = bnd.Triclinic(jnp.asarray(struct.box, dtype=dtype))
    coords = jnp.asarray(struct.coords, dtype=dtype)
    if center_coords and struct.box is not None:
        shift = boundary.center() - jnp.mean(coords, axis=0)
        coords = boundary.wrap(coords + shift)

    # atom type ids (for NBFix lookups)
    uniq_types = sorted({t for t in type_of})
    type_id = {t: i for i, t in enumerate(uniq_types)}
    atoms = make_atoms(
        n=n, mass=jnp.asarray(mass, dtype), charge=jnp.asarray(charge_of, dtype),
        sigma=jnp.asarray(sigma, dtype), epsilon=jnp.asarray(epsilon, dtype),
        atom_type=jnp.asarray([type_id[t] for t in type_of], jnp.int32),
        dtype=dtype)

    # NBFix pair overrides (LennardJonesForce NBFixPair entries) as static
    # mixing exceptions keyed by atom-type id
    sig_mixing, eps_mixing = None, None
    if ff.nbfix:
        from ..ops.mixing import (MixingException, ExceptionTable,
                                  LorentzMixing, GeometricMixing)
        ki, kj, sv, ev = [], [], [], []
        for (c1, c2, s_nb, e_nb) in ff.nbfix:
            t1s = [t for t in uniq_types
                   if t == c1 or ff.type_to_class.get(t) == c1]
            t2s = [t for t in uniq_types
                   if t == c2 or ff.type_to_class.get(t) == c2]
            for t1 in t1s:
                for t2 in t2s:
                    ki.append(type_id[t1])
                    kj.append(type_id[t2])
                    sv.append(float(s_nb))
                    ev.append(float(e_nb))
        if ki:
            sig_mixing = MixingException(LorentzMixing(), ExceptionTable(
                tuple(ki), tuple(kj), tuple(sv)))
            eps_mixing = MixingException(GeometricMixing(), ExceptionTable(
                tuple(ki), tuple(kj), tuple(ev)))

    # nonbonded interactions
    rc = float(dist_cutoff)
    general = []
    if nonbonded_method == "cutoff":
        pairwise = (
            _make_lj(rc, ff.lj14scale, sig_mixing, eps_mixing),
            CoulombReactionField(dist_cutoff=rc,
                                 solvent_dielectric=solvent_dielectric,
                                 use_neighbors=True,
                                 weight_special=ff.coulomb14scale),
        )
    elif nonbonded_method == "pme":
        pairwise = (
            _make_lj(rc, ff.lj14scale, sig_mixing, eps_mixing),
            CoulombEwald(dist_cutoff=rc, error_tol=pme_error_tol,
                         use_neighbors=True, weight_special=ff.coulomb14scale,
                         approximate_erfc=approximate_pme),
        )
        general.append(PME.setup(
            boundary, dist_cutoff=rc, error_tol=pme_error_tol,
            dtype=dtype,
            # parity mode (exact erfc) also uses the reference's exact mesh
            # dims so golden forces match at 1e-7; the fast path rounds up
            # to FFT-smooth sizes
            smooth_dims=approximate_pme))
        # reciprocal-sum exclusion corrections: windowed dense general
        # interaction (no scatter, no pair gather — see
        # EwaldExclusionCorrection; the reference's EwaldExclusion 2-atom
        # bonded form, ewald.jl:978-1008, costs 0.55 ms/step of scatter
        # rows in the fused bonded engine at 6mrr scale vs ~0.1 ms windowed)
        all_excl = excl_pairs + spec_pairs
        if all_excl:
            from ..ops.ewald import (EwaldExclusionCorrection,
                                     ewald_error_alpha)
            general.append(EwaldExclusionCorrection.setup(
                n, all_excl, ewald_error_alpha(rc, pme_error_tol)))
    elif nonbonded_method == "none":
        from ..ops.cutoffs import NoCutoff
        from ..ops.pairwise import Coulomb
        pairwise = (
            LennardJones(weight_special=ff.lj14scale),
            Coulomb(weight_special=ff.coulomb14scale),
        )
    else:
        raise ValueError(f"unknown nonbonded_method {nonbonded_method}")
    if dispersion_correction and nonbonded_method in ("cutoff", "pme"):
        general.append(make_dispersion_correction(sigma, epsilon, rc, dtype))

    if implicit_solvent is not None:
        from ..ops.gbsa import make_implicit_solvent
        general.append(make_implicit_solvent(
            implicit_solvent, struct, bonds, np.asarray(charge_of),
            type_of=type_of, dtype=dtype, **(implicit_solvent_kwargs or {})))

    # neighbor finder
    nf = None
    if nonbonded_method in ("cutoff", "pme"):
        if neighbor_finder == "cell" and struct.box is not None:
            nf = CellListNeighborFinder.setup(boundary, float(dist_neighbors), n,
                                              n_steps=neighbor_n_steps,
                                              coords=coords)
        elif neighbor_finder is not None:
            nf = DistanceNeighborFinder(dist_cutoff=float(dist_neighbors),
                                        n_steps=neighbor_n_steps)

    exclusions = Exclusions.build(
        n, excl_pairs, spec_pairs,
        max_excl=_next8(_max_partners(excl_pairs, n)),
        max_special=_next8(_max_partners(spec_pairs, n)))

    mol_ids, n_mol = molecule_ids_from_bonds(n, bonds)

    vsites = None
    if vsite_specs:
        vsites = VirtualSites.build(vsite_specs, dtype=dtype)

    sys = System(
        atoms=atoms, coords=coords, boundary=boundary,
        velocities=velocities,
        pairwise_inters=pairwise, specific_lists=tuple(specific_lists),
        general_inters=tuple(general), exclusions=exclusions,
        neighbor_finder=nf, molecule_ids=mol_ids, n_molecules=n_mol,
        virtual_sites=vsites)
    if vsites is not None and vsites.n_sites:
        # file coordinates of massless sites are approximate; place them
        # exactly from their parents (reference: place_virtual_sites! during
        # setup, src/virtual.jl:187)
        sys = sys.update(coords=vsites.place(sys.coords, sys.boundary))

    if constraints != "none" or rigid_water:
        from ..ops.constraints import setup_constraints
        sys = setup_constraints(sys, struct, bonds, b_i, b_j, b_r0,
                                a_i, a_j, a_k, a_t0, constraints, rigid_water,
                                dtype=dtype, algorithm=constraint_algorithm)

    object.__setattr__(sys, "atom_data", AtomData(
        atom_name=np.asarray(struct.atom_names),
        residue_name=np.asarray([struct.residues[r].name
                                 for r in struct.res_index_of_atom]),
        residue_number=np.asarray([struct.residues[r].number
                                   for r in struct.res_index_of_atom]),
        chain_id=np.asarray([struct.residues[r].chain
                             for r in struct.res_index_of_atom]),
        element=np.asarray(struct.elements),
        hetero_atom=np.asarray([struct.residues[r].hetero
                                for r in struct.res_index_of_atom])))
    return sys


def _make_lj(rc, lj14scale, sig_mixing, eps_mixing):
    kw = {}
    if sig_mixing is not None:
        kw["sigma_mixing"] = sig_mixing
    if eps_mixing is not None:
        kw["epsilon_mixing"] = eps_mixing
    return LennardJones(cutoff=DistanceCutoff(rc), use_neighbors=True,
                        weight_special=lj14scale, **kw)


def _max_partners(pairs, n):
    cnt = np.zeros(n, dtype=np.int64)
    for (a, b) in pairs:
        cnt[a] += 1
        cnt[b] += 1
    return int(cnt.max()) if len(pairs) else 1


def _next8(x):
    return max(8, int(math.ceil(x / 8.0)) * 8)


def make_dispersion_correction(sigma, epsilon, rc, dtype):
    """Average eps*sigma^6 / eps*sigma^12 over unordered pairs including the
    diagonal, Lorentz-Berthelot mixing, matching the reference
    (lennard_jones.jl:168-227). O(N) via binomial moment sums."""
    sig = np.asarray(sigma, dtype=np.float64)
    se = np.sqrt(np.maximum(np.asarray(epsilon, dtype=np.float64), 0.0))
    n = sig.shape[0]

    def pair_mean(power):
        # sum over ordered pairs of sqrt(ei ej) ((si+sj)/2)^power
        from math import comb
        total = 0.0
        moms = [np.sum(se * sig ** k) for k in range(power + 1)]
        for k in range(power + 1):
            total += comb(power, k) * moms[k] * moms[power - k]
        total /= 2.0 ** power
        diag = np.sum(se * se * sig ** power)
        n_pairs = n * (n + 1) / 2.0
        return (total + diag) / 2.0 / n_pairs

    es6 = pair_mean(6)
    es12 = pair_mean(12)
    f6 = 8.0 * math.pi * n * n * (-es6 / (3.0 * rc ** 3))
    f12 = 8.0 * math.pi * n * n * (es12 / (9.0 * rc ** 9))
    return LJDispersionCorrection(factor_6=float(f6), factor_12=float(f12),
                                  dist_cutoff=float(rc))


def add_position_restraints(sys, k, atom_selector=None, dtype=jnp.float32):
    """Harmonically restrain selected atoms to their current positions
    (reference: add_position_restraints, setup.jl:2070-2111).

    k: force constant (kJ/mol/nm^2), scalar or (N,). atom_selector: bool
    mask / index array / predicate on atom index; None = all atoms.
    """
    import numpy as np
    from ..ops.bonded import position_restraints

    n = sys.n_atoms
    if atom_selector is None:
        idx = np.arange(n)
    elif callable(atom_selector):
        idx = np.asarray([i for i in range(n) if atom_selector(i)])
    else:
        sel = np.asarray(atom_selector)
        idx = np.nonzero(sel)[0] if sel.dtype == bool else sel
    if idx.size == 0:
        return sys
    k_arr = np.broadcast_to(np.asarray(jax.device_get(k), dtype=np.float64),
                            (n,))[idx]
    x0 = jnp.asarray(np.asarray(jax.device_get(sys.coords))[idx], dtype)
    slist = position_restraints(jnp.asarray(idx, jnp.int32),
                                jnp.asarray(k_arr, dtype), x0)
    return dataclasses.replace(
        sys, specific_lists=sys.specific_lists + (slist,))


def crystal_system(lattice_constant, element_mass, n_cells, lattice="fcc",
                   sigma=0.34, epsilon=0.994, charge=0.0, dtype=jnp.float32,
                   pairwise_inters=None, **system_kwargs):
    """Build a System from a replicated crystal unit cell (reference:
    crystal constructor System(crystal; ...), src/types.jl:1044-1098 via
    SimpleCrystals.jl). Supported lattices: 'sc', 'bcc', 'fcc'.

    Returns a System with atoms on the perfect lattice; lattice_constant in
    nm, n_cells an int or (nx, ny, nz).
    """
    import numpy as np
    from .. import make_atoms
    from ..boundary import rectangular
    from ..system import System

    basis = {
        "sc": [(0.0, 0.0, 0.0)],
        "bcc": [(0.0, 0.0, 0.0), (0.5, 0.5, 0.5)],
        "fcc": [(0.0, 0.0, 0.0), (0.5, 0.5, 0.0), (0.5, 0.0, 0.5),
                (0.0, 0.5, 0.5)],
    }[lattice]
    if isinstance(n_cells, int):
        n_cells = (n_cells, n_cells, n_cells)
    a = float(lattice_constant)
    pts = []
    for ix in range(n_cells[0]):
        for iy in range(n_cells[1]):
            for iz in range(n_cells[2]):
                for (bx, by, bz) in basis:
                    pts.append(((ix + bx) * a, (iy + by) * a, (iz + bz) * a))
    coords = jnp.asarray(np.asarray(pts), dtype)
    n = coords.shape[0]
    boundary = rectangular((n_cells[0] * a, n_cells[1] * a, n_cells[2] * a),
                           dtype=dtype)
    atoms = make_atoms(n=n, mass=element_mass, sigma=sigma, epsilon=epsilon,
                       charge=charge, dtype=dtype)
    if pairwise_inters is None:
        from ..ops.pairwise import LennardJones
        from ..ops.cutoffs import ShiftedForceCutoff
        pairwise_inters = (LennardJones(cutoff=ShiftedForceCutoff(
            min(1.0, min(boundary.side_lengths_np()) / 2.001
                if hasattr(boundary, "side_lengths_np") else 1.0))),)
    return System(atoms=atoms, coords=coords, boundary=boundary,
                  pairwise_inters=pairwise_inters, **system_kwargs)
