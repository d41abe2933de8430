"""Velocity sampling, kinetic/thermo tensors, CM motion, barostat scaling.

Parity with /root/reference/src/spatial.jl (Maxwell-Boltzmann `random_velocities!`
:707-831, `remove_CM_motion!` :896-929, pressure machinery :931-1046,
`scale_coords!` :1172-1287) and src/energy.jl kinetic tensors (:44-70), built on
jax.random counter-based PRNG instead of Molly's explicit Philox loops — the
functional analogue the reference's replayable-noise design points at.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .units import KB


def random_velocity(key, mass, temp, n_dims=3, dtype=jnp.float32):
    """One Maxwell-Boltzmann velocity sample (nm/ps)."""
    sigma = jnp.sqrt(KB * temp / mass)
    return (sigma * jax.random.normal(key, (n_dims,), dtype=dtype)).astype(dtype)


def random_velocities(key, masses, temp, n_dims=3, dtype=jnp.float32):
    """Maxwell-Boltzmann velocities for every atom; zero-mass (virtual) sites
    get zero velocity, matching Molly's handling of massless sites."""
    masses = jnp.asarray(masses, dtype=dtype)
    n = masses.shape[0]
    safe_m = jnp.where(masses > 0, masses, 1.0)
    sigma = jnp.sqrt(KB * jnp.asarray(temp, dtype=dtype) / safe_m)
    noise = jax.random.normal(key, (n, n_dims), dtype=dtype)
    vels = sigma[:, None] * noise
    return jnp.where((masses > 0)[:, None], vels, 0.0)


def kinetic_energy(masses, velocities):
    return 0.5 * jnp.sum(masses[:, None] * velocities * velocities)


def kinetic_energy_tensor(masses, velocities):
    """Per-axis-pair kinetic tensor sum_i m_i v_i v_i^T / 2
    (Molly: kinetic_energy_tensor, src/energy.jl:44-70)."""
    mv = masses[:, None] * velocities
    return 0.5 * (mv.T @ velocities)


def temperature(masses, velocities, n_dof):
    """Instantaneous temperature from equipartition: 2K / (n_dof kB)."""
    ke = kinetic_energy(masses, velocities)
    return 2.0 * ke / (n_dof * KB)


def n_dof(n_atoms, n_constraints=0, n_dims=3, remove_cm=True, n_frozen=0):
    """Degrees of freedom accounting (Molly: src/types.jl DoF logic +
    constraints n_dof_lost)."""
    dof = n_dims * (n_atoms - n_frozen) - n_constraints
    if remove_cm:
        dof -= n_dims
    return dof


def remove_cm_motion(masses, velocities):
    """Subtract the mass-weighted mean velocity (Molly: remove_CM_motion!,
    src/spatial.jl:896-929). Zero-mass sites are excluded and stay zero."""
    total_m = jnp.sum(masses)
    cm_v = jnp.sum(masses[:, None] * velocities, axis=0) / total_m
    out = velocities - cm_v[None, :]
    return jnp.where((masses > 0)[:, None], out, 0.0)


def pressure_tensor(kinetic_tensor, virial_tensor, volume):
    """P = (2K + W) / V, tensor form (Molly: pressure_from_tensors!,
    src/spatial.jl:961-984). virial_tensor is sum dr (x) f."""
    return (2.0 * kinetic_tensor + virial_tensor) / volume


def scalar_pressure(kinetic_tensor, virial_tensor, volume, n_dims=3):
    p = pressure_tensor(kinetic_tensor, virial_tensor, volume)
    return jnp.trace(p) / n_dims


def scale_coords(boundary, coords, mu, velocities=None):
    """Barostat box scaling: apply matrix/scalar mu to box and coordinates,
    optionally inverse-scaling velocities (Molly: scale_coords!,
    src/spatial.jl:1172-1287; per-atom variant — molecule-COM scaling lives in
    sim/coupling.py where topology is available)."""
    mu = jnp.asarray(mu)
    new_boundary = boundary.scale(mu)
    if mu.ndim == 0:
        new_coords = coords * mu
        new_vels = None if velocities is None else velocities / mu
    elif mu.ndim == 1:
        new_coords = coords * mu[None, :]
        new_vels = None if velocities is None else velocities / mu[None, :]
    else:
        new_coords = coords @ mu.T
        new_vels = None if velocities is None else velocities @ jnp.linalg.inv(mu).T
    if velocities is None:
        return new_boundary, new_coords
    return new_boundary, new_coords, new_vels


def molecule_centers(coords, masses, molecule_ids, n_molecules, boundary=None):
    """Mass-weighted molecule centers via segment-sum (Molly: molecule_centers,
    src/spatial.jl:1049-1166). Assumes coordinates are unwrapped per molecule
    (or molecules smaller than half the box)."""
    w = masses
    wsum = jnp.zeros((n_molecules,), w.dtype).at[molecule_ids].add(w)
    cw = jnp.zeros((n_molecules, coords.shape[1]), coords.dtype).at[
        molecule_ids].add(w[:, None] * coords)
    return cw / jnp.maximum(wsum, 1e-30)[:, None]


def scale_coords_molecular(boundary, coords, mu, masses, molecule_ids, n_molecules):
    """Rigid-molecule barostat scaling: scale molecule COMs, translate atoms
    with their molecule (Molly: scale_coords! with ignore_molecules=false,
    src/spatial.jl:1202-1287)."""
    mu = jnp.asarray(mu)
    centers = molecule_centers(coords, masses, molecule_ids, n_molecules, boundary)
    if mu.ndim == 2:
        new_centers = centers @ mu.T
    else:
        new_centers = centers * mu
    shift = (new_centers - centers)[molecule_ids]
    return boundary.scale(mu), coords + shift


def unwrap_molecules(coords, boundary, molecule_ids, bonds_i, bonds_j):
    """Host-side BFS unwrap so molecules stay whole across the periodic
    boundary (Molly: unwrap_molecules, src/spatial.jl:608-699). Used by
    trajectory writers and visualization; returns numpy (N, 3).

    bonds_i/bonds_j: bond endpoint index arrays (any bonded-term pair list).
    """
    import numpy as np

    c = np.asarray(jax.device_get(coords), dtype=np.float64).copy()
    sides = np.asarray(jax.device_get(boundary.side_lengths), dtype=np.float64)
    n = c.shape[0]
    adj = [[] for _ in range(n)]
    for i, j in zip(np.asarray(bonds_i), np.asarray(bonds_j)):
        adj[int(i)].append(int(j))
        adj[int(j)].append(int(i))
    seen = np.zeros(n, dtype=bool)
    for start in range(n):
        if seen[start]:
            continue
        seen[start] = True
        stack = [start]
        while stack:
            a = stack.pop()
            for b in adj[a]:
                if seen[b]:
                    continue
                d = c[b] - c[a]
                shift = np.where(np.isfinite(sides),
                                 np.round(d / np.where(np.isfinite(sides),
                                                       sides, 1.0)) * sides,
                                 0.0)
                c[b] = c[b] - shift
                seen[b] = True
                stack.append(b)
    return c
