"""Replica (ensemble) parallelism over a device mesh.

The reference's only multi-execution-context parallelism is REMD: one Julia
task per replica on shared memory (/root/reference/src/simulators.jl:
2124-2146). The TPU-native equivalent is a batched replica axis sharded over
the chips of a jax.sharding.Mesh: the per-replica MD step is vmapped, the
replica axis is laid out over ICI, and exchange decisions (REMD) run as
collectives/gathers instead of host-side pointer swaps.

This module provides the mesh/ensemble machinery; sim/remd.py builds replica
exchange on top of it.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.neighbors import find_neighbors, maybe_rebuild


def replica_mesh(n_devices=None, axis_name="replicas"):
    devices = jax.devices()
    n = n_devices or len(devices)
    return jax.sharding.Mesh(devices[:n], (axis_name,))


@dataclasses.dataclass(frozen=True)
class ReplicaEnsemble:
    """R replicas of one System template, coordinates/velocities stacked on a
    leading replica axis that shards over the mesh.

    Mirrors the reference's ReplicaSystem (src/types.jl:1282-1427) with the
    replica ladder expressed as stacked arrays instead of a vector of
    systems.
    """

    template: object               # System (single-replica structure)
    coords: jax.Array              # (R, N, D)
    velocities: jax.Array          # (R, N, D)

    @property
    def n_replicas(self):
        return self.coords.shape[0]

    def replica(self, i):
        return self.template.update(coords=self.coords[i],
                                    velocities=self.velocities[i])


jax.tree_util.register_dataclass(
    ReplicaEnsemble, data_fields=["template", "coords", "velocities"],
    meta_fields=[],
)


def make_ensemble(sys, n_replicas, key=None, jitter=0.0):
    """Stack a System into an ensemble, optionally jittering coordinates."""
    coords = jnp.broadcast_to(sys.coords, (n_replicas,) + sys.coords.shape)
    vels = jnp.broadcast_to(sys.velocities, (n_replicas,) + sys.velocities.shape)
    if key is not None and jitter > 0:
        coords = coords + jitter * jax.random.normal(key, coords.shape,
                                                     dtype=coords.dtype)
    return ReplicaEnsemble(template=sys, coords=coords, velocities=vels)


def shard_ensemble(ens, mesh, axis_name="replicas"):
    """Place the replica axis over the mesh (template replicated)."""
    rep_sharding = NamedSharding(mesh, P(axis_name))
    full = NamedSharding(mesh, P())
    coords = jax.device_put(ens.coords, rep_sharding)
    vels = jax.device_put(ens.velocities, rep_sharding)
    template = jax.device_put(ens.template, full)
    return ReplicaEnsemble(template=template, coords=coords, velocities=vels)


def make_ensemble_step(simulator, template, n_inner_steps=1, needs_virial=False):
    """Build a jittable ensemble step: every replica advances n_inner_steps.

    Returns step(coords (R,N,D), vels (R,N,D), keys (R,2)) ->
    (coords, vels, mean_potential_like_metric). Neighbor lists are rebuilt
    per replica inside the step. vmap keeps all replicas in one XLA program;
    sharding the replica axis turns the vmap into pure data parallelism over
    ICI with zero per-step communication.
    """

    def one_replica(coords, vels, key):
        sys = template.update(coords=coords, velocities=vels)
        nbs = find_neighbors(sys.neighbor_finder, sys.coords, sys.boundary,
                             sys.exclusions, 0)
        aux = simulator.init_aux(sys, nbs, needs_virial=needs_virial)

        def body(carry, i):
            sys, nbs, aux, key = carry
            key, sub = jax.random.split(key)
            sys, aux = simulator.step(sys, nbs, aux, i, sub,
                                      needs_virial=needs_virial)
            nbs = maybe_rebuild(sys.neighbor_finder, nbs, sys.coords,
                                sys.boundary, sys.exclusions, i + 1)
            return (sys, nbs, aux, key), None

        (sys, nbs, aux, key), _ = jax.lax.scan(
            body, (sys, nbs, aux, key), jnp.arange(n_inner_steps))
        from ..spatial import kinetic_energy
        ke = kinetic_energy(sys.masses, sys.velocities)
        return sys.coords, sys.velocities, ke

    def step(coords, vels, keys):
        new_coords, new_vels, kes = jax.vmap(one_replica)(coords, vels, keys)
        return new_coords, new_vels, kes

    return step


def simulate_ensemble(sys, simulator, n_replicas, n_steps, key=None,
                      mesh=None, axis_name="replicas", chunk=10):
    """Advance an ensemble of replicas, sharded over the mesh. Returns the
    final ReplicaEnsemble."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if mesh is None:
        mesh = replica_mesh(axis_name=axis_name)
    ens = make_ensemble(sys, n_replicas)
    ens = shard_ensemble(ens, mesh, axis_name)
    step = jax.jit(make_ensemble_step(simulator, ens.template, n_inner_steps=chunk))
    coords, vels = ens.coords, ens.velocities
    done = 0
    while done < n_steps:
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, n_replicas)
        coords, vels, _ = step(coords, vels, keys)
        done += chunk
    return ReplicaEnsemble(template=ens.template, coords=coords, velocities=vels)
