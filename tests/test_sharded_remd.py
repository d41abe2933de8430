"""Sharded-REMD semantics under a real NamedSharding over the 8-device CPU
mesh (conftest provides xla_force_host_platform_device_count=8): the mesh
run must produce bit-identical exchange decisions and trajectories to the
unsharded run with the same keys — the exchange sweep is a cross-replica
gather collective, the one multi-context communication pattern of the
reference (/root/reference/src/simulators.jl:2124-2159)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mollytpu as mt
from mollytpu.parallel import replicas as rp
from mollytpu.sim.remd import ReplicaExchangeMD


def _tiny_system(dtype=jnp.float32):
    n_atoms = 32
    boundary = mt.cubic(1.6, dtype=dtype)
    lin = (jnp.arange(4, dtype=dtype) + 0.5) * (1.6 / 4)
    grid = jnp.stack(jnp.meshgrid(lin, lin, lin[:2], indexing="ij"), axis=-1)
    coords = grid.reshape(-1, 3)
    atoms = mt.make_atoms(n=n_atoms, mass=40.0, sigma=0.34, epsilon=1.0,
                          dtype=dtype)
    vels = mt.random_velocities(jax.random.PRNGKey(1), atoms.mass, 120.0,
                                dtype=dtype)
    return mt.System(atoms=atoms, coords=coords, boundary=boundary,
                     velocities=vels,
                     pairwise_inters=(mt.LennardJones(
                         cutoff=mt.ShiftedForceCutoff(0.7)),))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_sharded_remd_matches_unsharded():
    sys = _tiny_system()
    sim = mt.Langevin(dt=0.002, temperature=120.0, friction=1.0)
    temps = jnp.linspace(100.0, 180.0, 8, dtype=jnp.float32)
    remd = ReplicaExchangeMD(temperatures=temps, simulator=sim,
                             cycle_length=2)
    mesh = rp.replica_mesh(8)

    ens_m, info_m = remd.simulate(sys, n_cycles=3, key=jax.random.PRNGKey(7),
                                  mesh=mesh, jitter=0.01)
    ens_u, info_u = remd.simulate(sys, n_cycles=3, key=jax.random.PRNGKey(7),
                                  mesh=None, jitter=0.01)

    cm = np.asarray(jax.device_get(ens_m.coords))
    cu = np.asarray(jax.device_get(ens_u.coords))
    assert cm.shape == (8, 32, 3)
    assert np.all(np.isfinite(cm))
    assert np.allclose(cm, cu, atol=1e-6), (
        "sharded REMD diverged from the unsharded reference")
    assert info_m["exchange_rate"] == pytest.approx(
        info_u["exchange_rate"], abs=1e-9)

    # the mesh run really was sharded over the replica axis
    shd = ens_m.coords.sharding
    assert isinstance(shd, jax.sharding.NamedSharding)
    assert shd.spec[0] == "replicas"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_sharded_ensemble_step_is_replica_parallel():
    """Pure data-parallel ensemble stepping under the mesh: per-replica
    trajectories must equal stepping each replica alone (no cross-replica
    leakage through the sharded program)."""
    sys = _tiny_system()
    sim = mt.Langevin(dt=0.002, temperature=120.0, friction=1.0)
    mesh = rp.replica_mesh(8)
    ens = rp.make_ensemble(sys, 8, key=jax.random.PRNGKey(2), jitter=0.01)
    ens_sh = rp.shard_ensemble(ens, mesh)
    step = jax.jit(rp.make_ensemble_step(sim, ens.template, n_inner_steps=3))
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    keys_sh = jax.device_put(keys, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("replicas")))
    coords_sh, vels_sh, _ = step(ens_sh.coords, ens_sh.velocities, keys_sh)
    coords_us, vels_us, _ = step(ens.coords, ens.velocities, keys)
    assert np.allclose(np.asarray(coords_sh), np.asarray(coords_us),
                       atol=1e-6)
