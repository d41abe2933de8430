"""Replica-exchange molecular dynamics over a sharded replica axis.

Parity with the reference's ReplicaExchangeMD / simulate_remd! / remd_exchange!
(/root/reference/src/simulators.jl:1942-2214): temperature-REMD with
alternating-parity neighbor exchanges, Metropolis acceptance on
(beta_i - beta_j) (U_j - U_i), and sqrt(T_new/T_old) velocity rescaling on
swap.

TPU-native design: the replica ladder is a stacked (R, N, D) coordinate array
sharded over the mesh (parallel/replicas.py). A cycle is one jitted program:
vmapped per-replica MD segments (each replica integrating at its own ladder
temperature) followed by a vectorized exchange sweep. Exchanges swap
*states between temperature slots* via gather — the functional analogue of
the reference's state_indices pointer swap.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..units import KB
from ..forces import potential_energy
from ..ops.neighbors import find_neighbors, maybe_rebuild
from ..parallel.replicas import ReplicaEnsemble, make_ensemble, shard_ensemble, replica_mesh


@dataclasses.dataclass(frozen=True)
class ReplicaExchangeMD:
    """T-REMD driver. `simulator` is a template integrator with a
    `temperature` field which is overridden per replica."""

    temperatures: jax.Array          # (R,) ladder
    simulator: object = dataclasses.field(metadata={"static": False})
    cycle_length: int = dataclasses.field(default=100, metadata={"static": True})

    @property
    def n_replicas(self):
        return int(self.temperatures.shape[0])

    def _one_replica_cycle(self, template, coords, vels, temp, key, cycle_i):
        sim = dataclasses.replace(self.simulator, temperature=temp)
        sys = template.update(coords=coords, velocities=vels)
        nbs = find_neighbors(sys.neighbor_finder, sys.coords, sys.boundary,
                             sys.exclusions, 0)
        aux = sim.init_aux(sys, nbs)

        def body(carry, i):
            sys, nbs, aux, key = carry
            key, sub = jax.random.split(key)
            sys, aux = sim.step(sys, nbs, aux, i, sub)
            nbs = maybe_rebuild(sys.neighbor_finder, nbs, sys.coords,
                                sys.boundary, sys.exclusions, i + 1)
            return (sys, nbs, aux, key), None

        (sys, nbs, aux, key), _ = jax.lax.scan(
            body, (sys, nbs, aux, key), jnp.arange(self.cycle_length))
        pe = potential_energy(sys, nbs)
        return sys.coords, sys.velocities, pe

    def exchange(self, coords, vels, pes, cycle_n, key):
        """Alternating-parity neighbor exchange (simulators.jl:2150-2159,
        2044-2057). Returns permuted (coords, vels) plus acceptance count."""
        r = self.n_replicas
        betas = 1.0 / (KB * self.temperatures)
        idx = jnp.arange(r)
        parity = cycle_n % 2
        # candidate partner for each slot (pairs (0,1),(2,3).. or (1,2),(3,4)..)
        is_lower = (idx % 2) == parity
        partner = jnp.where(is_lower, idx + 1, idx - 1)
        valid = (partner >= 0) & (partner < r)
        partner = jnp.clip(partner, 0, r - 1)
        # Metropolis on Delta = (beta_i - beta_j)(U_j - U_i) per pair
        delta = (betas - betas[partner]) * (pes[partner] - pes)
        u = jax.random.uniform(key, (r,), dtype=pes.dtype)
        # both members of a pair must use the SAME random number: take the
        # lower slot's
        u_pair = jnp.where(is_lower, u, u[partner])
        accept = valid & (u_pair < jnp.exp(jnp.minimum(-delta, 0.0)))
        # both members agree on acceptance by construction (delta symmetric)
        perm = jnp.where(accept, partner, idx)
        new_coords = coords[perm]
        # velocity rescale sqrt(T_i / T_j) when state j moves into slot i
        scale = jnp.sqrt(self.temperatures / self.temperatures[perm])
        new_vels = vels[perm] * scale[:, None, None]
        n_acc = jnp.sum(accept & is_lower & valid)
        return new_coords, new_vels, n_acc

    def simulate(self, sys, n_cycles, key=None, mesh=None, jitter=0.0):
        """Run REMD; returns (ReplicaEnsemble, {"exchange_rate", "pes"})."""
        if key is None:
            key = jax.random.PRNGKey(0)
        r = self.n_replicas
        k0, key = jax.random.split(key)
        ens = make_ensemble(sys, r, key=k0, jitter=jitter)
        if mesh is None and len(jax.devices()) > 1:
            import math as _math
            n_dev = _math.gcd(len(jax.devices()), r)
            if n_dev > 1:
                mesh = replica_mesh(n_dev)
        if mesh is not None:
            ens = shard_ensemble(ens, mesh)
        template = ens.template

        @jax.jit
        def cycle(coords, vels, key, cycle_n):
            key, k1, k2 = jax.random.split(key, 3)
            keys = jax.random.split(k1, r)
            coords, vels, pes = jax.vmap(
                lambda c, v, t, k: self._one_replica_cycle(template, c, v, t, k, cycle_n)
            )(coords, vels, self.temperatures, keys)
            coords, vels, n_acc = self.exchange(coords, vels, pes, cycle_n, k2)
            return coords, vels, pes, n_acc, key

        coords, vels = ens.coords, ens.velocities
        total_acc = 0
        pes_hist = []
        for c in range(n_cycles):
            coords, vels, pes, n_acc, key = cycle(coords, vels, key,
                                                  jnp.asarray(c))
            total_acc += int(jax.device_get(n_acc))
            pes_hist.append(jax.device_get(pes))
        n_attempts = n_cycles * (r // 2)
        return ReplicaEnsemble(template=template, coords=coords,
                               velocities=vels), {
            "exchange_rate": total_acc / max(n_attempts, 1),
            "pes": jnp.asarray(jnp.stack([jnp.asarray(p) for p in pes_hist])),
        }


jax.tree_util.register_dataclass(
    ReplicaExchangeMD, data_fields=["temperatures", "simulator"],
    meta_fields=["cycle_length"],
)


@dataclasses.dataclass(frozen=True)
class HamiltonianReplicaExchangeMD:
    """Hamiltonian-REMD: replicas share a temperature but run at different
    per-atom alchemical lambdas; exchanges Metropolis on the CROSS energies
    Delta = beta [U_i(x_j) + U_j(x_i) - U_i(x_i) - U_j(x_j)].

    Parity with the reference's generalized REMD over ThermoStates with
    AlchemicalPartition.evaluate_energy! cross terms
    (/root/reference/src/simulators.jl:2044-2057, src/free_energy/thermo.jl).
    TPU-native: the replica axis is vmapped/sharded, and both the per-replica
    MD segments and the (R,) self/cross energy evaluations are one jitted
    program per cycle. No velocity rescale on swap (equal temperatures).
    """

    lambdas: jax.Array               # (R,) ladder of lambda values
    simulator: object = dataclasses.field(metadata={"static": False})
    cycle_length: int = dataclasses.field(default=100, metadata={"static": True})
    atom_mask: jax.Array = None      # optional (N,) bool alchemical subset

    @property
    def n_replicas(self):
        return int(self.lambdas.shape[0])

    def _with_lambda(self, template, coords, lam):
        from ..free_energy.thermo import set_lambda
        return set_lambda(template.update(coords=coords), lam, self.atom_mask)

    def _energy(self, template, coords, lam):
        sys = self._with_lambda(template, coords, lam)
        nbs = find_neighbors(sys.neighbor_finder, sys.coords, sys.boundary,
                             sys.exclusions, 0)
        return potential_energy(sys, nbs)

    def _one_replica_cycle(self, template, coords, vels, lam, key, cycle_i):
        sys = self._with_lambda(template, coords, lam)
        sys = sys.update(velocities=vels)
        nbs = find_neighbors(sys.neighbor_finder, sys.coords, sys.boundary,
                             sys.exclusions, 0)
        aux = self.simulator.init_aux(sys, nbs)

        def body(carry, i):
            sys, nbs, aux, key = carry
            key, sub = jax.random.split(key)
            sys, aux = self.simulator.step(sys, nbs, aux, i, sub)
            nbs = maybe_rebuild(sys.neighbor_finder, nbs, sys.coords,
                                sys.boundary, sys.exclusions, i + 1)
            return (sys, nbs, aux, key), None

        (sys, nbs, aux, key), _ = jax.lax.scan(
            body, (sys, nbs, aux, key), jnp.arange(self.cycle_length))
        return sys.coords, sys.velocities

    def exchange(self, template, coords, vels, cycle_n, key):
        r = self.n_replicas
        temp = getattr(self.simulator, "temperature", 300.0)
        beta = 1.0 / (KB * temp)
        idx = jnp.arange(r)
        parity = cycle_n % 2
        is_lower = (idx % 2) == parity
        partner = jnp.where(is_lower, idx + 1, idx - 1)
        valid = (partner >= 0) & (partner < r)
        partner = jnp.clip(partner, 0, r - 1)
        e_fn = jax.vmap(lambda c, l: self._energy(template, c, l))
        e_self = e_fn(coords, self.lambdas)          # U_i(x_i)
        e_cross = e_fn(coords[partner], self.lambdas)  # U_i(x_partner)
        delta = beta * (e_cross + e_cross[partner]
                        - e_self - e_self[partner])
        u = jax.random.uniform(key, (r,), dtype=e_self.dtype)
        u_pair = jnp.where(is_lower, u, u[partner])
        accept = valid & (u_pair < jnp.exp(jnp.minimum(-delta, 0.0)))
        perm = jnp.where(accept, partner, idx)
        n_acc = jnp.sum(accept & is_lower & valid)
        return coords[perm], vels[perm], e_self, n_acc

    def simulate(self, sys, n_cycles, key=None, mesh=None, jitter=0.0):
        """Run H-REMD. Returns (ReplicaEnsemble, info) where info carries
        the exchange rate and the (cycles, R) self-energy history (feed to
        free_energy.mbar with the lambda ladder for free-energy estimates)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        r = self.n_replicas
        k0, key = jax.random.split(key)
        ens = make_ensemble(sys, r, key=k0, jitter=jitter)
        if mesh is None and len(jax.devices()) > 1:
            import math as _math
            n_dev = _math.gcd(len(jax.devices()), r)
            if n_dev > 1:
                mesh = replica_mesh(n_dev)
        if mesh is not None:
            ens = shard_ensemble(ens, mesh)
        template = ens.template

        @jax.jit
        def cycle(coords, vels, key, cycle_n):
            key, k1, k2 = jax.random.split(key, 3)
            keys = jax.random.split(k1, r)
            coords, vels = jax.vmap(
                lambda c, v, l, k: self._one_replica_cycle(
                    template, c, v, l, k, cycle_n)
            )(coords, vels, self.lambdas, keys)
            coords, vels, e_self, n_acc = self.exchange(
                template, coords, vels, cycle_n, k2)
            return coords, vels, e_self, n_acc, key

        coords, vels = ens.coords, ens.velocities
        total_acc = 0
        e_hist = []
        for c in range(n_cycles):
            coords, vels, e_self, n_acc, key = cycle(coords, vels, key,
                                                     jnp.asarray(c))
            total_acc += int(jax.device_get(n_acc))
            e_hist.append(jax.device_get(e_self))
        n_attempts = n_cycles * (r // 2)
        return ReplicaEnsemble(template=template, coords=coords,
                               velocities=vels), {
            "exchange_rate": total_acc / max(n_attempts, 1),
            "energies": jnp.asarray(jnp.stack(
                [jnp.asarray(e) for e in e_hist])),
        }


jax.tree_util.register_dataclass(
    HamiltonianReplicaExchangeMD,
    data_fields=["lambdas", "simulator", "atom_mask"],
    meta_fields=["cycle_length"],
)
