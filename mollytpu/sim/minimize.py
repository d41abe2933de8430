"""Energy minimization.

Parity with the reference's SteepestDescentMinimizer
(/root/reference/src/simulators.jl:113-274): adaptive-step steepest descent
(step x1.2 on acceptance, /2 on rejection in our variant; the reference uses
x6/5 and /5), with constraints handled by projecting each accepted move back
onto the constraint manifold (the reference converts constraints to stiff
harmonic bonds instead, constraints.jl:619).

Runs as one jitted lax.scan of fixed max_steps with an early-converged mask,
so minimization costs one compile and no host round trips.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..forces import forces_virial, potential_energy


@dataclasses.dataclass(frozen=True)
class SteepestDescentMinimizer:
    step_size: float = 0.01      # nm, initial max displacement
    max_steps: int = dataclasses.field(default=100, metadata={"static": True})
    tol: float = 100.0           # kJ/mol/nm max-force convergence
    run_loggers: bool = dataclasses.field(default=False, metadata={"static": True})

    def minimize(self, sys, neighbors=None):
        """Returns (minimized System, info dict)."""

        def body(carry, _):
            coords, step, e_prev, done = carry
            s = sys.update(coords=coords)
            f, _ = forces_virial(s, neighbors)
            max_f = jnp.max(jnp.sqrt(jnp.sum(f * f, axis=1)))
            trial = coords + step * f / jnp.maximum(max_f, 1e-12)
            for c in sys.constraints:
                trial, _ = c.apply_position_constraints(
                    coords, trial, None, sys.masses, sys.boundary, 1.0)
            trial = sys.boundary.wrap(trial)
            e_trial = potential_energy(sys.update(coords=trial), neighbors)
            accept = (e_trial < e_prev) & ~done
            coords = jnp.where(accept, trial, coords)
            e_new = jnp.where(accept, e_trial, e_prev)
            step = jnp.where(done, step,
                             jnp.where(accept, step * 1.2, step * 0.5))
            done = done | (max_f < self.tol)
            return (coords, step, e_new, done), e_new

        e0 = potential_energy(sys, neighbors)
        init = (sys.coords, jnp.asarray(self.step_size, sys.coords.dtype), e0,
                jnp.asarray(False))
        (coords, step, e_final, done), es = jax.lax.scan(
            body, init, None, length=self.max_steps)
        return sys.update(coords=coords), {
            "energy_initial": e0, "energy_final": e_final,
            "converged": done, "energies": es}

    # simulate!-style interface parity
    def simulate(self, sys, n_steps=None, neighbors=None, **kw):
        new_sys, info = self.minimize(sys, neighbors)
        return new_sys, info


jax.tree_util.register_dataclass(
    SteepestDescentMinimizer, data_fields=["step_size", "tol"],
    meta_fields=["max_steps", "run_loggers"],
)
