"""The simulation driver: fully jit-compiled, scan-based stepping.

Re-design of the reference's host-driven `simulate!` loop
(/root/reference/src/simulators.jl:137-668). The reference launches kernels
and syncs to the host every step; here the step is one pure function advanced
by lax.scan in chunks, with the chunk boundary the only host touch point
(logging, NaN checks, neighbor-overflow checks). With no loggers the whole
trajectory is one compiled scan.

Contract: simulate(sys, simulator, n_steps, key, loggers=...) ->
(final System, logs dict). Resume = pass init_step (reference parity:
simulate!(...; init_step), simulators.jl:158-159).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.neighbors import find_neighbors, maybe_rebuild
from .coupling import needs_virial_interval


def _chunk_sizes(n_steps, intervals):
    """Yield chunk lengths so every logger interval boundary is hit."""
    if not intervals:
        return [n_steps] if n_steps else []
    g = intervals[0]
    for iv in intervals[1:]:
        g = math.gcd(g, iv)
    sizes = []
    done = 0
    while done < n_steps:
        step = min(g, n_steps - done)
        sizes.append(step)
        done += step
    return sizes


def _make_chunk_fn(simulator, needs_virial, finder=None, align=0):
    """Build the jitted chunk runner.

    When the neighbor finder has a rebuild cadence r > 1, the chunk is run as
    [pre-steps to the next r boundary] + [outer scan over full r-step periods
    with one UNCONDITIONAL rebuild each] + [tail steps]. This removes the
    per-step lax.cond of the naive loop, which costs ~1 ms/step in pytree
    copies on TPU for a 20k-atom system (the cond's false branch still
    round-trips the whole neighbor structure through the carry).

    align = step0 % r must be passed statically (it shapes the program); the
    caller knows step0 on the host.
    """
    r = getattr(finder, "n_steps", 1) if finder is not None else 1

    # Carry discipline: the scans thread ONLY the state a step can mutate —
    # coords, velocities, boundary (barostats), aux, key. Everything static
    # (atom parameters, topology lists, exclusion tables, the neighbor
    # structure within a rebuild period) is CLOSED OVER, so XLA never has to
    # prove tens of MB of pytree leaves loop-invariant (the neighbor
    # pair_mask alone is ~50 MB on the 6mrr system; round-tripping it
    # through the while-loop carry was a measurable share of the bare-step
    # floor).
    def run_chunk(sys, neighbors, aux, key, step0, n):
        def steps_only(sys, neighbors, aux, key, step0_, k):
            def body(c, i):
                coords, vels, bnd, aux, key = c
                s = sys.update(coords=coords, velocities=vels, boundary=bnd)
                key, sub = jax.random.split(key)
                s, aux = simulator.step(s, neighbors, aux, i, sub,
                                        needs_virial=needs_virial)
                return (s.coords, s.velocities, s.boundary, aux, key), None

            (coords, vels, bnd, aux, key), _ = jax.lax.scan(
                body, (sys.coords, sys.velocities, sys.boundary, aux, key),
                step0_ + jnp.arange(k))
            return (sys.update(coords=coords, velocities=vels, boundary=bnd),
                    aux, key)

        if finder is None or neighbors is None or r <= 1:
            # per-step maybe_rebuild (r == 1 means rebuild every step anyway)
            def body(c, i):
                s, neighbors, aux, key = c
                step_n = step0 + i
                key, sub = jax.random.split(key)
                s, aux = simulator.step(s, neighbors, aux, step_n, sub,
                                        needs_virial=needs_virial)
                neighbors = maybe_rebuild(s.neighbor_finder, neighbors,
                                          s.coords, s.boundary,
                                          s.exclusions, step_n + 1)
                return (s, neighbors, aux, key), None

            carry, _ = jax.lax.scan(body, (sys, neighbors, aux, key),
                                    jnp.arange(n))
            return carry

        pre = min((-align) % r, n)
        n_periods = (n - pre) // r
        tail = n - pre - n_periods * r

        if pre:
            sys, aux, key = steps_only(sys, neighbors, aux, key, step0, pre)
            neighbors = find_neighbors(sys.neighbor_finder, sys.coords,
                                       sys.boundary, sys.exclusions,
                                       step0 + pre)

        if n_periods:
            def period(c, k):
                coords, vels, bnd, neighbors, aux, key = c
                s = sys.update(coords=coords, velocities=vels, boundary=bnd)
                s, aux, key = steps_only(s, neighbors, aux, key,
                                         step0 + pre + k * r, r)
                neighbors = find_neighbors(s.neighbor_finder, s.coords,
                                           s.boundary, s.exclusions,
                                           step0 + pre + (k + 1) * r)
                return (s.coords, s.velocities, s.boundary, neighbors, aux,
                        key), None

            (coords, vels, bnd, neighbors, aux, key), _ = jax.lax.scan(
                period, (sys.coords, sys.velocities, sys.boundary, neighbors,
                         aux, key), jnp.arange(n_periods))
            sys = sys.update(coords=coords, velocities=vels, boundary=bnd)

        if tail:
            sys, aux, key = steps_only(sys, neighbors, aux, key,
                                       step0 + pre + n_periods * r, tail)
        return sys, neighbors, aux, key

    return run_chunk


def simulate(sys, simulator, n_steps, key=None, loggers=None, run_loggers=True,
             init_step=0, check_nans=False, neighbors=None, shortcut=None,
             show_progress=False):
    """Run n_steps of MD. Returns (final_sys, logs).

    loggers: dict name -> logger (see utils.loggers). logs maps each name to
    the stacked recorded values (host-side list stacking after the run).
    run_loggers: True / False / "skipstart" (skip the step-0 record;
    reference parity: simulate! run_loggers=:skipstart, simulators.jl:56).
    shortcut: optional host callable (sys, neighbors, step_n) -> bool checked
    at every chunk boundary; True ends the run early (the reference's
    simulator early-exit hook, simulators.jl:23).
    show_progress: print step counter + instantaneous ns/day to stderr at
    chunk boundaries (simulators.jl:56-89 progress meter).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    loggers = dict(loggers or {})
    lset = list(loggers.values())

    nv_interval = needs_virial_interval(getattr(simulator, "coupling", ()), lset)
    needs_virial = nv_interval > 0

    # reference parity (simulators.jl:563): when starting a fresh run, CM
    # motion is removed BEFORE the first step (OpenMM's CMMotionRemover acts
    # at the start of every step; end-of-step removal inside our integrators
    # covers the rest of the schedule)
    if init_step == 0 and getattr(simulator, "remove_cm", False):
        from ..spatial import remove_cm_motion
        sys = sys.update(velocities=remove_cm_motion(sys.masses,
                                                     sys.velocities))

    if neighbors is None:
        neighbors = find_neighbors(sys.neighbor_finder, sys.coords, sys.boundary,
                                   sys.exclusions, init_step)
    aux = simulator.init_aux(sys, neighbors, needs_virial=needs_virial)

    logs = {name: [] for name in loggers}

    def log_now(step_n, first=False):
        if not run_loggers:
            return
        for name, lg in loggers.items():
            iv = max(int(lg.interval), 1)
            if step_n % iv == 0 and (step_n > 0 or run_loggers != "skipstart"):
                logs[name].append(jax.device_get(
                    lg.observe(sys, neighbors, aux, step_n)))

    log_now(init_step, first=True)

    intervals = [max(int(lg.interval), 1) for lg in lset]
    chunks = _chunk_sizes(n_steps, intervals)

    chunk_fn_cache = {}
    finder = sys.neighbor_finder if neighbors is not None else None
    r = getattr(finder, "n_steps", 1) if finder is not None else 1

    step_n = init_step
    if show_progress:
        import sys as _sys
        import time as _time
        t_prog = _time.perf_counter()
    def _check_overflow(ov_arr, at_step):
        ov = int(jax.device_get(ov_arr))
        if ov > 0:
            from ..ops.blockpairs import BlockPairFinder, decode_overflow
            if isinstance(finder, BlockPairFinder):
                causes = "; ".join(decode_overflow(ov))
            else:
                causes = (f"neighbor list overflow by {ov}; increase "
                          "max_neighbors / cell_capacity on the finder")
            raise RuntimeError(
                f"neighbor finder overflow at step {at_step}: {causes}")

    # overflow checks run ONE CHUNK BEHIND: the device_get then overlaps the
    # next chunk's execution instead of stalling the pipeline (on tunneled
    # TPUs a blocked host sync costs ~28 ms — per chunk, that is a tax of up
    # to ~1.4 ms/step on the public simulate() path). Detection one chunk
    # late raises the same error, just after some extra wasted work.
    pending_ov = None
    # the box only moves under a barostat; without one the NPT staleness
    # check would pay a pointless host sync per chunk
    has_barostat = any(getattr(c, "is_barostat", False)
                       or "Barostat" in type(c).__name__
                       for c in getattr(simulator, "coupling", ()) or ())

    for n in chunks:
        align = step_n % r if r > 1 else 0
        if (n, align) not in chunk_fn_cache:
            run_chunk = _make_chunk_fn(simulator, needs_virial, finder, align)
            chunk_fn_cache[(n, align)] = jax.jit(partial(run_chunk, n=n))
        sys, neighbors, aux, key = chunk_fn_cache[(n, align)](
            sys, neighbors, aux, key, jnp.asarray(step_n))
        step_n += n
        if pending_ov is not None:
            _check_overflow(*pending_ov)
            pending_ov = None
        if show_progress:
            jax.block_until_ready(sys.coords)
            now = _time.perf_counter()
            dt_ps = getattr(simulator, "dt", 0.0)
            rate = n * dt_ps * 1e-3 * 86400.0 / max(now - t_prog, 1e-9)
            t_prog = now
            print(f"\rstep {step_n - init_step}/{n_steps}"
                  + (f"  {rate:.1f} ns/day" if dt_ps else ""),
                  end="", file=_sys.stderr, flush=True)
        if check_nans:
            if bool(jnp.any(jnp.isnan(sys.coords))):
                raise FloatingPointError(f"NaN coordinates at step {step_n}")
        if neighbors is not None:
            pending_ov = (neighbors.overflow, step_n)
        # NPT staleness: barostat drift beyond the finder's static-geometry
        # band re-derives the cell geometry from the current box (new static
        # config -> fresh compiles of subsequent chunks)
        if (has_barostat and finder is not None
                and getattr(finder, "box_drift_exceeded", None) is not None
                and finder.box_drift_exceeded(sys.boundary)):
            finder = finder.resetup(sys.boundary, sys.n_atoms,
                                    coords=sys.coords, atoms=sys.atoms)
            sys = sys.update(neighbor_finder=finder)
            neighbors = find_neighbors(finder, sys.coords, sys.boundary,
                                       sys.exclusions, step_n)
            chunk_fn_cache.clear()
        log_now(step_n)
        if shortcut is not None and shortcut(sys, neighbors, step_n):
            break

    if pending_ov is not None:
        _check_overflow(*pending_ov)
    if show_progress:
        print(file=_sys.stderr, flush=True)
    logs = {k: _stack(v) for k, v in logs.items()}
    return sys, logs


def _stack(values):
    if not values:
        return values
    try:
        return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *values)
    except Exception:
        return values


def simulate_differentiable(sys, simulator, n_steps, key=None, neighbors=None,
                            remat=True):
    """Fully-traced simulation for autodiff: one lax.scan, no host touch
    points, optional per-step rematerialization so trajectory gradients fit
    in memory (replaces the reference's Enzyme-based differentiable MD,
    ext/MollyEnzymeExt.jl — JAX differentiates the whole trajectory
    natively). Returns the final System.

    Differentiate e.g. with
        jax.grad(lambda s: observable(simulate_differentiable(s, sim, n)))(sys)
    """
    import jax as _jax

    if key is None:
        key = _jax.random.PRNGKey(0)
    if neighbors is None:
        neighbors = find_neighbors(sys.neighbor_finder, sys.coords,
                                   sys.boundary, sys.exclusions, 0)
    aux = simulator.init_aux(sys, neighbors, needs_virial=False)

    def body(carry, i):
        sys, neighbors, aux, key = carry
        key, sub = _jax.random.split(key)
        sys, aux = simulator.step(sys, neighbors, aux, i, sub,
                                  needs_virial=False)
        neighbors = maybe_rebuild(sys.neighbor_finder, neighbors, sys.coords,
                                  sys.boundary, sys.exclusions, i + 1)
        return (sys, neighbors, aux, key), None

    if remat:
        body = _jax.checkpoint(body)
    (sys, neighbors, aux, key), _ = jax.lax.scan(
        body, (sys, neighbors, aux, key), jnp.arange(n_steps))
    return sys
