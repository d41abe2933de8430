"""Distributional correctness of the thermostatted integrators.

Reference analogue: /root/reference/test/simulation.jl temperature-
distribution checks per simulator. A smoke test cannot distinguish a subtly
wrong BAOAB (wrong noise amplitude, wrong splitting order, missing sqrt(2)
in the OU step) from a right one; sampled *moments* against closed-form
canonical values can.

System: N independent 3-D harmonic oscillators (position restraints, no
pairwise terms). Canonical expectations at temperature T:
  - configurational variance per dof:   <dx^2> = kB T / k_r
  - kinetic temperature mean:           <T_inst> = T
  - kinetic temperature variance:       Var(T_inst) = 2 T^2 / n_dof
The harmonic frequency is omega = sqrt(k_r / m); dt is chosen so
omega*dt ~ 0.1, making the O((omega dt)^2) integrator bias ~0.25%, far
below the statistical tolerances asserted here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mollytpu as mt
from mollytpu.ops.bonded import position_restraints
from mollytpu.units import KB

N = 256
TEMP = 300.0
K_R = 100.0     # kJ/mol/nm^2
MASS = 1.0      # u
DT = 0.01       # ps -> omega*dt = 0.1
N_STEPS = 12000
BURN = 4000
EVERY = 50

VAR_X = KB * TEMP / K_R  # nm^2 per dof


def _oscillators(dtype=jnp.float64):
    key = jax.random.PRNGKey(11)
    boundary = mt.cubic(40.0, dtype=dtype)
    x0 = (jax.random.uniform(key, (N, 3), dtype=dtype) * 20.0 + 10.0)
    atoms = mt.make_atoms(n=N, mass=MASS, sigma=0.3, epsilon=0.0,
                          charge=0.0, dtype=dtype)
    rest = position_restraints(jnp.arange(N, dtype=jnp.int32),
                               jnp.full((N,), K_R, dtype=dtype), x0)
    vels = mt.random_velocities(jax.random.PRNGKey(12), atoms.mass, TEMP,
                                dtype=dtype)
    # restrained oscillators conserve no CM momentum: the full 3N dof count
    # (not the default 3N-3) is what the thermostats must target
    sys = mt.System(atoms=atoms, coords=x0, boundary=boundary,
                    velocities=vels, specific_lists=(rest,), n_dof=3 * N)
    return sys, np.asarray(x0)


def _sample(sim, seed=0):
    sys, x0 = _oscillators()
    loggers = {"x": mt.CoordinatesLogger(EVERY),
               "v": mt.VelocitiesLogger(EVERY)}
    final, logs = mt.simulate(sys, sim, N_STEPS, key=jax.random.PRNGKey(seed),
                              loggers=loggers)
    skip = BURN // EVERY
    xs = np.asarray(logs["x"])[skip:]          # (S, N, 3)
    vs = np.asarray(logs["v"])[skip:]
    dx = xs - x0[None]
    var_x = float(np.mean(dx * dx))
    t_inst = np.sum(MASS * vs * vs, axis=(1, 2)) / (3 * N * KB)  # (S,)
    return var_x, float(np.mean(t_inst)), float(np.var(t_inst))


CANONICAL = [
    ("langevin", mt.Langevin(dt=DT, temperature=TEMP, friction=5.0,
                             remove_cm=False)),
    ("baoab", mt.LangevinSplitting(dt=DT, temperature=TEMP, friction=5.0,
                                   splitting="BAOAB", remove_cm=False)),
    ("obabo", mt.LangevinSplitting(dt=DT, temperature=TEMP, friction=5.0,
                                   splitting="OBABO", remove_cm=False)),
    ("vv_bussi", mt.VelocityVerlet(
        dt=DT, coupling=(mt.VelocityRescaleThermostat(TEMP, 0.2),),
        remove_cm=False)),
    ("vv_andersen", mt.VelocityVerlet(
        dt=DT, coupling=(mt.AndersenThermostat(TEMP, 0.2),),
        remove_cm=False)),
]


@pytest.mark.parametrize("name,sim", CANONICAL, ids=[n for n, _ in CANONICAL])
def test_canonical_sampler_moments(name, sim):
    var_x, t_mean, t_var = _sample(sim)
    assert t_mean == pytest.approx(TEMP, rel=0.03), name
    assert var_x == pytest.approx(VAR_X, rel=0.05), name
    # temperature fluctuations: Var(T) = 2 T^2 / n_dof (canonical). Loose
    # bound — catches a thermostat that pins T (no fluctuations) or doubles
    # the noise, not 1% effects.
    assert t_var == pytest.approx(2.0 * TEMP ** 2 / (3 * N), rel=0.45), name


def test_overdamped_langevin_configurational():
    """Euler-Maruyama Brownian dynamics: no velocities, so check only the
    configurational variance (O(dt) bias ~ k dt / (2 gamma m) = 1%)."""
    sim = mt.OverdampedLangevin(dt=0.001, temperature=TEMP, friction=10.0,
                                remove_cm=False)
    sys, x0 = _oscillators()
    loggers = {"x": mt.CoordinatesLogger(100)}
    _, logs = mt.simulate(sys, sim, 30000, key=jax.random.PRNGKey(3),
                          loggers=loggers)
    xs = np.asarray(logs["x"])[60:]
    dx = xs - x0[None]
    assert float(np.mean(dx * dx)) == pytest.approx(VAR_X, rel=0.06)


def test_nose_hoover_mean_temperature():
    """Single-chain NH is not ergodic on ideal oscillators, but the kinetic
    mean must still sit at the target."""
    sim = mt.NoseHoover(dt=DT, temperature=TEMP, damping=0.2,
                        remove_cm=False)
    _, t_mean, _ = _sample(sim)
    assert t_mean == pytest.approx(TEMP, rel=0.05)


def test_berendsen_suppresses_fluctuations():
    """Weak-coupling rescale is NOT canonical: the mean matches but the
    temperature variance must come out well below 2T^2/n_dof — this is what
    distinguishes a Berendsen implementation from an accidental Bussi."""
    sim = mt.VelocityVerlet(
        dt=DT, coupling=(mt.BerendsenThermostat(TEMP, 0.05),),
        remove_cm=False)
    _, t_mean, t_var = _sample(sim)
    assert t_mean == pytest.approx(TEMP, rel=0.03)
    assert t_var < 0.5 * 2.0 * TEMP ** 2 / (3 * N)
