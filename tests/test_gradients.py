"""Differentiable simulation tests (reference: test/gradients.jl): gradients
of energies w.r.t. force-field parameters and of observables through whole
trajectories, including differentiable PME."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mollytpu as mt

pytestmark = pytest.mark.gradients
from tests.test_simulation import lj_fluid


def test_grad_energy_wrt_atom_params():
    """dE/d(sigma, epsilon, charge) matches finite differences."""
    sys = lj_fluid(n_atoms=12, box=2.0)
    q = jnp.linspace(-0.2, 0.2, 12, dtype=jnp.float64)
    q = q - jnp.mean(q)
    sys = sys.update(atoms=dataclasses.replace(sys.atoms, charge=q),
                     pairwise_inters=(mt.LennardJones(), mt.Coulomb()))

    def e_of(sig, eps, charge):
        atoms = dataclasses.replace(sys.atoms, sigma=sig, epsilon=eps,
                                    charge=charge)
        return mt.potential_energy(sys.update(atoms=atoms))

    g_sig, g_eps, g_q = jax.grad(e_of, argnums=(0, 1, 2))(
        sys.atoms.sigma, sys.atoms.epsilon, sys.atoms.charge)
    h = 1e-6
    for arr, g, name in ((sys.atoms.sigma, g_sig, "sigma"),
                         (sys.atoms.epsilon, g_eps, "epsilon"),
                         (sys.atoms.charge, g_q, "charge")):
        up = arr.at[3].add(h)
        dn = arr.at[3].add(-h)
        if name == "sigma":
            fd = (float(e_of(up, sys.atoms.epsilon, sys.atoms.charge))
                  - float(e_of(dn, sys.atoms.epsilon, sys.atoms.charge))) / (2 * h)
        elif name == "epsilon":
            fd = (float(e_of(sys.atoms.sigma, up, sys.atoms.charge))
                  - float(e_of(sys.atoms.sigma, dn, sys.atoms.charge))) / (2 * h)
        else:
            fd = (float(e_of(sys.atoms.sigma, sys.atoms.epsilon, up))
                  - float(e_of(sys.atoms.sigma, sys.atoms.epsilon, dn))) / (2 * h)
        assert float(g[3]) == pytest.approx(fd, rel=1e-5), name


def test_grad_through_trajectory():
    """Gradient of the final potential energy w.r.t. epsilon through a
     20-step NVE trajectory matches finite differences (the headline
    differentiable-MD capability, gradients.jl whole-simulation tests)."""
    sys = lj_fluid(n_atoms=10, box=2.0, temp=20.0)
    sim = mt.VelocityVerlet(dt=0.001)
    key = jax.random.PRNGKey(80)

    def loss(eps_scalar):
        atoms = dataclasses.replace(
            sys.atoms, epsilon=jnp.full_like(sys.atoms.epsilon, eps_scalar))
        s = sys.update(atoms=atoms)
        final = mt.simulate_differentiable(s, sim, 20, key=key)
        return mt.potential_energy(final)

    g = jax.grad(loss)(jnp.float64(0.2))
    h = 1e-5
    fd = (float(loss(jnp.float64(0.2 + h))) - float(loss(jnp.float64(0.2 - h)))) / (2 * h)
    assert np.isfinite(float(g))
    assert float(g) == pytest.approx(fd, rel=2e-3), (float(g), fd)


def test_grad_through_pme():
    """Differentiable PME (gradients.jl:37-60): dE/dcoords through the FFT
    pipeline matches finite differences."""
    from mollytpu.ops.ewald import PME
    key = jax.random.PRNGKey(81)
    boundary = mt.cubic(2.0, dtype=jnp.float64)
    coords = mt.place_atoms(key, boundary, 8, min_dist=0.3, dtype=jnp.float64)
    q = jnp.linspace(-0.5, 0.5, 8, dtype=jnp.float64)
    q = q - jnp.mean(q)
    atoms = mt.make_atoms(n=8, mass=10.0, charge=q, sigma=0.3, epsilon=0.1,
                          dtype=jnp.float64)
    pme = PME.setup(boundary, dist_cutoff=0.9, error_tol=1e-4, dtype=jnp.float64)
    g = jax.grad(lambda c: pme.energy(c, boundary, atoms))(coords)
    h = 1e-6
    cp = coords.at[2, 1].add(h)
    cm = coords.at[2, 1].add(-h)
    fd = (float(pme.energy(cp, boundary, atoms))
          - float(pme.energy(cm, boundary, atoms))) / (2 * h)
    assert float(g[2, 1]) == pytest.approx(fd, rel=1e-5)
    # and through charges
    gq = jax.grad(lambda qq: pme.energy(
        coords, boundary, dataclasses.replace(atoms, charge=qq)))(q)
    assert np.all(np.isfinite(np.asarray(gq)))


def test_grad_langevin_reparameterized():
    """Gradients through stochastic (Langevin) dynamics are finite and
    stable thanks to the counter-based RNG (reference design note:
    replayable Philox noise)."""
    sys = lj_fluid(n_atoms=8, box=2.0, temp=50.0)
    sim = mt.Langevin(dt=0.001, temperature=50.0, friction=1.0)
    key = jax.random.PRNGKey(82)

    def loss(scale):
        s = sys.update(coords=sys.coords * scale)
        final = mt.simulate_differentiable(s, sim, 10, key=key)
        return jnp.sum(final.coords ** 2)

    g = jax.grad(loss)(jnp.float64(1.0))
    assert np.isfinite(float(g))
