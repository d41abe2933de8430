"""Per-family parameter-gradient sweep (reference: test/gradients.jl:1-854,
which checks Enzyme parameter gradients against FiniteDifferences for every
interaction family). Here forces are -grad E by construction, so the sweep
checks d(energy)/d(param) against central finite differences for every
pairwise family (sigma/epsilon/charge/lambda) and every bonded family
(k/r0/theta0/phase/...), plus one observable gradient through an REMD cycle.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mollytpu as mt
from mollytpu.ops import bonded as bd

from tests.test_interactions import ALL_INTERS, atom_view

pytestmark = pytest.mark.gradients


def _fd(f, p0, h=1e-6):
    return (float(f(p0 + h)) - float(f(p0 - h))) / (2 * h)


@pytest.mark.parametrize("inter,akw", ALL_INTERS,
                         ids=[type(i).__name__ for i, _ in ALL_INTERS])
def test_pairwise_param_grads(inter, akw):
    """dE/d(sigma, epsilon, charge, lambda) of the i-side atom matches finite
    differences for every pairwise family at a generic r."""
    base = dict(charge=0.3, sigma=0.3, epsilon=0.2)
    base.update({k: v for k, v in akw.items() if k in ("lam", "alch_role",
                                                       "buck")})
    aj = atom_view(charge=-0.25, sigma=0.25, epsilon=0.3,
                   **{k: v for k, v in akw.items()
                      if k not in ("charge", "sigma", "epsilon")})
    r = jnp.float64(0.41)

    params = ["sigma", "epsilon", "charge"]
    if "lam" in akw:
        params.append("lam")
    for name in params:
        def e_of(p):
            kw = dict(base)
            kw[name] = p
            return inter.energy(r, atom_view(**kw), aj, jnp.asarray(False))

        p0 = jnp.float64(base.get(name, 0.3))
        g = float(jax.grad(e_of)(p0))
        fd = _fd(e_of, p0)
        assert np.isfinite(g), f"{name}: non-finite grad"
        assert g == pytest.approx(fd, rel=2e-5, abs=1e-9), (
            f"{type(inter).__name__} d/d{name}: grad {g} vs fd {fd}")


# bonded families: builder, param kwargs, coords (atoms of the term)
# (numpy at module scope: collection happens before the x64 fixture runs)
_COORDS4 = np.asarray([[0.0, 0.0, 0.0], [0.15, 0.02, 0.01],
                       [0.22, 0.14, 0.03], [0.30, 0.18, 0.17]],
                      dtype=np.float64)

BONDED_CASES = [
    ("harmonic_bond",
     lambda **p: bd.harmonic_bonds(i=[0], j=[1], **p),
     dict(k=1000.0, r0=0.14)),
    ("morse_bond",
     lambda **p: bd.morse_bonds(i=[0], j=[1], **p),
     dict(D=100.0, a=10.0, r0=0.14)),
    ("fene_bond",
     lambda **p: bd.fene_bonds(i=[0], j=[1], **p),
     dict(k=200.0, r0=0.30, sigma=0.10, epsilon=0.5)),
    ("harmonic_angle",
     lambda **p: bd.harmonic_angles(i=[0], j=[1], k_idx=[2], **p),
     dict(k=100.0, theta0=1.9)),
    ("cosine_angle",
     lambda **p: bd.cosine_angles(i=[0], j=[1], k_idx=[2], **p),
     dict(k=100.0, theta0=1.9)),
    ("urey_bradley",
     lambda **p: bd.urey_bradleys(i=[0], j=[1], k_idx=[2], **p),
     dict(kangle=100.0, theta0=1.9, kbond=300.0, r0=0.25)),
    ("periodic_torsion",
     lambda **p: bd.periodic_torsions(i=[0], j=[1], k_idx=[2], l=[3],
                                      periodicity=[2], **p),
     dict(phase=0.6, k=8.0)),
    ("harmonic_torsion",
     lambda **p: bd.harmonic_torsions(i=[0], j=[1], k_idx=[2], l=[3], **p),
     dict(k=40.0, theta0=0.8)),
    ("ewald_exclusion",
     lambda **p: bd.ewald_exclusions(i=[0], j=[1], **p),
     dict(kqq=11.1, alpha=3.1)),
]


@pytest.mark.parametrize("name,builder,params", BONDED_CASES,
                         ids=[c[0] for c in BONDED_CASES])
def test_bonded_param_grads(name, builder, params):
    """dE/d(param) matches finite differences for every bonded family and
    every continuous parameter."""
    boundary = mt.cubic(5.0, dtype=jnp.float64)
    for pname, p0 in params.items():
        def e_of(p):
            kw = {k: jnp.asarray([jnp.float64(p) if k == pname else v],
                                 dtype=jnp.float64)
                  for k, v in params.items()}
            slist = builder(**kw)
            return bd.specific_energy(slist, _COORDS4, boundary)

        g = float(jax.grad(e_of)(jnp.float64(p0)))
        fd = _fd(e_of, p0)
        assert np.isfinite(g), f"{name}.{pname}: non-finite grad"
        assert g == pytest.approx(fd, rel=2e-5, abs=1e-9), (
            f"{name} d/d{pname}: grad {g} vs fd {fd}")


def test_rb_torsion_coeff_grads():
    """Ryckaert-Bellemans coefficient gradients (vector param)."""
    boundary = mt.cubic(5.0, dtype=jnp.float64)
    c0 = jnp.asarray([[9.28, 12.16, -13.12, -3.06, 26.24, -31.5]],
                     dtype=jnp.float64)

    def e_of(c):
        slist = bd.rb_torsions(i=[0], j=[1], k_idx=[2], l=[3], coeffs=c)
        return bd.specific_energy(slist, _COORDS4, boundary)

    g = np.asarray(jax.grad(e_of)(c0))
    for idx in range(6):
        h = 1e-6
        fd = (float(e_of(c0.at[0, idx].add(h)))
              - float(e_of(c0.at[0, idx].add(-h)))) / (2 * h)
        assert g[0, idx] == pytest.approx(fd, rel=2e-5, abs=1e-9), idx


def test_position_restraint_param_grads():
    boundary = mt.cubic(5.0, dtype=jnp.float64)

    def e_of(k):
        slist = bd.position_restraints(
            i=[1], k=jnp.asarray([k], dtype=jnp.float64),
            x0=jnp.asarray([[0.1, 0.0, 0.0]], dtype=jnp.float64))
        return bd.specific_energy(slist, _COORDS4, boundary)

    g = float(jax.grad(e_of)(jnp.float64(500.0)))
    fd = _fd(e_of, 500.0, h=1e-4)
    assert g == pytest.approx(fd, rel=1e-6)


def test_remd_observable_param_grad():
    """Gradient of a T-REMD observable (mean potential energy across
    replicas after exchange cycles) w.r.t. epsilon is finite and matches
    finite differences (the whole-simulation gradient class of
    test/gradients.jl, on the REMD path)."""
    from tests.test_simulation import lj_fluid

    sys = lj_fluid(n_atoms=8, box=2.0, temp=30.0)
    key = jax.random.PRNGKey(7)
    temps = jnp.asarray([25.0, 35.0], dtype=jnp.float64)

    def observable(eps):
        atoms = dataclasses.replace(
            sys.atoms, epsilon=jnp.full_like(sys.atoms.epsilon, eps))
        s = sys.update(atoms=atoms)
        # two replicas, short inner runs, one exchange decision
        def run_replica(temp, k):
            sim = mt.Langevin(dt=0.001, temperature=temp, friction=1.0)
            final = mt.simulate_differentiable(s, sim, 6, key=k)
            return mt.potential_energy(final)

        k1, k2 = jax.random.split(key)
        e1 = run_replica(temps[0], k1)
        e2 = run_replica(temps[1], k2)
        # Metropolis exchange weight as a smooth observable
        beta = 1.0 / (mt.units.KB * temps)
        w = jnp.exp(jnp.minimum((beta[0] - beta[1]) * (e1 - e2), 0.0))
        return 0.5 * (e1 + e2) + 0.01 * w

    g = float(jax.grad(observable)(jnp.float64(0.2)))
    h = 1e-5
    fd = (float(observable(jnp.float64(0.2 + h)))
          - float(observable(jnp.float64(0.2 - h)))) / (2 * h)
    assert np.isfinite(g)
    assert g == pytest.approx(fd, rel=5e-3), (g, fd)
