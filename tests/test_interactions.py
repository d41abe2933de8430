"""Per-interaction checks: force = -dE/dr (finite differences), limiting
behavior, special-pair weighting, cutoffs, mixing rules.

Ports the behavior strategy of /root/reference/test/interactions.jl.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mollytpu as mt
from mollytpu.atoms import ALCH_DELETE
from mollytpu.units import COULOMB_CONST


def atom_view(mass=10.0, charge=0.3, sigma=0.3, epsilon=0.2, lam=1.0,
              atom_type=0, alch_role=0, buck=None):
    a = mt.make_atoms(n=1, mass=mass, charge=charge, sigma=sigma, epsilon=epsilon,
                      lam=lam, atom_type=atom_type, alch_role=alch_role,
                      buck_A=None if buck is None else buck[0],
                      buck_B=None if buck is None else buck[1],
                      buck_C=None if buck is None else buck[2],
                      dtype=jnp.float64)
    return a.view(0)


ALL_INTERS = [
    (mt.LennardJones(), {}),
    (mt.LennardJones(cutoff=mt.ShiftedPotentialCutoff(0.6)), {}),
    (mt.LennardJones(cutoff=mt.ShiftedForceCutoff(0.6)), {}),
    (mt.LennardJones(cutoff=mt.CubicSplineCutoff(0.4, 0.6)), {}),
    (mt.LennardJones(cutoff=mt.PolynomialCutoff(0.4, 0.6)), {}),
    (mt.LennardJonesSoftCoreBeutler(alpha=0.5), {"lam": 0.4, "alch_role": ALCH_DELETE}),
    (mt.LennardJonesSoftCoreGapsys(alpha=0.85), {"lam": 0.4, "alch_role": ALCH_DELETE}),
    (mt.AshbaughHatch(), {"lam": 0.7}),
    (mt.SoftSphere(), {}),
    (mt.Mie(m=6.0, n=12.0), {}),
    (mt.Buckingham(), {"buck": (10.0, 10.0, 1e-4)}),
    (mt.DoubleExponential(alpha=16.766, beta=4.427), {}),
    (mt.DoubleExponentialSoftCore(alpha=16.766, beta=4.427), {"lam": 0.4, "alch_role": ALCH_DELETE}),
    (mt.Gravity(G=1e-3), {}),
    (mt.Coulomb(), {}),
    (mt.CoulombScaled(), {"lam": 0.6, "alch_role": ALCH_DELETE}),
    (mt.CoulombReactionField(dist_cutoff=0.6), {}),
    (mt.CoulombReactionFieldScaled(dist_cutoff=0.6), {"lam": 0.6, "alch_role": ALCH_DELETE}),
    (mt.CoulombSoftCoreBeutler(), {"lam": 0.4, "alch_role": ALCH_DELETE}),
    (mt.CoulombSoftCoreGapsys(), {"lam": 0.4, "alch_role": ALCH_DELETE}),
    (mt.CoulombEwald(dist_cutoff=0.6, approximate_erfc=False), {}),
    (mt.CoulombEwaldScaled(dist_cutoff=0.6), {"lam": 0.6, "alch_role": ALCH_DELETE}),
    (mt.CoulombSoftCoreBeutlerEwald(dist_cutoff=0.6), {"lam": 0.4, "alch_role": ALCH_DELETE}),
    (mt.CoulombSoftCoreGapsysEwald(dist_cutoff=0.6), {"lam": 0.4, "alch_role": ALCH_DELETE}),
    (mt.CoulombSoftCoreBeutlerReactionField(dist_cutoff=0.6), {"lam": 0.4, "alch_role": ALCH_DELETE}),
    (mt.CoulombSoftCoreGapsysReactionField(dist_cutoff=0.6), {"lam": 0.4, "alch_role": ALCH_DELETE}),
    (mt.Yukawa(kappa=2.0), {}),
]


@pytest.mark.parametrize("inter,akw", ALL_INTERS,
                         ids=[type(i).__name__ + ("" if not isinstance(i.cutoff if hasattr(i, "cutoff") else None, object) or not hasattr(i, "cutoff") else "_" + type(i.cutoff).__name__) for i, _ in ALL_INTERS])
def test_pairwise_force_is_minus_grad(inter, akw):
    ai = atom_view(**akw)
    aj = atom_view(charge=-0.25, sigma=0.25, epsilon=0.3, **{k: v for k, v in akw.items() if k not in ("charge", "sigma", "epsilon")})
    e_fn = lambda r: inter.energy(r, ai, aj, jnp.asarray(False))
    g_fn = jax.grad(e_fn)
    # sample r values away from piecewise switch points
    for r0 in [0.21, 0.33, 0.45, 0.57]:
        r = jnp.asarray(r0, dtype=jnp.float64)
        h = 1e-6
        fd = (e_fn(r + h) - e_fn(r - h)) / (2 * h)
        an = g_fn(r)
        assert np.isfinite(float(an))
        assert float(jnp.abs(an - fd)) <= 1e-5 * max(1.0, abs(float(fd))), (
            f"{type(inter).__name__} at r={r0}: grad {float(an)} vs fd {float(fd)}")


def test_lj_minimum():
    inter = mt.LennardJones()
    ai = atom_view()
    aj = atom_view()
    r_min = 2 ** (1 / 6) * 0.3
    e = inter.energy(jnp.float64(r_min), ai, aj, False)
    assert float(e) == pytest.approx(-0.2, rel=1e-6)
    g = jax.grad(lambda r: inter.energy(r, ai, aj, False))(jnp.float64(r_min))
    assert abs(float(g)) < 1e-10


def test_lj_special_weight():
    inter = mt.LennardJones(weight_special=0.5)
    ai, aj = atom_view(), atom_view()
    r = jnp.float64(0.35)
    e_n = inter.energy(r, ai, aj, jnp.asarray(False))
    e_s = inter.energy(r, ai, aj, jnp.asarray(True))
    assert float(e_s) == pytest.approx(0.5 * float(e_n), rel=1e-12)


def test_coulomb_value():
    inter = mt.Coulomb()
    ai = atom_view(charge=1.0)
    aj = atom_view(charge=1.0)
    e = inter.energy(jnp.float64(1.0), ai, aj, False)
    assert float(e) == pytest.approx(COULOMB_CONST, rel=1e-10)


def test_softcore_reduces_to_lj_at_lambda1():
    lj = mt.LennardJones()
    for sc in (mt.LennardJonesSoftCoreBeutler(alpha=0.5),
               mt.LennardJonesSoftCoreGapsys(alpha=0.85)):
        ai, aj = atom_view(lam=1.0), atom_view(lam=1.0)
        for r0 in [0.25, 0.35, 0.5]:
            r = jnp.float64(r0)
            assert float(sc.energy(r, ai, aj, False)) == pytest.approx(
                float(lj.energy(r, ai, aj, False)), rel=1e-8)


def test_softcore_finite_at_zero_distance():
    sc = mt.LennardJonesSoftCoreBeutler(alpha=0.5)
    ai = atom_view(lam=0.5, alch_role=ALCH_DELETE)
    aj = atom_view(lam=0.5, alch_role=ALCH_DELETE)
    e = sc.energy(jnp.float64(1e-4), ai, aj, False)
    assert np.isfinite(float(e))


def test_reaction_field_zero_at_cutoff():
    inter = mt.CoulombReactionField(dist_cutoff=1.0, solvent_dielectric=jnp.inf)
    ai, aj = atom_view(charge=1.0), atom_view(charge=1.0)
    # with conducting boundary, E(rc) = ke qq (1/rc + rc^2/(2 rc^3) - 3/(2 rc)) = 0
    e = inter.energy(jnp.float64(1.0 - 1e-9), ai, aj, False)
    assert abs(float(e)) < 1e-5


def test_ewald_erfc_approx_close():
    exact = mt.CoulombEwald(dist_cutoff=1.0, approximate_erfc=False)
    approx = mt.CoulombEwald(dist_cutoff=1.0, approximate_erfc=True)
    ai, aj = atom_view(charge=0.5), atom_view(charge=-0.5)
    for r0 in [0.2, 0.5, 0.9]:
        r = jnp.float64(r0)
        assert float(approx.energy(r, ai, aj, False)) == pytest.approx(
            float(exact.energy(r, ai, aj, False)), abs=1e-4)


def test_mixing_rules():
    ai = atom_view(sigma=0.2, epsilon=0.1)
    aj = atom_view(sigma=0.4, epsilon=0.4)
    from mollytpu.ops.mixing import mix_sigma, mix_epsilon
    assert float(mix_sigma(mt.LorentzMixing(), ai, aj)) == pytest.approx(0.3)
    assert float(mix_sigma(mt.GeometricMixing(), ai, aj)) == pytest.approx(
        np.sqrt(0.08))
    assert float(mix_epsilon(mt.GeometricMixing(), ai, aj)) == pytest.approx(0.2)
    assert float(mix_epsilon(mt.FenderHalseyMixing(), ai, aj)) == pytest.approx(
        2 * 0.1 * 0.4 / 0.5)
    wh_sig = ((0.2 ** 6 + 0.4 ** 6) / 2) ** (1 / 6)
    assert float(mix_sigma(mt.WaldmanHaglerMixing(), ai, aj)) == pytest.approx(wh_sig)


def test_mixing_exception_nbfix():
    table = mt.ExceptionTable(
        keys_i=jnp.asarray([1], dtype=jnp.int32),
        keys_j=jnp.asarray([2], dtype=jnp.int32),
        values=jnp.asarray([0.999], dtype=jnp.float64),
    )
    rule = mt.MixingException(mixing=mt.LorentzMixing(), exceptions=table)
    a1 = atom_view(sigma=0.2, atom_type=1)
    a2 = atom_view(sigma=0.4, atom_type=2)
    a3 = atom_view(sigma=0.4, atom_type=3)
    from mollytpu.ops.mixing import mix_sigma
    assert float(mix_sigma(rule, a1, a2)) == pytest.approx(0.999)
    assert float(mix_sigma(rule, a2, a1)) == pytest.approx(0.999)
    assert float(mix_sigma(rule, a1, a3)) == pytest.approx(0.3)


def test_dpd_momentum_conservation():
    inter = mt.DPDInteraction(a=25.0, gamma=4.5, sigma=3.0, r_c=1.0, dt=0.01)
    dr = jnp.asarray([0.3, 0.2, 0.1], dtype=jnp.float64)
    r = jnp.linalg.norm(dr)
    ai, aj = atom_view(), atom_view()
    vi = jnp.asarray([0.1, -0.2, 0.3])
    vj = jnp.asarray([-0.1, 0.0, 0.2])
    f_on_j = inter.force_vec(dr, r, jnp.int32(3), jnp.int32(7), ai, aj, vi, vj, False, 5)
    f_on_i_swapped = inter.force_vec(-dr, r, jnp.int32(7), jnp.int32(3), aj, ai, vj, vi, False, 5)
    # swapping i and j flips the force exactly (same noise, odd in dr)
    assert np.allclose(np.asarray(f_on_j), -np.asarray(f_on_i_swapped), atol=1e-12)
