"""Pairwise (non-bonded) interaction library.

TPU-native re-design of the reference's pairwise potentials
(/root/reference/src/interactions/*.jl). Each interaction is an immutable
pytree exposing one scalar method

    energy(r, ai, aj, special) -> kJ/mol

where ``r`` is the minimum-image distance (engine guarantees r > 0 for live
pairs), ``ai``/``aj`` are per-atom parameter views (mollytpu.atoms.Atoms with
scalar leaves) and ``special`` marks 1-4 pairs. Forces come from JAX autodiff
of the energy (force == -dE/dr by construction); the fused Pallas fast path
re-implements the hottest forms (LJ + Coulomb/RF) by hand.

All branching is jnp.where with operands kept finite on both sides (the
"safe-where" rule), so gradients never see NaN from masked lanes.

Reference parity (file: /root/reference/src/interactions/...):
  LennardJones, LJ soft-core Beutler/Gapsys, AshbaughHatch  lennard_jones.jl
  Coulomb family incl. reaction field / Ewald real-space /
  soft-core combos / scaled (alchemical) / Yukawa            coulomb.jl
  Mie, SoftSphere, Buckingham, DoubleExponential(SoftCore),
  Gravity, DPDInteraction                                    respective files
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..units import COULOMB_CONST
from ..free_energy.alchemy import (
    DefaultLambdaScheduler, sterics_lambda, elec_lambda, scaled_charge,
)
from .cutoffs import NoCutoff, cutoff_distance
from .mixing import (
    LorentzMixing, GeometricMixing, MinimumMixing, mix_sigma, mix_epsilon, mix_lambda,
)

CRF_SOLVENT_DIELECTRIC = 78.3  # coulomb.jl:676


def _register(cls, data_fields, meta_fields=()):
    jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )
    return cls


def _lam(a):
    return 1.0 if a.lam is None else a.lam


def _role(a):
    return 0 if a.alch_role is None else a.alch_role


def _w_special(special, weight):
    return jnp.where(special, weight, 1.0)


def _lj_shortcut(ai, aj):
    """Zero-out pairs with zero sigma/epsilon/lambda (mixing.jl LJZeroShortcut)."""
    ok = (ai.epsilon != 0) & (aj.epsilon != 0) & (ai.sigma != 0) & (aj.sigma != 0)
    li, lj = _lam(ai), _lam(aj)
    return ok & (li != 0) & (lj != 0)


def _safe_fracpow(x, p):
    """x**p (0 < p < 1, x >= 0) with a well-defined zero gradient at x == 0.

    d/dx x**p is infinite at 0, so a plain ``x**p`` turns any upstream
    zero-cotangent into NaN under reverse-mode AD (inf * 0) — this bites the
    Gapsys soft-core families at sterics/elec lambda == 1, where the soft-core
    radius argument is exactly 0 and parameter gradients of a differentiable
    alchemical simulation silently NaN."""
    pos = x > 0
    return jnp.where(pos, jnp.where(pos, x, 1.0) ** p, 0.0)


# ---------------------------------------------------------------------------
# Lennard-Jones family


@dataclasses.dataclass(frozen=True)
class LennardJones:
    """4 eps ((s/r)^12 - (s/r)^6) (lennard_jones.jl:33-160)."""

    cutoff: object = NoCutoff()
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    sigma_mixing: object = dataclasses.field(default=LorentzMixing(), metadata={"static": True})
    epsilon_mixing: object = dataclasses.field(default=GeometricMixing(), metadata={"static": True})
    weight_special: float = 1.0

    def energy(self, r, ai, aj, special):
        sig = mix_sigma(self.sigma_mixing, ai, aj)
        eps = mix_epsilon(self.epsilon_mixing, ai, aj)

        def u(rr):
            six = (sig / rr) ** 6
            return 4.0 * eps * (six * six - six)

        e = self.cutoff.apply(u, r)
        e = jnp.where(_lj_shortcut(ai, aj), e, 0.0)
        return e * _w_special(special, self.weight_special)


_register(LennardJones, ["cutoff"],
          ["weight_special", "use_neighbors", "sigma_mixing", "epsilon_mixing"])


@dataclasses.dataclass(frozen=True)
class LennardJonesSoftCoreBeutler:
    """Beutler soft-core LJ: U = l*(C12/R6^2 - C6/R6), R6 = a(1-l)s^6 + r^6
    (lennard_jones.jl:300-520). Reduces to LennardJones at lambda = 1."""

    cutoff: object = NoCutoff()
    alpha: float = 1.0
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    sigma_mixing: object = dataclasses.field(default=LorentzMixing(), metadata={"static": True})
    epsilon_mixing: object = dataclasses.field(default=GeometricMixing(), metadata={"static": True})
    lambda_mixing: object = dataclasses.field(default=MinimumMixing(), metadata={"static": True})
    scheduler: object = dataclasses.field(default=DefaultLambdaScheduler(), metadata={"static": True})
    weight_special: float = 1.0

    def energy(self, r, ai, aj, special):
        lam_glob = mix_lambda(self.lambda_mixing, ai, aj)
        lam = sterics_lambda(self.scheduler, lam_glob, _role(ai), _role(aj))
        sig = mix_sigma(self.sigma_mixing, ai, aj)
        eps = mix_epsilon(self.epsilon_mixing, ai, aj)
        sig6 = sig ** 6
        c6 = 4.0 * eps * sig6
        c12 = c6 * sig6
        shift = self.alpha * (1.0 - lam) * sig6

        def u(rr):
            r6 = shift + rr ** 6
            r6 = jnp.maximum(r6, 1e-12)
            return lam * (c12 / (r6 * r6) - c6 / r6)

        e = self.cutoff.apply(u, r)
        e = jnp.where(_lj_shortcut(ai, aj) & (lam > 0), e, 0.0)
        return e * _w_special(special, self.weight_special)


_register(LennardJonesSoftCoreBeutler, ["cutoff"],
          ["alpha", "weight_special", "use_neighbors", "sigma_mixing", "epsilon_mixing", "lambda_mixing", "scheduler"])


@dataclasses.dataclass(frozen=True)
class LennardJonesSoftCoreGapsys:
    """Gapsys et al. 2012 linear-quadratic soft-core LJ
    (lennard_jones.jl:525-745)."""

    cutoff: object = NoCutoff()
    alpha: float = 0.85
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    sigma_mixing: object = dataclasses.field(default=LorentzMixing(), metadata={"static": True})
    epsilon_mixing: object = dataclasses.field(default=GeometricMixing(), metadata={"static": True})
    lambda_mixing: object = dataclasses.field(default=MinimumMixing(), metadata={"static": True})
    scheduler: object = dataclasses.field(default=DefaultLambdaScheduler(), metadata={"static": True})
    weight_special: float = 1.0

    def energy(self, r, ai, aj, special):
        lam_glob = mix_lambda(self.lambda_mixing, ai, aj)
        lam = sterics_lambda(self.scheduler, lam_glob, _role(ai), _role(aj))
        sig = mix_sigma(self.sigma_mixing, ai, aj)
        eps = mix_epsilon(self.epsilon_mixing, ai, aj)
        sig6 = sig ** 6
        c6 = 4.0 * eps * sig6
        c12 = c6 * sig6
        # r_LJ = alpha * (26 C12 (1-lam) / (7 C6))^(1/6); 0 when lam = 1.
        ratio = jnp.where(c6 > 0, 26.0 * c12 * (1.0 - lam) / (7.0 * jnp.maximum(c6, 1e-30)), 0.0)
        r_lj = self.alpha * _safe_fracpow(ratio, 1.0 / 6.0)

        def u(rr):
            outer = c12 / rr ** 12 - c6 / rr ** 6
            rs = jnp.maximum(r_lj, 1e-6)
            inner = ((78.0 * c12 / rs ** 14 - 21.0 * c6 / rs ** 8) * rr ** 2
                     - (168.0 * c12 / rs ** 13 - 48.0 * c6 / rs ** 7) * rr
                     + 91.0 * c12 / rs ** 12 - 28.0 * c6 / rs ** 6)
            return lam * jnp.where(rr >= r_lj, outer, inner)

        e = self.cutoff.apply(u, r)
        e = jnp.where(_lj_shortcut(ai, aj) & (lam > 0), e, 0.0)
        return e * _w_special(special, self.weight_special)


_register(LennardJonesSoftCoreGapsys, ["cutoff"],
          ["alpha", "weight_special", "use_neighbors", "sigma_mixing", "epsilon_mixing", "lambda_mixing", "scheduler"])


@dataclasses.dataclass(frozen=True)
class AshbaughHatch:
    """Lambda-weighted LJ for coarse-grained IDP models
    (lennard_jones.jl:749-940): V_LJ + eps(1-l) below the minimum, l*V_LJ
    above."""

    cutoff: object = NoCutoff()
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    sigma_mixing: object = dataclasses.field(default=LorentzMixing(), metadata={"static": True})
    epsilon_mixing: object = dataclasses.field(default=GeometricMixing(), metadata={"static": True})
    lambda_mixing: object = dataclasses.field(default=LorentzMixing(), metadata={"static": True})
    weight_special: float = 1.0

    def energy(self, r, ai, aj, special):
        sig = mix_sigma(self.sigma_mixing, ai, aj)
        eps = mix_epsilon(self.epsilon_mixing, ai, aj)
        lam = mix_lambda(self.lambda_mixing, ai, aj)
        r_min = 2.0 ** (1.0 / 6.0) * sig

        def u(rr):
            six = (sig / rr) ** 6
            vlj = 4.0 * eps * (six * six - six)
            return jnp.where(rr <= r_min, vlj + eps * (1.0 - lam), lam * vlj)

        e = self.cutoff.apply(u, r)
        e = jnp.where((ai.epsilon != 0) & (aj.epsilon != 0), e, 0.0)
        return e * _w_special(special, self.weight_special)


_register(AshbaughHatch, ["cutoff"],
          ["weight_special", "use_neighbors", "sigma_mixing", "epsilon_mixing", "lambda_mixing"])


@dataclasses.dataclass(frozen=True)
class SoftSphere:
    """4 eps (s/r)^12 (soft_sphere.jl)."""

    cutoff: object = NoCutoff()
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    sigma_mixing: object = dataclasses.field(default=LorentzMixing(), metadata={"static": True})
    epsilon_mixing: object = dataclasses.field(default=GeometricMixing(), metadata={"static": True})

    def energy(self, r, ai, aj, special):
        sig = mix_sigma(self.sigma_mixing, ai, aj)
        eps = mix_epsilon(self.epsilon_mixing, ai, aj)

        def u(rr):
            return 4.0 * eps * (sig / rr) ** 12

        e = self.cutoff.apply(u, r)
        return jnp.where(_lj_shortcut(ai, aj), e, 0.0)


_register(SoftSphere, ["cutoff"],
          ["use_neighbors", "sigma_mixing", "epsilon_mixing"])


@dataclasses.dataclass(frozen=True)
class Mie:
    """Generalized (m, n) Mie potential (mie.jl)."""

    m: float = 6.0
    n: float = 12.0
    cutoff: object = NoCutoff()
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    sigma_mixing: object = dataclasses.field(default=LorentzMixing(), metadata={"static": True})
    epsilon_mixing: object = dataclasses.field(default=GeometricMixing(), metadata={"static": True})
    weight_special: float = 1.0

    def energy(self, r, ai, aj, special):
        m, n = self.m, self.n
        c = (n / (n - m)) * (n / m) ** (m / (n - m))
        sig = mix_sigma(self.sigma_mixing, ai, aj)
        eps = mix_epsilon(self.epsilon_mixing, ai, aj)

        def u(rr):
            s = sig / rr
            return c * eps * (s ** n - s ** m)

        e = self.cutoff.apply(u, r)
        e = jnp.where(_lj_shortcut(ai, aj), e, 0.0)
        return e * _w_special(special, self.weight_special)


_register(Mie, ["cutoff"],
          ["m", "n", "weight_special", "use_neighbors", "sigma_mixing", "epsilon_mixing"])


@dataclasses.dataclass(frozen=True)
class Buckingham:
    """A exp(-B r) - C/r^6 with per-atom A/B/C parameters (buckingham.jl)."""

    cutoff: object = NoCutoff()
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    weight_special: float = 1.0

    def energy(self, r, ai, aj, special):
        A = jnp.sqrt(ai.buck_A * aj.buck_A)
        Bi, Bj = ai.buck_B, aj.buck_B
        B = 2.0 / (1.0 / jnp.maximum(Bi, 1e-30) + 1.0 / jnp.maximum(Bj, 1e-30))
        C = jnp.sqrt(ai.buck_C * aj.buck_C)

        def u(rr):
            return A * jnp.exp(-B * rr) - C / rr ** 6

        e = self.cutoff.apply(u, r)
        live = ((ai.buck_A != 0) & (aj.buck_A != 0)) | ((ai.buck_C != 0) & (aj.buck_C != 0))
        e = jnp.where(live, e, 0.0)
        return e * _w_special(special, self.weight_special)


_register(Buckingham, ["cutoff"], ["weight_special", "use_neighbors"])


@dataclasses.dataclass(frozen=True)
class DoubleExponential:
    """Double-exponential potential (double_exponential.jl:1-165)."""

    alpha: float
    beta: float
    cutoff: object = NoCutoff()
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    sigma_mixing: object = dataclasses.field(default=LorentzMixing(), metadata={"static": True})
    epsilon_mixing: object = dataclasses.field(default=GeometricMixing(), metadata={"static": True})
    weight_special: float = 1.0

    def energy(self, r, ai, aj, special):
        a, b = self.alpha, self.beta
        sig = mix_sigma(self.sigma_mixing, ai, aj)
        eps = mix_epsilon(self.epsilon_mixing, ai, aj)
        rm = 2.0 ** (1.0 / 6.0) * sig

        def u(rr):
            rm_s = jnp.maximum(rm, 1e-12)
            ea = jnp.exp(a) * b / (a - b) * jnp.exp(-a * rr / rm_s)
            eb = jnp.exp(b) * a / (a - b) * jnp.exp(-b * rr / rm_s)
            return eps * (ea - eb)

        e = self.cutoff.apply(u, r)
        e = jnp.where(_lj_shortcut(ai, aj), e, 0.0)
        return e * _w_special(special, self.weight_special)


_register(DoubleExponential, ["cutoff"],
          ["alpha", "beta", "weight_special", "use_neighbors", "sigma_mixing", "epsilon_mixing"])


@dataclasses.dataclass(frozen=True)
class DoubleExponentialSoftCore:
    """Soft-core double exponential: lambda scales the depth and reshapes the
    exponents alpha_s = 1.1 + l(a - 1.1), beta_s = 1 + l(b - 1)
    (double_exponential.jl:166-360)."""

    alpha: float
    beta: float
    cutoff: object = NoCutoff()
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    sigma_mixing: object = dataclasses.field(default=LorentzMixing(), metadata={"static": True})
    epsilon_mixing: object = dataclasses.field(default=GeometricMixing(), metadata={"static": True})
    lambda_mixing: object = dataclasses.field(default=MinimumMixing(), metadata={"static": True})
    scheduler: object = dataclasses.field(default=DefaultLambdaScheduler(), metadata={"static": True})
    weight_special: float = 1.0

    def energy(self, r, ai, aj, special):
        lam_glob = mix_lambda(self.lambda_mixing, ai, aj)
        lam = sterics_lambda(self.scheduler, lam_glob, _role(ai), _role(aj))
        a_s = 1.1 + lam * (self.alpha - 1.1)
        b_s = 1.0 + lam * (self.beta - 1.0)
        sig = mix_sigma(self.sigma_mixing, ai, aj)
        eps = mix_epsilon(self.epsilon_mixing, ai, aj)
        rm = 2.0 ** (1.0 / 6.0) * sig

        def u(rr):
            rm_s = jnp.maximum(rm, 1e-12)
            denom = jnp.where(jnp.abs(a_s - b_s) > 1e-9, a_s - b_s, 1e-9)
            ea = jnp.exp(a_s) * b_s / denom * jnp.exp(-a_s * rr / rm_s)
            eb = jnp.exp(b_s) * a_s / denom * jnp.exp(-b_s * rr / rm_s)
            return lam * eps * (ea - eb)

        e = self.cutoff.apply(u, r)
        e = jnp.where(_lj_shortcut(ai, aj) & (lam > 0), e, 0.0)
        return e * _w_special(special, self.weight_special)


_register(DoubleExponentialSoftCore, ["cutoff"],
          ["alpha", "beta", "weight_special", "use_neighbors", "sigma_mixing", "epsilon_mixing", "lambda_mixing", "scheduler"])


@dataclasses.dataclass(frozen=True)
class Gravity:
    """-G m_i m_j / r (gravity.jl). G in internal units."""

    G: float = 1.0
    cutoff: object = NoCutoff()
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})

    def energy(self, r, ai, aj, special):
        def u(rr):
            return -self.G * ai.mass * aj.mass / rr

        return self.cutoff.apply(u, r)


_register(Gravity, ["cutoff"], ["G", "use_neighbors"])


# ---------------------------------------------------------------------------
# Coulomb family


@dataclasses.dataclass(frozen=True)
class Coulomb:
    """ke q_i q_j / r (coulomb.jl:21-120)."""

    cutoff: object = NoCutoff()
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    weight_special: float = 1.0
    coulomb_const: float = COULOMB_CONST

    def energy(self, r, ai, aj, special):
        ke = self.coulomb_const
        qq = ai.charge * aj.charge

        def u(rr):
            return ke * qq / rr

        return self.cutoff.apply(u, r) * _w_special(special, self.weight_special)


_register(Coulomb, ["cutoff"], ["weight_special", "coulomb_const", "use_neighbors"])


@dataclasses.dataclass(frozen=True)
class CoulombScaled:
    """Coulomb with alchemically scaled charges (coulomb.jl:122-270)."""

    cutoff: object = NoCutoff()
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    scheduler: object = dataclasses.field(default=DefaultLambdaScheduler(), metadata={"static": True})
    weight_special: float = 1.0
    coulomb_const: float = COULOMB_CONST

    def energy(self, r, ai, aj, special):
        ke = self.coulomb_const
        qi = scaled_charge(self.scheduler, ai.charge, _lam(ai), _role(ai))
        qj = scaled_charge(self.scheduler, aj.charge, _lam(aj), _role(aj))
        qq = qi * qj

        def u(rr):
            return ke * qq / rr

        return self.cutoff.apply(u, r) * _w_special(special, self.weight_special)


_register(CoulombScaled, ["cutoff"],
          ["weight_special", "coulomb_const", "use_neighbors", "scheduler"])


def _rf_constants(dist_cutoff, solvent_dielectric):
    rc3 = dist_cutoff ** 3
    if math.isinf(solvent_dielectric):
        krf = 1.0 / (2.0 * rc3)
        crf = 3.0 / (2.0 * dist_cutoff)
    else:
        krf = (1.0 / rc3) * (solvent_dielectric - 1.0) / (2.0 * solvent_dielectric + 1.0)
        crf = (1.0 / dist_cutoff) * 3.0 * solvent_dielectric / (2.0 * solvent_dielectric + 1.0)
    return krf, crf


@dataclasses.dataclass(frozen=True)
class CoulombReactionField:
    """ke q_i q_j (1/r + krf r^2 - crf) inside the cutoff; 1-4 (special)
    pairs use plain weighted Coulomb without the reaction field
    (coulomb.jl:678-815)."""

    dist_cutoff: float = 1.0
    solvent_dielectric: float = CRF_SOLVENT_DIELECTRIC
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    weight_special: float = 1.0
    coulomb_const: float = COULOMB_CONST

    def energy(self, r, ai, aj, special):
        ke = self.coulomb_const
        qq = ai.charge * aj.charge
        krf, crf = _rf_constants(self.dist_cutoff, self.solvent_dielectric)
        rs = jnp.minimum(r, self.dist_cutoff)
        e_rf = ke * qq * (1.0 / rs + krf * rs * rs - crf)
        e_plain = ke * qq / rs * self.weight_special
        e = jnp.where(special, e_plain, e_rf)
        return jnp.where(r <= self.dist_cutoff, e, 0.0)


_register(CoulombReactionField, [],
          ["dist_cutoff", "solvent_dielectric", "weight_special", "coulomb_const",
           "use_neighbors"])


@dataclasses.dataclass(frozen=True)
class CoulombReactionFieldScaled:
    """Reaction field with alchemically scaled charges (coulomb.jl:817-935)."""

    dist_cutoff: float = 1.0
    solvent_dielectric: float = CRF_SOLVENT_DIELECTRIC
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    scheduler: object = dataclasses.field(default=DefaultLambdaScheduler(), metadata={"static": True})
    weight_special: float = 1.0
    coulomb_const: float = COULOMB_CONST

    def energy(self, r, ai, aj, special):
        qi = scaled_charge(self.scheduler, ai.charge, _lam(ai), _role(ai))
        qj = scaled_charge(self.scheduler, aj.charge, _lam(aj), _role(aj))
        ke = self.coulomb_const
        qq = qi * qj
        krf, crf = _rf_constants(self.dist_cutoff, self.solvent_dielectric)
        rs = jnp.minimum(r, self.dist_cutoff)
        e_rf = ke * qq * (1.0 / rs + krf * rs * rs - crf)
        e_plain = ke * qq / rs * self.weight_special
        e = jnp.where(special, e_plain, e_rf)
        return jnp.where(r <= self.dist_cutoff, e, 0.0)


_register(CoulombReactionFieldScaled, [],
          ["dist_cutoff", "solvent_dielectric", "weight_special", "coulomb_const",
           "use_neighbors", "scheduler"])


@dataclasses.dataclass(frozen=True)
class CoulombSoftCoreBeutler:
    """Beutler soft-core Coulomb: U = l ke q_i q_j / rQ^(1/6),
    rQ = a(1-l) C12/C6 + r^6 (coulomb.jl:272-480)."""

    cutoff: object = NoCutoff()
    alpha: float = 1.0
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    sigma_mixing: object = dataclasses.field(default=LorentzMixing(), metadata={"static": True})
    epsilon_mixing: object = dataclasses.field(default=GeometricMixing(), metadata={"static": True})
    lambda_mixing: object = dataclasses.field(default=MinimumMixing(), metadata={"static": True})
    scheduler: object = dataclasses.field(default=DefaultLambdaScheduler(), metadata={"static": True})
    weight_special: float = 1.0
    coulomb_const: float = COULOMB_CONST

    def energy(self, r, ai, aj, special):
        lam_glob = mix_lambda(self.lambda_mixing, ai, aj)
        lam = elec_lambda(self.scheduler, lam_glob, _role(ai), _role(aj))
        sig = mix_sigma(self.sigma_mixing, ai, aj)
        # C12/C6 = sigma^6
        shift = self.alpha * (1.0 - lam) * sig ** 6
        ke = self.coulomb_const
        qq = ai.charge * aj.charge

        def u(rr):
            rq = shift + rr ** 6
            return lam * ke * qq / jnp.maximum(rq, 1e-18) ** (1.0 / 6.0)

        e = self.cutoff.apply(u, r)
        e = jnp.where(lam > 0, e, 0.0)
        return e * _w_special(special, self.weight_special)


_register(CoulombSoftCoreBeutler, ["cutoff"],
          ["alpha", "weight_special", "coulomb_const", "use_neighbors", "sigma_mixing", "epsilon_mixing", "lambda_mixing", "scheduler"])


@dataclasses.dataclass(frozen=True)
class CoulombSoftCoreGapsys:
    """Gapsys soft-core Coulomb: quadratic inner region below
    r_Q = a (1-l)^(1/6) (1 + sQ |q_i q_j|) (coulomb.jl:482-675)."""

    cutoff: object = NoCutoff()
    alpha: float = 0.3
    sigma_q: float = 1.0
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    lambda_mixing: object = dataclasses.field(default=MinimumMixing(), metadata={"static": True})
    scheduler: object = dataclasses.field(default=DefaultLambdaScheduler(), metadata={"static": True})
    weight_special: float = 1.0
    coulomb_const: float = COULOMB_CONST

    def energy(self, r, ai, aj, special):
        lam_glob = mix_lambda(self.lambda_mixing, ai, aj)
        lam = elec_lambda(self.scheduler, lam_glob, _role(ai), _role(aj))
        ke = self.coulomb_const
        qq = ai.charge * aj.charge
        rq = self.alpha * _safe_fracpow(1.0 - lam, 1.0 / 6.0) * (1.0 + self.sigma_q * jnp.abs(qq))

        def u(rr):
            outer = ke * qq / rr
            rqs = jnp.maximum(rq, 1e-9)
            inner = ke * (qq / rqs ** 3 * rr ** 2 - 3.0 * qq / rqs ** 2 * rr + 3.0 * qq / rqs)
            return lam * jnp.where(rr >= rq, outer, inner)

        e = self.cutoff.apply(u, r)
        e = jnp.where(lam > 0, e, 0.0)
        return e * _w_special(special, self.weight_special)


_register(CoulombSoftCoreGapsys, ["cutoff"],
          ["alpha", "sigma_q", "weight_special", "coulomb_const",
           "use_neighbors", "lambda_mixing", "scheduler"])


def _erfc(x, approximate):
    if approximate:
        # Abramowitz & Stegun 7.1.26 / Hastings, as used by OpenMM and the
        # reference (coulomb.jl:1384-1393).
        t = 1.0 / (1.0 + 0.3275911 * x)
        poly = (0.254829592 + (-0.284496736 + (1.421413741 +
                (-1.453152027 + 1.061405429 * t) * t) * t) * t) * t
        return poly * jnp.exp(-x * x)
    return jax.scipy.special.erfc(x)


def ewald_alpha(dist_cutoff, error_tol=0.0005):
    """alpha = sqrt(-log(2 tol)) / r_c (coulomb.jl:1332, OpenMM convention)."""
    return math.sqrt(-math.log(2.0 * error_tol)) / dist_cutoff


@dataclasses.dataclass(frozen=True)
class CoulombEwald:
    """Real-space Ewald part ke q_i q_j erfc(alpha r)/r; special (1-4) pairs
    get plain weighted Coulomb, their reciprocal-space compensation is handled
    by EwaldExclusion terms (coulomb.jl:1280-1441)."""

    dist_cutoff: float = 1.0
    error_tol: float = 0.0005
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    weight_special: float = 1.0
    coulomb_const: float = COULOMB_CONST
    alpha: float = None
    approximate_erfc: bool = dataclasses.field(default=True, metadata={"static": True})

    def __post_init__(self):
        if self.alpha is None:
            object.__setattr__(self, "alpha", ewald_alpha(self.dist_cutoff, self.error_tol))

    def energy(self, r, ai, aj, special):
        ke = self.coulomb_const
        qq = ai.charge * aj.charge
        rs = jnp.minimum(r, self.dist_cutoff)
        base = ke * qq / rs
        e = jnp.where(special,
                      base * self.weight_special,
                      base * _erfc(self.alpha * rs, self.approximate_erfc))
        return jnp.where(r <= self.dist_cutoff, e, 0.0)


_register(CoulombEwald, [],
          ["dist_cutoff", "error_tol", "weight_special", "coulomb_const", "alpha",
           "use_neighbors", "approximate_erfc"])


@dataclasses.dataclass(frozen=True)
class CoulombEwaldScaled:
    """Real-space Ewald with alchemically scaled charges (coulomb.jl:1443-1600)."""

    dist_cutoff: float = 1.0
    error_tol: float = 0.0005
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    scheduler: object = dataclasses.field(default=DefaultLambdaScheduler(), metadata={"static": True})
    weight_special: float = 1.0
    coulomb_const: float = COULOMB_CONST
    alpha: float = None
    approximate_erfc: bool = dataclasses.field(default=True, metadata={"static": True})

    def __post_init__(self):
        if self.alpha is None:
            object.__setattr__(self, "alpha", ewald_alpha(self.dist_cutoff, self.error_tol))

    def energy(self, r, ai, aj, special):
        ke = self.coulomb_const
        qi = scaled_charge(self.scheduler, ai.charge, _lam(ai), _role(ai))
        qj = scaled_charge(self.scheduler, aj.charge, _lam(aj), _role(aj))
        qq = qi * qj
        rs = jnp.minimum(r, self.dist_cutoff)
        base = ke * qq / rs
        e = jnp.where(special,
                      base * self.weight_special,
                      base * _erfc(self.alpha * rs, self.approximate_erfc))
        return jnp.where(r <= self.dist_cutoff, e, 0.0)


_register(CoulombEwaldScaled, [],
          ["dist_cutoff", "error_tol", "weight_special", "coulomb_const", "alpha",
           "use_neighbors", "scheduler", "approximate_erfc"])


@dataclasses.dataclass(frozen=True)
class CoulombSoftCoreBeutlerEwald:
    """Beutler soft-core real-space Ewald (coulomb.jl:930-1130): the 1/r part
    is soft-cored via rQ while the erfc screening uses the true distance."""

    dist_cutoff: float = 1.0
    error_tol: float = 0.0005
    alpha_sc: float = 1.0
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    sigma_mixing: object = dataclasses.field(default=LorentzMixing(), metadata={"static": True})
    lambda_mixing: object = dataclasses.field(default=MinimumMixing(), metadata={"static": True})
    scheduler: object = dataclasses.field(default=DefaultLambdaScheduler(), metadata={"static": True})
    weight_special: float = 1.0
    coulomb_const: float = COULOMB_CONST
    alpha: float = None
    approximate_erfc: bool = dataclasses.field(default=True, metadata={"static": True})

    def __post_init__(self):
        if self.alpha is None:
            object.__setattr__(self, "alpha", ewald_alpha(self.dist_cutoff, self.error_tol))

    def energy(self, r, ai, aj, special):
        lam_glob = mix_lambda(self.lambda_mixing, ai, aj)
        lam = elec_lambda(self.scheduler, lam_glob, _role(ai), _role(aj))
        sig = mix_sigma(self.sigma_mixing, ai, aj)
        shift = self.alpha_sc * (1.0 - lam) * sig ** 6
        ke = self.coulomb_const
        qq = ai.charge * aj.charge
        rs = jnp.minimum(r, self.dist_cutoff)
        r_eff = jnp.maximum(shift + rs ** 6, 1e-18) ** (1.0 / 6.0)
        base = lam * ke * qq / r_eff
        e = jnp.where(special,
                      base * self.weight_special,
                      base * _erfc(self.alpha * rs, self.approximate_erfc))
        e = jnp.where(lam > 0, e, 0.0)
        return jnp.where(r <= self.dist_cutoff, e, 0.0)


_register(CoulombSoftCoreBeutlerEwald, [],
          ["dist_cutoff", "error_tol", "alpha_sc", "weight_special", "coulomb_const", "alpha",
           "use_neighbors", "sigma_mixing", "lambda_mixing", "scheduler", "approximate_erfc"])


@dataclasses.dataclass(frozen=True)
class CoulombSoftCoreGapsysEwald:
    """Gapsys soft-core real-space Ewald (coulomb.jl:1132-1275)."""

    dist_cutoff: float = 1.0
    error_tol: float = 0.0005
    alpha_sc: float = 0.3
    sigma_q: float = 1.0
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    lambda_mixing: object = dataclasses.field(default=MinimumMixing(), metadata={"static": True})
    scheduler: object = dataclasses.field(default=DefaultLambdaScheduler(), metadata={"static": True})
    weight_special: float = 1.0
    coulomb_const: float = COULOMB_CONST
    alpha: float = None
    approximate_erfc: bool = dataclasses.field(default=True, metadata={"static": True})

    def __post_init__(self):
        if self.alpha is None:
            object.__setattr__(self, "alpha", ewald_alpha(self.dist_cutoff, self.error_tol))

    def energy(self, r, ai, aj, special):
        lam_glob = mix_lambda(self.lambda_mixing, ai, aj)
        lam = elec_lambda(self.scheduler, lam_glob, _role(ai), _role(aj))
        ke = self.coulomb_const
        qq = ai.charge * aj.charge
        rq = self.alpha_sc * _safe_fracpow(1.0 - lam, 1.0 / 6.0) * (1.0 + self.sigma_q * jnp.abs(qq))
        rs = jnp.minimum(r, self.dist_cutoff)
        rqs = jnp.maximum(rq, 1e-9)
        outer = ke * qq / rs
        inner = ke * (qq / rqs ** 3 * rs ** 2 - 3.0 * qq / rqs ** 2 * rs + 3.0 * qq / rqs)
        base = lam * jnp.where(rs >= rq, outer, inner)
        e = jnp.where(special,
                      base * self.weight_special,
                      base * _erfc(self.alpha * rs, self.approximate_erfc))
        e = jnp.where(lam > 0, e, 0.0)
        return jnp.where(r <= self.dist_cutoff, e, 0.0)


_register(CoulombSoftCoreGapsysEwald, [],
          ["dist_cutoff", "error_tol", "alpha_sc", "sigma_q", "weight_special",
           "coulomb_const", "alpha", "use_neighbors", "lambda_mixing", "scheduler",
           "approximate_erfc"])


@dataclasses.dataclass(frozen=True)
class CoulombSoftCoreBeutlerReactionField:
    """Beutler soft-core + reaction field (coulomb.jl exported combo):
    soft-cored 1/r term plus lambda-scaled krf r^2 - crf reaction-field
    correction inside the cutoff."""

    dist_cutoff: float = 1.0
    solvent_dielectric: float = CRF_SOLVENT_DIELECTRIC
    alpha: float = 1.0
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    sigma_mixing: object = dataclasses.field(default=LorentzMixing(), metadata={"static": True})
    lambda_mixing: object = dataclasses.field(default=MinimumMixing(), metadata={"static": True})
    scheduler: object = dataclasses.field(default=DefaultLambdaScheduler(), metadata={"static": True})
    weight_special: float = 1.0
    coulomb_const: float = COULOMB_CONST

    def energy(self, r, ai, aj, special):
        lam_glob = mix_lambda(self.lambda_mixing, ai, aj)
        lam = elec_lambda(self.scheduler, lam_glob, _role(ai), _role(aj))
        sig = mix_sigma(self.sigma_mixing, ai, aj)
        shift = self.alpha * (1.0 - lam) * sig ** 6
        ke = self.coulomb_const
        qq = ai.charge * aj.charge
        krf, crf = _rf_constants(self.dist_cutoff, self.solvent_dielectric)
        rs = jnp.minimum(r, self.dist_cutoff)
        r_eff = jnp.maximum(shift + rs ** 6, 1e-18) ** (1.0 / 6.0)
        e_rf = lam * ke * qq * (1.0 / r_eff + krf * rs * rs - crf)
        e_plain = lam * ke * qq / r_eff * self.weight_special
        e = jnp.where(special, e_plain, e_rf)
        e = jnp.where(lam > 0, e, 0.0)
        return jnp.where(r <= self.dist_cutoff, e, 0.0)


_register(CoulombSoftCoreBeutlerReactionField, [],
          ["dist_cutoff", "solvent_dielectric", "alpha", "weight_special", "coulomb_const",
           "use_neighbors", "sigma_mixing", "lambda_mixing", "scheduler"])


@dataclasses.dataclass(frozen=True)
class CoulombSoftCoreGapsysReactionField:
    """Gapsys soft-core + reaction field (coulomb.jl exported combo)."""

    dist_cutoff: float = 1.0
    solvent_dielectric: float = CRF_SOLVENT_DIELECTRIC
    alpha: float = 0.3
    sigma_q: float = 1.0
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    lambda_mixing: object = dataclasses.field(default=MinimumMixing(), metadata={"static": True})
    scheduler: object = dataclasses.field(default=DefaultLambdaScheduler(), metadata={"static": True})
    weight_special: float = 1.0
    coulomb_const: float = COULOMB_CONST

    def energy(self, r, ai, aj, special):
        lam_glob = mix_lambda(self.lambda_mixing, ai, aj)
        lam = elec_lambda(self.scheduler, lam_glob, _role(ai), _role(aj))
        ke = self.coulomb_const
        qq = ai.charge * aj.charge
        rq = self.alpha * _safe_fracpow(1.0 - lam, 1.0 / 6.0) * (1.0 + self.sigma_q * jnp.abs(qq))
        krf, crf = _rf_constants(self.dist_cutoff, self.solvent_dielectric)
        rs = jnp.minimum(r, self.dist_cutoff)
        rqs = jnp.maximum(rq, 1e-9)
        outer = qq / rs
        inner = qq / rqs ** 3 * rs ** 2 - 3.0 * qq / rqs ** 2 * rs + 3.0 * qq / rqs
        core = jnp.where(rs >= rq, outer, inner)
        e_rf = lam * ke * (core + qq * (krf * rs * rs - crf))
        e_plain = lam * ke * core * self.weight_special
        e = jnp.where(special, e_plain, e_rf)
        e = jnp.where(lam > 0, e, 0.0)
        return jnp.where(r <= self.dist_cutoff, e, 0.0)


_register(CoulombSoftCoreGapsysReactionField, [],
          ["dist_cutoff", "solvent_dielectric", "alpha", "sigma_q", "weight_special",
           "coulomb_const", "use_neighbors", "lambda_mixing", "scheduler"])


@dataclasses.dataclass(frozen=True)
class Yukawa:
    """Screened Coulomb ke q_i q_j exp(-kappa r)/r (coulomb.jl:1920-2020)."""

    cutoff: object = NoCutoff()
    use_neighbors: bool = dataclasses.field(default=False, metadata={"static": True})
    weight_special: float = 1.0
    coulomb_const: float = COULOMB_CONST
    kappa: float = 1.0

    def energy(self, r, ai, aj, special):
        ke = self.coulomb_const
        qq = ai.charge * aj.charge

        def u(rr):
            return ke * qq * jnp.exp(-self.kappa * rr) / rr

        return self.cutoff.apply(u, r) * _w_special(special, self.weight_special)


_register(Yukawa, ["cutoff"],
          ["weight_special", "coulomb_const", "kappa", "use_neighbors"])


# ---------------------------------------------------------------------------
# DPD — velocity-dependent, handled through the explicit-force path


@dataclasses.dataclass(frozen=True)
class DPDInteraction:
    """Groot-Warren dissipative particle dynamics (dpd.jl).

    Non-conservative: implements `force_vec` (called with velocities and a
    per-step counter-based RNG seed) instead of the energy-autodiff path.
    `energy` returns the conservative part only, as in the reference.
    Pairwise noise is derived from a counter-based hash of (i, j, step, seed)
    so it is identical for both members of the pair (momentum conserving) and
    replayable — the same design as the reference's dpd_gaussian.
    """

    a: float = 25.0
    gamma: float = 4.5
    sigma: float = 3.0
    r_c: float = 1.0
    dt: float = 0.01
    use_neighbors: bool = dataclasses.field(default=True, metadata={"static": True})
    seed: int = dataclasses.field(default=0x9E3779B9, metadata={"static": True})

    uses_velocity = True

    def energy(self, r, ai, aj, special):
        w = 1.0 - r / self.r_c
        e = 0.5 * self.a * self.r_c * w * w
        return jnp.where(r < self.r_c, e, 0.0)

    def _xi(self, i, j, step_n):
        """Standard-normal pairwise noise from a counter-based hash."""
        lo = jnp.minimum(i, j).astype(jnp.uint32)
        hi = jnp.maximum(i, j).astype(jnp.uint32)
        h = jnp.uint32(self.seed & 0xFFFFFFFF)
        for v in (lo, hi, jnp.asarray(step_n, dtype=jnp.uint32)):
            h = (h ^ v) * jnp.uint32(0x85EBCA6B)
            h = (h ^ (h >> 13)) * jnp.uint32(0xC2B2AE35)
            h = h ^ (h >> 16)
        h2 = (h ^ jnp.uint32(0x68E31DA4)) * jnp.uint32(0x85EBCA6B)
        h2 = (h2 ^ (h2 >> 13)) * jnp.uint32(0xC2B2AE35)
        u1 = (h.astype(jnp.float32) + 1.0) / 4294967296.0
        u2 = h2.astype(jnp.float32) / 4294967296.0
        return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)

    def force_vec(self, dr, r, i, j, ai, aj, vi, vj, special, step_n):
        """Force on atom j (Molly convention: added to j, subtracted from i)."""
        rc = self.r_c
        rs = jnp.maximum(r, 1e-10)
        w_r = 1.0 - rs / rc
        w_d = w_r * w_r
        inv_r = 1.0 / rs
        f_c = self.a * w_r * inv_r
        v_rel = vi - vj
        rdotv = jnp.dot(dr, v_rel) * inv_r * inv_r
        f_d = self.gamma * w_d * rdotv
        xi = self._xi(i, j, step_n)
        f_r = self.sigma * w_r * xi / jnp.sqrt(self.dt) * inv_r
        live = (r < rc) & (r > 0)
        return jnp.where(live, (f_c + f_d + f_r), 0.0) * dr


_register(DPDInteraction, [],
          ["a", "gamma", "sigma", "r_c", "dt", "use_neighbors", "seed"])


def interaction_cutoff(inter):
    """Outer radius an interaction needs from the neighbor list, or None."""
    if hasattr(inter, "dist_cutoff"):
        return float(inter.dist_cutoff)
    if hasattr(inter, "r_c"):
        return float(inter.r_c)
    if hasattr(inter, "cutoff"):
        return cutoff_distance(inter.cutoff)
    return None
