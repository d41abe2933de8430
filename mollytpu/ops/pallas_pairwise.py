"""Pallas TPU kernel for the nonbonded hot path.

The TPU analogue of the reference's hand-tuned CUDA force kernel
(ext/MollyCUDAExt.jl:1595-2045): one 128x128 atom-block pair tile per grid
step (the VPU-lane-sized counterpart of the reference's 32x32 warp tiles),
with the interacting-block list scalar-prefetched so block indices drive the
input DMA (PrefetchScalarGridSpec), i-block forces accumulated in VMEM across
the j dimension, exclusions tested branch-free against per-atom id tables,
and energy/virial reduced into SMEM scalars. HALF-ORIENTATION lists: each
cross-block pair is evaluated ONCE (the finder lists only blocks J >= I);
the kernel emits per-lane j-side partial forces as a second output — the
TPU analogue of the reference's shared-memory opposite-force accumulation
(opposites_sum, ext/MollyCUDAExt.jl:1595-2045) — which a rebuild-static
occurrence-window gather (BlockPairs.occ_idx) reduces to per-atom forces
with no scatter anywhere. Intra-block pairs (J == I) are evaluated in both
orderings inside the one self tile and emit no j-partials.

Supported fused interactions (the production biomolecular set): LennardJones
with No/Distance/ShiftedPotential/ShiftedForce cutoffs (Lorentz sigma /
geometric epsilon mixing) + one of Coulomb / CoulombReactionField /
CoulombEwald, with 1-4 special weighting. Anything else falls back to the
XLA cell-tile path (forces.py dispatch).

On CPU the kernel runs in interpreter mode so tests validate identical
semantics without TPU hardware.
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blockpairs import (BLOCK as _DEFAULT_BLOCK, LANES as _DEFAULT_LANES,
                         BlockPairs, BlockPairFinder)
from . import cutoffs as cut
from . import pairwise as pw
from .mixing import LorentzMixing, GeometricMixing

INV_SQRT_PI = 1.0 / math.sqrt(math.pi)


@dataclasses.dataclass(frozen=True)
class FusedSpec:
    """Static description of the fused pair interaction for the kernel."""

    lj_mode: int = 0        # 0 none, 1 distance, 2 shifted-pot, 3 shifted-force, 4 no-cutoff
    lj_rc: float = 0.0
    lj_w: float = 1.0       # 1-4 weight
    coul_mode: int = 0      # 0 none, 1 plain, 2 reaction field, 3 ewald real
    coul_rc: float = 0.0
    ke: float = 0.0
    krf: float = 0.0
    crf: float = 0.0
    alpha: float = 0.0
    coul_w: float = 1.0
    cut_max: float = 1.0    # outer radius for the block culling
    # Ewald real-space via two degree-14 polynomials in t = r/cut_max:
    # E(t) ~ erfc(alpha r) and H(t) ~ erfc(alpha r)
    # + (2/sqrt(pi)) alpha r exp(-(alpha r)^2) — replaces the in-kernel
    # divide + exp + rational erfc (~35 VPU cycles) with 28 FMAs at better
    # accuracy (<6e-7 abs) than the Abramowitz-Stegun form.
    erfc_e: tuple = ()      # Horner coefficients, highest degree first
    erfc_h: tuple = ()
    # -- alchemical extension (the free-energy production path) --------------
    # lj_kind:  0 plain, 1 Beutler soft-core, 2 Gapsys soft-core
    # coul_sc:  0 none,  1 Beutler soft-core, 2 Gapsys soft-core (combined
    #           with coul_mode: 1 -> soft-cored 1/r, 3 -> soft-cored Ewald)
    # scale_q:  per-atom charges pre-scaled by scale_elec outside the kernel
    #           (the Scaled Coulomb family)
    lj_kind: int = 0
    lj_alpha: float = 0.0
    coul_sc: int = 0
    coul_alpha_sc: float = 0.0
    coul_sigma_q: float = 0.0
    scale_q: bool = False
    scheduler: object = None     # stateless scheduler class instance

    @property
    def needs_lam(self):
        """True when per-atom (lambda, role) rows must reach the kernel."""
        return self.lj_kind != 0 or self.coul_sc != 0


def build_fused_spec(inters):
    """Map a tuple of pairwise interactions onto a FusedSpec, or None if any
    interaction is outside the fast-path set."""
    from .mixing import MinimumMixing
    from ..free_energy.alchemy import (DefaultLambdaScheduler as _DS)  # noqa

    spec = dict(lj_mode=0, lj_rc=0.0, lj_w=1.0, coul_mode=0, coul_rc=0.0,
                ke=0.0, krf=0.0, crf=0.0, alpha=0.0, coul_w=1.0,
                lj_kind=0, lj_alpha=0.0, coul_sc=0, coul_alpha_sc=0.0,
                coul_sigma_q=0.0, scale_q=False, scheduler=None)
    cut_max = 0.0

    def _set_scheduler(s):
        if spec["scheduler"] is None:
            spec["scheduler"] = s
            return True
        return type(spec["scheduler"]) is type(s)

    def _lj_cutoff(c):
        """Map a cutoff object onto (mode, rc) or None."""
        if isinstance(c, cut.NoCutoff):
            return 4, 0.0
        if isinstance(c, cut.DistanceCutoff):
            return 1, float(c.dist_cutoff)
        if isinstance(c, cut.ShiftedPotentialCutoff):
            return 2, float(c.dist_cutoff)
        if isinstance(c, cut.ShiftedForceCutoff):
            return 3, float(c.dist_cutoff)
        return None

    for inter in inters:
        if isinstance(inter, (pw.LennardJones, pw.LennardJonesSoftCoreBeutler,
                              pw.LennardJonesSoftCoreGapsys)):
            if spec["lj_mode"]:
                return None
            if not isinstance(inter.sigma_mixing, LorentzMixing):
                return None
            if not isinstance(inter.epsilon_mixing, GeometricMixing):
                return None
            mc = _lj_cutoff(inter.cutoff)
            if mc is None:
                return None
            spec["lj_mode"], spec["lj_rc"] = mc
            if isinstance(inter, pw.LennardJonesSoftCoreBeutler):
                if not isinstance(inter.lambda_mixing, MinimumMixing):
                    return None
                if not _set_scheduler(inter.scheduler):
                    return None
                spec["lj_kind"] = 1
                spec["lj_alpha"] = float(inter.alpha)
            elif isinstance(inter, pw.LennardJonesSoftCoreGapsys):
                if not isinstance(inter.lambda_mixing, MinimumMixing):
                    return None
                if not _set_scheduler(inter.scheduler):
                    return None
                spec["lj_kind"] = 2
                spec["lj_alpha"] = float(inter.alpha)
            spec["lj_w"] = float(inter.weight_special)
            if spec["lj_rc"]:
                cut_max = max(cut_max, spec["lj_rc"])
            elif spec["lj_kind"]:
                return None  # soft-core needs a finite cutoff for culling
        elif isinstance(inter, pw.CoulombSoftCoreBeutler):
            if spec["coul_mode"]:
                return None
            if not isinstance(inter.lambda_mixing, MinimumMixing):
                return None
            if not isinstance(inter.sigma_mixing, LorentzMixing):
                return None
            if not _set_scheduler(inter.scheduler):
                return None
            mc = _lj_cutoff(inter.cutoff)
            if mc is None or mc[0] not in (1, 4):
                return None
            spec.update(coul_mode=1, coul_sc=1,
                        coul_alpha_sc=float(inter.alpha),
                        ke=float(inter.coulomb_const),
                        coul_w=float(inter.weight_special),
                        coul_rc=mc[1])
            if mc[1]:
                cut_max = max(cut_max, mc[1])
            else:
                return None
        elif isinstance(inter, pw.CoulombSoftCoreGapsys):
            if spec["coul_mode"]:
                return None
            if not isinstance(inter.lambda_mixing, MinimumMixing):
                return None
            if not _set_scheduler(inter.scheduler):
                return None
            mc = _lj_cutoff(inter.cutoff)
            if mc is None or mc[0] not in (1, 4) or not mc[1]:
                return None
            spec.update(coul_mode=1, coul_sc=2,
                        coul_alpha_sc=float(inter.alpha),
                        coul_sigma_q=float(inter.sigma_q),
                        ke=float(inter.coulomb_const),
                        coul_w=float(inter.weight_special),
                        coul_rc=mc[1])
            cut_max = max(cut_max, mc[1])
        elif isinstance(inter, pw.CoulombSoftCoreBeutlerEwald):
            if spec["coul_mode"]:
                return None
            if not isinstance(inter.lambda_mixing, MinimumMixing):
                return None
            if not isinstance(inter.sigma_mixing, LorentzMixing):
                return None
            if not _set_scheduler(inter.scheduler):
                return None
            spec.update(coul_mode=3, coul_sc=1,
                        coul_alpha_sc=float(inter.alpha_sc),
                        coul_rc=float(inter.dist_cutoff),
                        ke=float(inter.coulomb_const),
                        alpha=float(inter.alpha),
                        coul_w=float(inter.weight_special))
            cut_max = max(cut_max, float(inter.dist_cutoff))
        elif isinstance(inter, pw.CoulombSoftCoreGapsysEwald):
            if spec["coul_mode"]:
                return None
            if not isinstance(inter.lambda_mixing, MinimumMixing):
                return None
            if not _set_scheduler(inter.scheduler):
                return None
            spec.update(coul_mode=3, coul_sc=2,
                        coul_alpha_sc=float(inter.alpha_sc),
                        coul_sigma_q=float(inter.sigma_q),
                        coul_rc=float(inter.dist_cutoff),
                        ke=float(inter.coulomb_const),
                        alpha=float(inter.alpha),
                        coul_w=float(inter.weight_special))
            cut_max = max(cut_max, float(inter.dist_cutoff))
        elif isinstance(inter, pw.CoulombScaled):
            if spec["coul_mode"]:
                return None
            if not isinstance(inter.cutoff, (cut.NoCutoff,
                                             cut.DistanceCutoff)):
                return None
            if not _set_scheduler(inter.scheduler):
                return None
            spec.update(coul_mode=1, scale_q=True,
                        ke=float(inter.coulomb_const),
                        coul_w=float(inter.weight_special))
            if isinstance(inter.cutoff, cut.DistanceCutoff):
                spec["coul_rc"] = float(inter.cutoff.dist_cutoff)
                cut_max = max(cut_max, spec["coul_rc"])
        elif isinstance(inter, pw.CoulombReactionFieldScaled):
            if spec["coul_mode"]:
                return None
            if not _set_scheduler(inter.scheduler):
                return None
            rc = float(inter.dist_cutoff)
            eps_rf = float(inter.solvent_dielectric)
            if math.isinf(eps_rf):
                krf = 1.0 / (2.0 * rc ** 3)
                crf = 3.0 / (2.0 * rc)
            else:
                krf = (eps_rf - 1.0) / ((2.0 * eps_rf + 1.0) * rc ** 3)
                crf = 3.0 * eps_rf / ((2.0 * eps_rf + 1.0) * rc)
            spec.update(coul_mode=2, scale_q=True, coul_rc=rc,
                        ke=float(inter.coulomb_const), krf=krf, crf=crf,
                        coul_w=float(inter.weight_special))
            cut_max = max(cut_max, rc)
        elif isinstance(inter, pw.CoulombEwaldScaled):
            if spec["coul_mode"]:
                return None
            if not _set_scheduler(inter.scheduler):
                return None
            spec.update(coul_mode=3, scale_q=True,
                        coul_rc=float(inter.dist_cutoff),
                        ke=float(inter.coulomb_const),
                        alpha=float(inter.alpha),
                        coul_w=float(inter.weight_special))
            cut_max = max(cut_max, float(inter.dist_cutoff))
        elif isinstance(inter, pw.Coulomb):
            if spec["coul_mode"]:
                return None
            if not isinstance(inter.cutoff, (cut.NoCutoff, cut.DistanceCutoff)):
                return None
            spec["coul_mode"] = 1
            spec["ke"] = float(inter.coulomb_const)
            spec["coul_w"] = float(inter.weight_special)
            if isinstance(inter.cutoff, cut.DistanceCutoff):
                spec["coul_rc"] = float(inter.cutoff.dist_cutoff)
                cut_max = max(cut_max, spec["coul_rc"])
        elif isinstance(inter, pw.CoulombReactionField):
            if spec["coul_mode"]:
                return None
            rc = float(inter.dist_cutoff)
            eps_rf = float(inter.solvent_dielectric)
            if math.isinf(eps_rf):
                krf = 1.0 / (2.0 * rc ** 3)
                crf = 3.0 / (2.0 * rc)
            else:
                krf = (eps_rf - 1.0) / ((2.0 * eps_rf + 1.0) * rc ** 3)
                crf = 3.0 * eps_rf / ((2.0 * eps_rf + 1.0) * rc)
            spec.update(coul_mode=2, coul_rc=rc, ke=float(inter.coulomb_const),
                        krf=krf, crf=crf, coul_w=float(inter.weight_special))
            cut_max = max(cut_max, rc)
        elif isinstance(inter, pw.CoulombEwald):
            if spec["coul_mode"]:
                return None
            spec.update(coul_mode=3, coul_rc=float(inter.dist_cutoff),
                        ke=float(inter.coulomb_const), alpha=float(inter.alpha),
                        coul_w=float(inter.weight_special))
            cut_max = max(cut_max, float(inter.dist_cutoff))
        else:
            return None
    if spec["lj_mode"] == 0 and spec["coul_mode"] == 0:
        return None
    if cut_max == 0.0:
        return None  # no finite cutoff: block culling impossible
    erfc_e = erfc_h = ()
    if spec["coul_mode"] == 3:
        import math as _math
        xmax = spec["alpha"] * cut_max
        t = np.linspace(0.0, 1.0, 4001)
        x = t * xmax
        ev = np.vectorize(_math.erfc)(x)
        hv = ev + 2.0 / _math.sqrt(_math.pi) * x * np.exp(-x * x)
        ce = np.polynomial.chebyshev.Chebyshev.fit(t, ev, 14).convert(
            kind=np.polynomial.Polynomial).coef
        ch = np.polynomial.chebyshev.Chebyshev.fit(t, hv, 14).convert(
            kind=np.polynomial.Polynomial).coef
        erfc_e = tuple(float(c) for c in ce[::-1])  # highest first (Horner)
        erfc_h = tuple(float(c) for c in ch[::-1])
    return FusedSpec(cut_max=cut_max, erfc_e=erfc_e, erfc_h=erfc_h, **spec)


def _pair_terms_alch(spec, r2, inv_r, r, sig, eps, qq, special, dtype,
                     lam_s, lam_e):
    """Soft-core energy + coef branches (Beutler/Gapsys LJ and Coulomb,
    optionally under the Ewald real-space screen) — the alchemical
    free-energy production path fused into the same tile kernel. lam_s /
    lam_e are the scheduler-resolved per-pair sterics / electrostatics
    scales. Formulas match ops/pairwise.py (autodiff reference)."""
    e = jnp.zeros_like(r2)
    coef = jnp.zeros_like(r2)
    one = jnp.asarray(1.0, dtype)
    tiny = jnp.asarray(1e-30, dtype)

    if spec.lj_mode and spec.lj_kind:
        sig2 = sig * sig
        sig6 = sig2 * sig2 * sig2
        c6 = 4.0 * eps * sig6
        c12 = c6 * sig6
        if spec.lj_kind == 1:    # Beutler: R6 = a(1-l)s^6 + r^6
            shift = spec.lj_alpha * (1.0 - lam_s) * sig6

            def lj_terms(rr2):
                r6 = jnp.maximum(shift + rr2 * rr2 * rr2, 1e-12)
                inv6 = 1.0 / r6
                ee = lam_s * (c12 * inv6 - c6) * inv6
                cc = 6.0 * lam_s * rr2 * rr2 * (c6 - 2.0 * c12 * inv6) \
                    * inv6 * inv6
                return ee, cc
        else:                    # Gapsys linear-quadratic inner region
            ratio = jnp.where(c6 > 0, 26.0 * c12 * (1.0 - lam_s)
                              / (7.0 * jnp.maximum(c6, tiny)), 0.0)
            r_lj = spec.lj_alpha * jnp.where(
                ratio > 0, jnp.exp(jnp.log(jnp.maximum(ratio, tiny))
                                   / 6.0), 0.0)
            rs = jnp.maximum(r_lj, 1e-6)
            rs2 = rs * rs
            inv_rs = 1.0 / rs
            inv_rs2 = 1.0 / rs2
            inv_rs6 = inv_rs2 * inv_rs2 * inv_rs2
            inv_rs12 = inv_rs6 * inv_rs6
            A = (78.0 * c12 * inv_rs12 * inv_rs2
                 - 21.0 * c6 * inv_rs6 * inv_rs2)
            B = (168.0 * c12 * inv_rs12 * inv_rs
                 - 48.0 * c6 * inv_rs6 * inv_rs)
            C = 91.0 * c12 * inv_rs12 - 28.0 * c6 * inv_rs6

            def lj_terms(rr2):
                rr2s = jnp.maximum(rr2, 1e-12)
                rr = jnp.sqrt(rr2s)
                inv2 = 1.0 / rr2s
                inv6 = inv2 * inv2 * inv2
                inv12 = inv6 * inv6
                outer_e = c12 * inv12 - c6 * inv6
                outer_c = -(12.0 * c12 * inv12 - 6.0 * c6 * inv6) * inv2
                inner_e = (A * rr2s - B * rr) + C
                inner_c = 2.0 * A - B / rr
                sel = rr >= r_lj
                return (lam_s * jnp.where(sel, outer_e, inner_e),
                        lam_s * jnp.where(sel, outer_c, inner_c))

        e_lj, coef_lj = lj_terms(r2)
        if spec.lj_mode in (2, 3):
            rc2 = jnp.full_like(r2, spec.lj_rc * spec.lj_rc)
            e_rc, coef_rc = lj_terms(rc2)
            e_lj = e_lj - e_rc
            if spec.lj_mode == 3:
                dudr_rc = coef_rc * spec.lj_rc
                e_lj = e_lj - (r - spec.lj_rc) * dudr_rc
                coef_lj = coef_lj - dudr_rc * inv_r
        if spec.lj_mode != 4:
            inside = r2 < spec.lj_rc * spec.lj_rc
            e_lj = jnp.where(inside, e_lj, 0.0)
            coef_lj = jnp.where(inside, coef_lj, 0.0)
        live = (lam_s > 0) & (eps != 0)
        w = jnp.where(special, jnp.asarray(spec.lj_w, dtype), one)
        e = e + jnp.where(live, e_lj, 0.0) * w
        coef = coef + jnp.where(live, coef_lj, 0.0) * w
    elif spec.lj_mode:
        e1, c1 = _pair_terms(dataclasses.replace(spec, coul_mode=0),
                             r2, inv_r, r, sig, eps, qq, special, dtype)
        e, coef = e + e1, coef + c1

    if spec.coul_mode and spec.coul_sc:
        keqq = spec.ke * qq
        if spec.coul_sc == 1:    # Beutler: RQ = a(1-l)s^6 + r^6
            sig2c = sig * sig
            sig6c = sig2c * sig2c * sig2c
            shift = spec.coul_alpha_sc * (1.0 - lam_e) * sig6c
            rq = jnp.maximum(shift + r2 * r2 * r2, 1e-18)
            p = jnp.exp(-jnp.log(rq) / 6.0)   # rq^(-1/6)
            base_e = lam_e * keqq * p
            base_c = -lam_e * keqq * r2 * r2 * p / rq
        else:                    # Gapsys: quadratic inner below rq
            rq = spec.coul_alpha_sc * jnp.exp(
                jnp.log(jnp.maximum(1.0 - lam_e, tiny)) / 6.0) * (
                    1.0 + spec.coul_sigma_q * jnp.abs(qq))
            rq = jnp.where(lam_e < 1.0, rq, 0.0)
            rqs = jnp.maximum(rq, 1e-9)
            inv_rq = 1.0 / rqs
            inv_rq2 = inv_rq * inv_rq
            inv_rq3 = inv_rq2 * inv_rq
            outer_e = keqq * inv_r
            outer_c = -keqq * inv_r * inv_r * inv_r
            inner_e = keqq * (inv_rq3 * r2 - 3.0 * inv_rq2 * r
                              + 3.0 * inv_rq)
            inner_c = keqq * (2.0 * inv_rq3 - 3.0 * inv_rq2 * inv_r)
            sel = r >= rq
            base_e = lam_e * jnp.where(sel, outer_e, inner_e)
            base_c = lam_e * jnp.where(sel, outer_c, inner_c)
        if spec.coul_mode == 3:
            # Ewald screen on the soft-cored base (rational erfc + exp;
            # d/dr via product rule)
            ar = spec.alpha * r
            t = 1.0 / (1.0 + 0.3275911 * ar)
            poly = (0.254829592 + (-0.284496736 + (1.421413741 +
                    (-1.453152027 + 1.061405429 * t) * t) * t) * t) * t
            exp_m = jnp.exp(-ar * ar)
            erfc_ar = poly * exp_m
            derfc_r = -2.0 * spec.alpha * INV_SQRT_PI * exp_m * inv_r
            e_scr = base_e * erfc_ar
            c_scr = base_c * erfc_ar + base_e * derfc_r
            e_c = jnp.where(special, base_e * spec.coul_w, e_scr)
            coef_c = jnp.where(special, base_c * spec.coul_w, c_scr)
        else:
            w = jnp.where(special, jnp.asarray(spec.coul_w, dtype), one)
            e_c = base_e * w
            coef_c = base_c * w
        live = lam_e > 0
        e_c = jnp.where(live, e_c, 0.0)
        coef_c = jnp.where(live, coef_c, 0.0)
        if spec.coul_rc:
            inside = r2 < spec.coul_rc * spec.coul_rc
            e_c = jnp.where(inside, e_c, 0.0)
            coef_c = jnp.where(inside, coef_c, 0.0)
        e = e + e_c
        coef = coef + coef_c
    elif spec.coul_mode:
        e1, c1 = _pair_terms(dataclasses.replace(spec, lj_mode=0),
                             r2, inv_r, r, sig, eps, qq, special, dtype)
        e, coef = e + e1, coef + c1
    return e, coef


def _pair_terms(spec, r2, inv_r, r, sig, eps, qq, special, dtype):
    """Energy and coef = (dU/dr)/r on a (128, 128) tile. All branches are
    trace-time Python on the static spec."""
    e = jnp.zeros_like(r2)
    coef = jnp.zeros_like(r2)
    one = jnp.asarray(1.0, dtype)
    if spec.lj_mode:
        inv_r2 = inv_r * inv_r
        s2 = sig * sig * inv_r2
        six = s2 * s2 * s2
        twelve = six * six
        e_lj = 4.0 * eps * (twelve - six)
        coef_lj = -24.0 * eps * (2.0 * twelve - six) * inv_r2
        if spec.lj_mode in (2, 3):
            rc = spec.lj_rc
            s2c = sig * sig / (rc * rc)
            sixc = s2c * s2c * s2c
            twelvec = sixc * sixc
            e_rc = 4.0 * eps * (twelvec - sixc)
            e_lj = e_lj - e_rc
            if spec.lj_mode == 3:
                dudr_rc = -24.0 * eps * (2.0 * twelvec - sixc) / rc
                e_lj = e_lj - (r - rc) * dudr_rc
                coef_lj = coef_lj - dudr_rc * inv_r
        if spec.lj_mode != 4 and spec.lj_rc < spec.cut_max:
            # redundant when lj_rc == cut_max: every caller masks the
            # result by a live/inside test at cut_max already
            inside = r2 < spec.lj_rc * spec.lj_rc
            e_lj = jnp.where(inside, e_lj, 0.0)
            coef_lj = jnp.where(inside, coef_lj, 0.0)
        w = jnp.where(special, jnp.asarray(spec.lj_w, dtype), one)
        e = e + e_lj * w
        coef = coef + coef_lj * w
    if spec.coul_mode:
        keqq = spec.ke * qq
        inv_r2 = inv_r * inv_r
        e_plain = keqq * inv_r
        coef_plain = -keqq * inv_r2 * inv_r
        if spec.coul_mode == 1:
            e_c = e_plain
            coef_c = coef_plain
            w = jnp.where(special, jnp.asarray(spec.coul_w, dtype), one)
            e_c, coef_c = e_c * w, coef_c * w
            if spec.coul_rc and spec.coul_rc < spec.cut_max:
                inside = r2 < spec.coul_rc * spec.coul_rc
                e_c = jnp.where(inside, e_c, 0.0)
                coef_c = jnp.where(inside, coef_c, 0.0)
        elif spec.coul_mode == 2:
            e_rf = keqq * (inv_r + spec.krf * r2 - spec.crf)
            coef_rf = keqq * (-inv_r2 * inv_r + 2.0 * spec.krf)
            e_c = jnp.where(special, e_plain * spec.coul_w, e_rf)
            coef_c = jnp.where(special, coef_plain * spec.coul_w, coef_rf)
            inside = r2 < spec.coul_rc * spec.coul_rc
            e_c = jnp.where(inside, e_c, 0.0)
            coef_c = jnp.where(inside, coef_c, 0.0)
        elif spec.erfc_e:  # ewald real space, polynomial erfc (default)
            t = r * jnp.asarray(1.0 / spec.cut_max, dtype)
            ev = jnp.asarray(spec.erfc_e[0], dtype)
            for c in spec.erfc_e[1:]:
                ev = ev * t + c
            hv = jnp.asarray(spec.erfc_h[0], dtype)
            for c in spec.erfc_h[1:]:
                hv = hv * t + c
            e_ew = keqq * ev * inv_r
            coef_ew = -keqq * inv_r2 * inv_r * hv
            e_c = jnp.where(special, e_plain * spec.coul_w, e_ew)
            coef_c = jnp.where(special, coef_plain * spec.coul_w,
                               coef_ew)
            if spec.coul_rc < spec.cut_max:   # redundant at cut_max (live)
                inside = r2 < spec.coul_rc * spec.coul_rc
                e_c = jnp.where(inside, e_c, 0.0)
                coef_c = jnp.where(inside, coef_c, 0.0)
            e = e + e_c
            coef = coef + coef_c
            return e, coef
        else:  # ewald real space (rational-approximation erfc fallback)
            ar = spec.alpha * r
            t = 1.0 / (1.0 + 0.3275911 * ar)
            poly = (0.254829592 + (-0.284496736 + (1.421413741 +
                    (-1.453152027 + 1.061405429 * t) * t) * t) * t) * t
            exp_m = jnp.exp(-ar * ar)
            erfc_ar = poly * exp_m
            e_ew = keqq * erfc_ar * inv_r
            coef_ew = -keqq * inv_r2 * (erfc_ar * inv_r
                                        + 2.0 * spec.alpha * INV_SQRT_PI * exp_m)
            e_c = jnp.where(special, e_plain * spec.coul_w, e_ew)
            coef_c = jnp.where(special, coef_plain * spec.coul_w,
                               coef_ew)
            inside = r2 < spec.coul_rc * spec.coul_rc
            e_c = jnp.where(inside, e_c, 0.0)
            coef_c = jnp.where(inside, coef_c, 0.0)
        e = e + e_c
        coef = coef + coef_c
    return e, coef


def _far_pair_corrections(spec, coords, boundary, atoms, charge, exclusions,
                          forces, energy, vir, dtype, use_lam):
    """Correct the kernel's treatment of exclusion/special pairs whose id
    span exceeds the bitmap window (|j - i| > 31 — absent in standard
    topologies; disulfide-bridged or ring-closing exotica land here).

    The kernel computed such pairs at FULL strength: excluded pairs are
    subtracted outright; special (1-4) pairs get (scaled - full) added.
    Static empty far lists compile to nothing."""
    def pair_eval(pairs, i, j):
        dr = boundary.displacement(coords[i], coords[j])      # x_j - x_i MIC
        r2 = jnp.sum(dr * dr, axis=-1)
        r2 = jnp.maximum(r2, 1e-12)
        inv_r = jax.lax.rsqrt(r2)
        r = r2 * inv_r
        sig = 0.5 * (atoms.sigma[i] + atoms.sigma[j]).astype(dtype)
        eps = (jnp.sqrt(atoms.epsilon[i])
               * jnp.sqrt(atoms.epsilon[j])).astype(dtype)
        qq = (charge[i] * charge[j]).astype(dtype)
        inside = r2 < spec.cut_max * spec.cut_max

        def terms(special):
            sp = jnp.full(r2.shape, special)
            if use_lam:
                lam_row = (atoms.lam if atoms.lam is not None
                           else jnp.ones(charge.shape, dtype))
                role_row = (atoms.alch_role if atoms.alch_role is not None
                            else jnp.zeros(charge.shape, jnp.int32))
                lam_i = lam_row[i].astype(dtype)
                lam_j = lam_row[j].astype(dtype)
                role_i = role_row[i].astype(dtype)
                role_j = role_row[j].astype(dtype)
                lam_mix = jnp.minimum(lam_i, lam_j)
                same_noncore = (role_i == role_j) & (role_i != 0.0)
                pair_role = jnp.where((role_i == 1.0) | (role_j == 1.0), 1.0,
                                      jnp.where((role_i == 2.0)
                                                | (role_j == 2.0), 2.0, 0.0))
                sched = spec.scheduler
                lam_s = jnp.where(same_noncore, 1.0,
                                  sched.scale_sterics(lam_mix, pair_role))
                lam_e = jnp.where(same_noncore, 1.0,
                                  sched.scale_elec(lam_mix, pair_role))
                lam_live = (lam_i != 0.0) & (lam_j != 0.0)
                lam_s = jnp.where(lam_live, lam_s, 0.0)
                e, c = _pair_terms_alch(spec, r2, inv_r, r, sig, eps, qq,
                                        sp, dtype, lam_s, lam_e)
            else:
                e, c = _pair_terms(spec, r2, inv_r, r, sig, eps, qq, sp,
                                   dtype)
            return jnp.where(inside, e, 0.0), jnp.where(inside, c, 0.0)

        return dr, terms

    def apply(pairs, delta_of_terms):
        nonlocal forces, energy, vir
        if pairs is None or pairs.shape[0] == 0:
            return
        i, j = pairs[:, 0], pairs[:, 1]
        dr, terms = pair_eval(pairs, i, j)
        de, dc = delta_of_terms(terms)                        # (K,), (K,)
        fvec = dc[:, None] * dr       # d(correction E)/d(-dr) pattern:
        # kernel force convention: f_i += coef * (x_j - x_i); applying a
        # delta coef adds fvec to i and -fvec to j
        forces = forces.at[i].add(fvec.astype(forces.dtype))
        forces = forces.at[j].add(-fvec.astype(forces.dtype))
        energy = energy + jnp.sum(de).astype(energy.dtype)
        vir = vir - jnp.einsum("k,kd,ke->de", dc, dr, dr).astype(vir.dtype)

    # excluded far pairs: remove the full contribution
    apply(getattr(exclusions, "far_excl", None),
          lambda terms: tuple(-x for x in terms(False)))
    # special far pairs: replace full with scaled
    apply(getattr(exclusions, "far_spec", None),
          lambda terms: tuple(s - f for s, f in zip(terms(True),
                                                    terms(False))))
    return forces, energy, vir


def _kernel(spec, n_atoms, compute_energy, mic, use_lam, variant, *refs):
    # inputs (abits carries the windowed exclusion/special bitmaps; alr/jlr
    # per-atom (lambda, role) rows present only on the alchemical path)
    # Stream discipline: the grid pipeline pays a per-stream per-step fixed
    # cost (index-map eval + DMA descriptor issue on the scalar core), so
    # the per-step coordinate tiles ride CONCATENATED with the rebuild-
    # static parameter rows — one a-side (1, 8, BLOCK) stream (coords rows
    # 0-3 + sig/sqrt eps/q/id rows 4-7) and one j-side (8, LANES) stream
    # (coords rows 0-2 + sig/sqrt eps/q/id/pos rows 3-7) — and the
    # energy/virial SMEM outputs exist only when compute_energy.
    if use_lam:
        (flat_i_ref, row_start_ref, n_items_ref,
         box_ref, cen_ref, a8_ref, abits_ref, j8_ref,
         alr_ref, jlr_ref, f_ref, jf_ref, *erefs) = refs
    else:
        (flat_i_ref, row_start_ref, n_items_ref,
         box_ref, cen_ref, a8_ref, abits_ref, j8_ref,
         f_ref, jf_ref, *erefs) = refs
        alr_ref = jlr_ref = None
    eng_ref, vir_ref = erefs if compute_energy else (None, None)
    p = pl.program_id(0)
    i = flat_i_ref[p]
    dtype = a8_ref.dtype

    # first work item of this i-block initializes its force accumulator
    # (padding items carry flat_i = last live i-block, so output blocks are
    # visited in one contiguous run and padding never re-inits or revisits
    # an earlier block)
    @pl.when(p == row_start_ref[i])
    def _():
        f_ref[...] = jnp.zeros_like(f_ref)

    # padding items still flush their (per-item) j-partial window — zero it.
    # REQUIRED for correctness, not just NaN hygiene: the finder sentinels
    # padding items' clusters (blockpairs.py find()), so occ_idx never lists
    # these lanes — but only because of that invariant; and uninitialized
    # VMEM must never reach HBM regardless (NaN-checking modes trip on it)
    @pl.when(p >= n_items_ref[0])
    def _():
        jf_ref[...] = jnp.zeros_like(jf_ref)

    if compute_energy:
        @pl.when(p == 0)
        def _():
            # SMEM accepts only scalar stores on TPU
            for t in range(8):
                eng_ref[0, t] = jnp.asarray(0.0, dtype)
                vir_ref[0, t] = jnp.asarray(0.0, dtype)

    if variant == "gather_only":
        # roofline probe: all input DMA happens (the Pallas pipeline copies
        # every BlockSpec window per grid step regardless of body use), but
        # the body only touches the tiles enough to defeat dead-input
        # elimination — isolates DMA + grid overhead from VPU compute
        @pl.when(p < n_items_ref[0])
        def _():
            # ELEMENTWISE touch only: full-tile jnp.sum reduction trees
            # cost ~microseconds each on the VPU and would dominate the
            # probe, mis-attributing VPU time to the DMA bucket. The
            # untouched streams (a8, abits) are still DMA'd — the Pallas
            # pipeline copies every BlockSpec window per grid step.
            jf_ref[...] = j8_ref[0:4] * jnp.asarray(1e-30, dtype)
        return

    @pl.when(p < n_items_ref[0])
    def _():
        # Coordinates arrive in the wrapped simulation frame; the kernel
        # shifts both tiles into the i-block's local frame (AABB center from
        # SMEM) and applies the minimum image PER J-ENTRY — O(LANES) work
        # instead of O(BLOCK x LANES) per-pair box math. Block-local frames
        # also keep |x| ~ cutoff so the f32 moment-form reduction is accurate.
        cx = cen_ref[0, 0, 0]
        cy = cen_ref[0, 0, 1]
        cz = cen_ref[0, 0, 2]
        j8 = j8_ref[...]                   # rows 0-2 x/y/z wrapped,
        jc = j8[0:3]                       # rows 3-7 sig/sqrt eps/q/id/pos
        js = j8[3:8]
        bx, by, bz = jc[0] - cx, jc[1] - cy, jc[2] - cz
        if not mic:
            # per-entry minimum image against the i-block center (valid when
            # block extent + 2 rc <= box width, checked at rebuild).
            # Back-substitution form: triclinic rounds out the c, then b,
            # then a image; orthorhombic has zero off-diagonals so the three
            # cross terms vanish (box row layout: kernel_mic_row).
            h11, h21, h22 = box_ref[0, 0], box_ref[0, 1], box_ref[0, 2]
            h31, h32, h33 = box_ref[0, 3], box_ref[0, 4], box_ref[0, 5]
            ih11, ih22, ih33 = box_ref[0, 6], box_ref[0, 7], box_ref[0, 8]
            s3 = jnp.round(bz * ih33)
            bx = bx - s3 * h31
            by = by - s3 * h32
            bz = bz - s3 * h33
            s2 = jnp.round(by * ih22)
            bx = bx - s2 * h21
            by = by - s2 * h22
            bx = bx - jnp.round(bx * ih11) * h11
        bsig, beps, bq, b_id, b_pos = js[0], js[1], js[2], js[3], js[4]
        a8 = a8_ref[0]                     # (8, BLOCK)
        a_c = a8[0:4]                      # x/y/z/0 wrapped
        a_s = a8[4:8]                      # sig/sqrt eps/q/id

        ax, ay, az = a_c[0] - cx, a_c[1] - cy, a_c[2] - cz
        dx = bx[None, :] - ax[:, None]
        dy = by[None, :] - ay[:, None]
        dz = bz[None, :] - az[:, None]
        if mic:
            # small-box fallback: per-pair minimum image (the hoisted
            # per-entry form is invalid when block extent + 2 rc > box),
            # same back-substitution form as above
            h11, h21, h22 = box_ref[0, 0], box_ref[0, 1], box_ref[0, 2]
            h31, h32, h33 = box_ref[0, 3], box_ref[0, 4], box_ref[0, 5]
            ih11, ih22, ih33 = box_ref[0, 6], box_ref[0, 7], box_ref[0, 8]
            s3 = jnp.round(dz * ih33)
            dx = dx - s3 * h31
            dy = dy - s3 * h32
            dz = dz - s3 * h33
            s2 = jnp.round(dy * ih22)
            dx = dx - s2 * h21
            dy = dy - s2 * h22
            dx = dx - jnp.round(dx * ih11) * h11
        r2 = dx * dx + dy * dy + dz * dz

        a_id = a_s[3]
        # padding/fake atoms on either side carry id = n_atoms
        live = ((a_id[:, None] != b_id[None, :])
                & (r2 < spec.cut_max * spec.cut_max)
                & (b_id[None, :] < n_atoms)
                & (a_id[:, None] < n_atoms))
        # windowed-bitmap exclusion test: partner offsets |d| <= 31 are bits
        # in two per-atom int32 words (rows [excl_w0, excl_w1, spec_w0,
        # spec_w1]); ids ride the static rows as exact-in-f32 integers.
        # ~8 VPU int ops per slot, vs reading a rebuild-materialized
        # (P, BLOCK, LANES) mask (49 MB of carry + a 2.7 ms/rebuild build).
        # Far pairs (|d| > 31) are corrected densely outside the kernel.
        ab = abits_ref[0]                             # (4, BLOCK) int32
        d = (b_id[None, :] - a_id[:, None]).astype(jnp.int32) + 32
        in_win = (d >= 0) & (d < 64)
        sh = d & 31
        lo = d < 32
        ew = jnp.where(lo, ab[0][:, None], ab[1][:, None])
        sw = jnp.where(lo, ab[2][:, None], ab[3][:, None])
        excl = in_win & (((ew >> sh) & 1) != 0)
        special = in_win & (((sw >> sh) & 1) != 0)
        live = live & ~excl

        # half-orientation bookkeeping: lanes whose j-atom sits in THIS
        # i-block carry both in-tile orderings (energy/virial weight 0.5,
        # no j-partial); cross-block lanes are single-evaluation (weight
        # 1.0, j-side partial force emitted). b_pos = sorted position row.
        nb = a_c.shape[1]                  # BLOCK (static)
        blk_lo = (i * nb).astype(dtype)
        same_blk = (b_pos >= blk_lo) & (b_pos < blk_lo + nb)   # (LANES,)
        wl = jnp.where(same_blk, jnp.asarray(0.5, dtype),
                       jnp.asarray(1.0, dtype))[None, :]
        cross = live & ~same_blk[None, :]

        if variant == "distance_only":
            # roofline probe: distances + masks + accumulation, force math
            # stripped — the VPU cost of _pair_terms is full - this
            coef = jnp.where(live, r2 * jnp.asarray(1e-12, dtype), 0.0)
            _accumulate(spec, coef, jnp.where(cross, coef, 0.0), wl,
                        dx, dy, dz, bx, by, bz, ax, ay, az,
                        jnp.zeros_like(coef), live, mic, compute_energy,
                        dtype, f_ref, jf_ref, eng_ref, vir_ref)
            return

        r2s = jnp.where(live, r2, 1.0)
        # Mosaic lowers lax.rsqrt to the VPU's raw ~2e-3 approximation (XLA
        # refines it); two Newton steps restore f32 accuracy — the r^-12
        # repulsive wall amplifies any inv_r error ~13x into the forces
        inv_r = jax.lax.rsqrt(r2s)
        half_r2 = 0.5 * r2s
        inv_r = inv_r * (1.5 - half_r2 * inv_r * inv_r)
        inv_r = inv_r * (1.5 - half_r2 * inv_r * inv_r)
        r = r2s * inv_r
        sig = 0.5 * (a_s[0][:, None] + bsig[None, :])
        eps = a_s[1][:, None] * beps[None, :]  # sqrt pre-applied
        qq = a_s[2][:, None] * bq[None, :]

        if use_lam:
            # scheduler-resolved per-pair lambda scales (alchemy.py
            # sterics_lambda / elec_lambda, MinimumMixing): roles ride as
            # floats (0 core, 1 insert, 2 delete)
            a_lam = alr_ref[0, 0]
            a_role = alr_ref[0, 1]
            b_lam = jlr_ref[0]
            b_role = jlr_ref[1]
            lam_mix = jnp.minimum(a_lam[:, None], b_lam[None, :])
            ri = a_role[:, None]
            rj = b_role[None, :]
            same_noncore = (ri == rj) & (ri != 0.0)
            pair_role = jnp.where((ri == 1.0) | (rj == 1.0), 1.0,
                                  jnp.where((ri == 2.0) | (rj == 2.0),
                                            2.0, 0.0))
            sched = spec.scheduler
            lam_s = jnp.where(same_noncore, 1.0,
                              sched.scale_sterics(lam_mix, pair_role))
            lam_e = jnp.where(same_noncore, 1.0,
                              sched.scale_elec(lam_mix, pair_role))
            # dense-path parity: _lj_shortcut zeroes LJ whenever EITHER
            # atom's per-atom lambda is exactly 0 (dummy atoms), even for
            # same-noncore pairs whose scheduled lam_s is 1
            lam_live = (a_lam[:, None] != 0.0) & (b_lam[None, :] != 0.0)
            lam_s = jnp.where(lam_live, lam_s, 0.0)
            e, coef = _pair_terms_alch(spec, r2s, inv_r, r, sig, eps, qq,
                                       special, dtype, lam_s, lam_e)
        else:
            e, coef = _pair_terms(spec, r2s, inv_r, r, sig, eps, qq,
                                  special, dtype)
        _accumulate(spec, coef, jnp.where(cross, coef, 0.0), wl,
                    dx, dy, dz, bx, by, bz, ax, ay, az,
                    e, live, mic, compute_energy, dtype,
                    f_ref, jf_ref, eng_ref, vir_ref)


def _accumulate(spec, coef, coefj, wl, dx, dy, dz, bx, by, bz, ax, ay, az,
                e, live, mic, compute_energy, dtype, f_ref, jf_ref,
                eng_ref, vir_ref):
    """Reduce per-pair coefs into the i-block force accumulator, emit the
    per-lane j-side partial forces (coefj = coef masked to cross-block
    lanes), and accumulate energy/virial scalars with the half-orientation
    weights wl. Shared by the production path and roofline probes."""
    coef = jnp.where(live, coef, 0.0)

    if mic or os.environ.get("MOLLYTPU_NO_MOMENT"):
        # shifts vary per pair, so the moment identity does not apply:
        # accumulate directly
        upd = jnp.concatenate([
            jnp.sum(coef * dx, axis=1)[None, :],
            jnp.sum(coef * dy, axis=1)[None, :],
            jnp.sum(coef * dz, axis=1)[None, :],
            jnp.zeros((1, coef.shape[0]), dtype)])
        # j-side: f_j = -sum_i coef (x_j - x_i), per lane
        jf_ref[...] = jnp.concatenate([
            -jnp.sum(coefj * dx, axis=0)[None, :],
            -jnp.sum(coefj * dy, axis=0)[None, :],
            -jnp.sum(coefj * dz, axis=0)[None, :],
            jnp.zeros((1, coefj.shape[1]), dtype)])
    else:
        # moment-form accumulation: f_i = sum_j c (xj - xi)
        #                               = (c @ [jx jy jz 1]) - xi*(c @ 1)
        # — one MXU contraction replaces three per-pair multiplies and
        # three VPU reduction trees. Block-local coords keep |x| ~ rc so
        # the difference loses < ~6e-6 relative in f32.
        # Row 3 is constant 1.0, so m4[3] lands sum_j c directly.
        jl4 = jnp.concatenate([
            bx[None, :], by[None, :], bz[None, :],
            jnp.ones((1, bx.shape[0]), dtype)])
        # HIGHEST precision: the MXU's default bf16 multiplies are fine
        # for energies but the f_i = m4 - xi*s0 cancellation amplifies
        # bf16 rounding of the coordinates into O(1) force errors
        # HIGHEST (6-pass bf16 = full f32) by default: the f_i = m4 -
        # xi*s0 cancellation amplifies coordinate rounding. HIGH
        # (3-pass, ~22-bit effective) halves the MXU passes and keeps
        # relative force error ~2e-5 — opt-in via env until the on-TPU
        # fidelity tier pins its drift impact.
        prec = (jax.lax.Precision.HIGH
                if os.environ.get("MOLLYTPU_MOMENT_HIGH")
                else jax.lax.Precision.HIGHEST)
        m4 = jax.lax.dot_general(
            jl4, coef, (((1,), (1,)), ((), ())),
            precision=prec,
            preferred_element_type=dtype)  # (4,BLOCK) [Scx,Scy,Scz,Sc]
        s0 = m4[3]
        upd = jnp.concatenate([
            (m4[0] - ax * s0)[None, :],
            (m4[1] - ay * s0)[None, :],
            (m4[2] - az * s0)[None, :],
            jnp.zeros((1, coef.shape[0]), dtype)])
        # j-side moment form: f_j = -sum_i c (x_j - x_i)
        #                         = (c^T @ [ix iy iz 1]) - x_j * (c^T @ 1)
        # — the transposed contraction of the same MXU trick, emitted as
        # this item's (4, LANES) partial window (summed per atom outside
        # the kernel via the rebuild-static occ_idx gather)
        a4 = jnp.concatenate([
            ax[None, :], ay[None, :], az[None, :],
            jnp.ones((1, ax.shape[0]), dtype)])
        mj = jax.lax.dot_general(
            a4, coefj, (((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=dtype)  # (4,LANES) [Scx,Scy,Scz,Sc]
        sj = mj[3]
        jf_ref[...] = jnp.concatenate([
            (mj[0] - bx * sj)[None, :],
            (mj[1] - by * sj)[None, :],
            (mj[2] - bz * sj)[None, :],
            jnp.zeros((1, coefj.shape[1]), dtype)])
    f_ref[...] += upd[None]
    if compute_energy:
        # half-orientation weights: intra-block lanes appear in both
        # orderings (0.5), cross-block lanes once (1.0)
        e = jnp.where(live, e, 0.0) * wl
        cw = coef * wl
        eng_ref[0, 0] += jnp.sum(e)
        vir_ref[0, 0] += -jnp.sum(cw * dx * dx)
        vir_ref[0, 1] += -jnp.sum(cw * dx * dy)
        vir_ref[0, 2] += -jnp.sum(cw * dx * dz)
        vir_ref[0, 3] += -jnp.sum(cw * dy * dy)
        vir_ref[0, 4] += -jnp.sum(cw * dy * dz)
        vir_ref[0, 5] += -jnp.sum(cw * dz * dz)


def pallas_block_nonbonded(spec, coords, boundary, atoms, exclusions,
                           blockpairs, finder, compute_energy=False,
                           interpret=None):
    """Run the fused kernel. Returns (forces (N, 3), energy, virial (3, 3)).

    Tile shape: (BLOCK i-atoms) x (LANES gathered j-atoms), both per-finder
    launch-config parameters (runtime-autotunable, ops/autotune.py). The
    j-side is an XLA gather over the finder's per-block atom lists, so tiles
    carry ~10% real pairs instead of the ~3% of block-granular lists.
    """
    BLOCK = getattr(finder, "block", None) or _DEFAULT_BLOCK
    LANES = getattr(finder, "lanes", None) or _DEFAULT_LANES

    n = coords.shape[0]
    dtype = coords.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    order = blockpairs.order
    n_pad = order.shape[0]
    b = n_pad // BLOCK
    p_max = blockpairs.flat_i.shape[0]
    safe = jnp.minimum(order, n - 1)
    is_real = order < n

    # Layout discipline (measured on v5e): gathers ONLY in the batched
    # `mat[:, idx]` form, no basic-slice+gather compounds (20-600x slower),
    # no transposes on the hot path — kernel inputs/outputs are 2-D
    # field-rows x atoms matrices sliced by BlockSpec column windows.
    #
    # Per step only the coordinates move: everything order-static (atom
    # parameters, ids, exclusion tables) is packed at rebuild inside
    # BlockPairFinder.find, and the per-step XLA work is exactly two
    # coordinate gathers (block layout + work layout). Minimum-image and the
    # shift into the i-block local frame happen IN the kernel, per j-entry.
    wrapped = boundary.wrap(coords)
    raw3c = wrapped.T.astype(dtype)                          # (3, N)
    sorted3c = raw3c[:, safe]                                # (3, n_pad)
    a_coords = jnp.concatenate(
        [sorted3c, jnp.zeros((1, n_pad), dtype)]
    ).reshape(4, b, BLOCK).transpose(1, 0, 2)                # (B, 4, BLOCK)
    cen4 = jnp.concatenate([
        blockpairs.centers.astype(dtype),
        jnp.zeros((1, blockpairs.centers.shape[1]), dtype)]
    ).T[:, None, :]                                          # (B, 1, 4)

    # alchemical paths: scaled-charge family pre-scales q per step (the
    # rebuild-packed statics would be stale across lambda windows)
    atoms_charge = atoms.charge
    if spec.scale_q:
        from ..free_energy.alchemy import scaled_charge
        atoms_charge = scaled_charge(spec.scheduler, atoms.charge,
                                     atoms.lam, atoms.alch_role)
    use_packed = blockpairs.a_stat is not None and not spec.scale_q

    a_stat = blockpairs.a_stat if use_packed else None
    ids_sorted = jnp.where(is_real, order, n).astype(dtype)
    if a_stat is None:
        raw3s = jnp.concatenate([
            atoms.sigma[None, :],
            jnp.sqrt(atoms.epsilon)[None, :],  # geometric mixing via product
            atoms_charge[None, :],
        ]).astype(dtype)
        sorted3s = jnp.where(is_real[None, :], raw3s[:, safe], 0.0)
        stat4 = jnp.concatenate([sorted3s, ids_sorted[None, :]])
        a_stat = stat4.reshape(4, b, BLOCK).transpose(1, 0, 2)
    a_stat = a_stat.astype(dtype)

    # j coordinates: ONE raw gather in work layout (j-side MIC + the
    # local-frame shift happen in the kernel). The gather indexes CLUSTERS
    # of CL consecutive sorted atoms — the TPU batched gather is per-INDEX
    # bound (~2.4 cycles/index whatever the row count, tools/gather_probe.py),
    # so the (3*CL, n_pad/CL) source layout divides the dominant per-step
    # cost by CL. Row f*CL + m holds field f of member m; a cheap XLA
    # transpose de-interleaves members back to the kernel's (3, LANES)
    # work layout (lane l = m*(LANES/CL) + c — the finder's member-strided
    # work_idx order). Mosaic cannot concatenate lanes across 128-lane
    # tiles in-kernel, so the de-interleave stays outside; it moves CPL=
    # LANES/CL contiguous lanes per row and costs ~2 passes over 6 MB.
    hoist_mic = getattr(finder, "hoist_mic", False)
    CL = int(getattr(finder, "cluster", 1) or 1)
    CPL = LANES // CL
    variant = os.environ.get("MOLLYTPU_PAIR_VARIANT", "")
    if variant == "nogather":
        # roofline probe: skip the per-step work-layout j-coordinate gather
        # (a broadcast fill of one real coordinate row keeps shapes/DMA
        # identical) — full - this = the XLA gather + de-interleave cost
        fc1 = jnp.concatenate([sorted3c, jnp.zeros((3, 1), dtype)], axis=1)
        j_coords = jnp.broadcast_to(fc1[:, :1],
                                    (3, blockpairs.work_idx.shape[0]))
    elif CL > 1:
        cXc = (sorted3c.reshape(3, n_pad // CL, CL)
               .transpose(0, 2, 1).reshape(3 * CL, n_pad // CL))
        fcC = jnp.concatenate([cXc, jnp.zeros((3 * CL, 1), dtype)], axis=1)
        jg = fcC[:, blockpairs.cluster_idx]          # (3*CL, P*CPL)
        p_items = blockpairs.cluster_idx.shape[0] // CPL
        j_coords = (jg.reshape(3, CL, p_items, CPL)
                    .transpose(0, 2, 1, 3)
                    .reshape(3, p_items * LANES))
    else:
        fc1 = jnp.concatenate([sorted3c, jnp.zeros((3, 1), dtype)], axis=1)
        j_coords = fc1[:, blockpairs.work_idx]       # (3, P*LANES)
    from .blockpairs import kernel_mic_row
    box = kernel_mic_row(boundary, dtype)                    # (1, 12)

    j_static = blockpairs.j_static if use_packed else None
    if j_static is None:
        raw3s = jnp.concatenate([
            atoms.sigma[None, :],
            jnp.sqrt(atoms.epsilon)[None, :],
            atoms_charge[None, :],
        ]).astype(dtype)
        sorted3s = jnp.where(is_real[None, :], raw3s[:, safe], 0.0)
        fs5 = jnp.concatenate([sorted3s, ids_sorted[None, :],
                               jnp.arange(n_pad, dtype=dtype)[None, :]])
        fs5 = jnp.concatenate(
            [fs5, jnp.asarray([0.0, 0.0, 0.0, n, n_pad], dtype)[:, None]],
            axis=1)
        j_static = fs5[:, blockpairs.work_idx]
    j_static = j_static.astype(dtype)

    # per-atom (lambda, role) rows for the soft-core kernel path: built per
    # step (lambda changes across windows), block + work layouts
    a_lr = j_lr = None
    if spec.needs_lam:
        lam_row = (atoms.lam if atoms.lam is not None
                   else jnp.ones((n,), dtype))
        role_row = (atoms.alch_role if atoms.alch_role is not None
                    else jnp.zeros((n,), jnp.int32))
        lr2 = jnp.stack([lam_row.astype(dtype),
                         role_row.astype(dtype)])            # (2, N)
        lr_sorted = jnp.where(is_real[None, :], lr2[:, safe], 0.0)
        a_lr = lr_sorted.reshape(2, b, BLOCK).transpose(1, 0, 2)
        lrp = jnp.concatenate([lr_sorted, jnp.zeros((2, 1), dtype)], axis=1)
        j_lr = lrp[:, blockpairs.work_idx]                   # (2, P*LANES)

    a_bits = blockpairs.a_bits
    if a_bits is None and exclusions is not None and getattr(
            exclusions, "excl_bits", None) is not None:
        # finder built without exclusions: pack the bitmaps here per step
        bits4 = jnp.concatenate([exclusions.excl_bits.T,
                                 exclusions.spec_bits.T])
        sidx = jnp.where(is_real, order, n)
        a_bits = bits4[:, sidx].reshape(4, b, BLOCK).transpose(1, 0, 2)
    if a_bits is None:
        if exclusions is not None and exclusions.excl_i is not None \
                and exclusions.excl_i.shape[0] > 0:
            # an Exclusions built without bitmaps (direct construction or
            # pre-bitmap pickles) must not silently fall through to "nothing
            # excluded" — that corrupts forces with no error
            raise ValueError(
                "Exclusions has excluded pairs but no excl_bits bitmaps; "
                "rebuild it with Exclusions.build(...) so the Pallas kernel "
                "can apply them")
        # no exclusions at all: zero bitmaps (nothing excluded/special)
        a_bits = jnp.zeros((b, 4, BLOCK), jnp.int32)

    # concatenate the per-step coordinate tiles with the rebuild-static
    # parameter rows: fewer BlockSpec streams = less per-grid-step fixed
    # cost (index-map eval + DMA descriptor issue on the scalar core). The
    # two concats copy ~5 MB of static rows per step — microseconds — and
    # XLA dedups them against the gather outputs.
    a8 = jnp.concatenate([a_coords, a_stat], axis=1)     # (B, 8, BLOCK)
    j8 = jnp.concatenate([j_coords, j_static], axis=0)   # (8, P*LANES)
    in_specs = [
        pl.BlockSpec((1, 12), lambda p, fi, rs, ni: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 4), lambda p, fi, rs, ni: (fi[p], 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 8, BLOCK),
                     lambda p, fi, rs, ni: (fi[p], 0, 0)),
        pl.BlockSpec((1, 4, BLOCK),
                     lambda p, fi, rs, ni: (fi[p], 0, 0)),
        pl.BlockSpec((8, LANES), lambda p, fi, rs, ni: (0, p)),
    ]
    inputs = [box, cen4, a8, a_bits, j8]
    use_lam = spec.needs_lam
    if use_lam:
        in_specs.append(pl.BlockSpec((1, 2, BLOCK),
                                     lambda p, fi, rs, ni: (fi[p], 0, 0)))
        in_specs.append(pl.BlockSpec((2, LANES),
                                     lambda p, fi, rs, ni: (0, p)))
        inputs.extend([a_lr, j_lr])
    out_specs = [
        pl.BlockSpec((1, 4, BLOCK), lambda p, fi, rs, ni: (fi[p], 0, 0)),
        pl.BlockSpec((4, LANES), lambda p, fi, rs, ni: (0, p)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, 4, BLOCK), dtype),
        jax.ShapeDtypeStruct((4, p_max * LANES), dtype),
    ]
    if compute_energy:
        out_specs += [
            pl.BlockSpec((1, 8), lambda p, fi, rs, ni: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda p, fi, rs, ni: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((1, 8), dtype),
            jax.ShapeDtypeStruct((1, 8), dtype),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(p_max,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    if variant == "preponly":
        # roofline probe: all XLA prep (gathers + layouts) runs, the Pallas
        # call itself is skipped — isolates out-of-kernel prep cost
        alive = (jnp.sum(j_coords) + jnp.sum(a_coords) + jnp.sum(a_stat)
                 + jnp.sum(j_static) + jnp.sum(a_bits.astype(dtype))
                 ) * jnp.asarray(1e-30, dtype)
        forces = jnp.zeros((n, 3), dtype) + alive
        return forces, jnp.zeros((), dtype) + alive, jnp.zeros((3, 3), dtype)

    kernel = partial(_kernel, spec, float(n), compute_energy,
                     not hoist_mic, use_lam,
                     variant if variant in ("gather_only", "distance_only")
                     else "")
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(blockpairs.flat_i, blockpairs.row_start, blockpairs.n_items,
      *inputs)
    if compute_energy:
        f4, jf, eng, vir6 = outs
    else:
        f4, jf = outs
        eng = jnp.zeros((1, 8), dtype)
        vir6 = jnp.zeros((1, 8), dtype)

    # j-side partial forces -> per-atom sums: re-interleave the work-layout
    # partials to the cluster layout, then ONE rebuild-static batched gather
    # over the occurrence windows (occ_idx) + a K-axis sum. Sentinel
    # occurrences hit the appended zero column; no scatter anywhere.
    CPL_ = LANES // CL
    npc = n_pad // CL
    K = blockpairs.occ_idx.shape[0] // npc
    if variant == "noocc":
        # roofline probe: skip the occurrence-window reduction (j-side
        # forces dropped — WRONG physics); full - this = the occ gather +
        # K-sum + re-interleave cost
        jflat = jnp.sum(jf, axis=1, keepdims=True) * jnp.asarray(
            1e-30, dtype) + jnp.zeros((4, CL * npc), dtype)
    else:
        jfc = (jf.reshape(4, p_max, CL, CPL_).transpose(0, 2, 1, 3)
               .reshape(4 * CL, p_max * CPL_))
        jfc = jnp.concatenate([jfc, jnp.zeros((4 * CL, 1), dtype)], axis=1)
        occ = jfc[:, blockpairs.occ_idx]                    # (4*CL, npc*K)
        jsum = jnp.sum(occ.reshape(4, CL, npc, K), axis=3)  # (4, CL, npc)
        # member-major flat layout: column m*npc + c holds sorted atom
        # s = c*CL + m. The (4, CL, npc) -> (4, npc, CL) transpose is an
        # expensive minor-axis relayout on TPU — fold it into the unsort
        # gather's indices instead (one extra N-index gather, ~cheap)
        jflat = jsum.reshape(4, CL * npc)

    # unsort forces to the original atom order by inverse-permutation GATHER
    # (a scatter here costs ~0.4us per element on TPU); the j-side sum
    # gathers with member-major indices, folding its relayout in for free
    inv = blockpairs.inv_order[:n]
    inv2 = (inv % CL) * npc + inv // CL if CL > 1 else inv
    f4u = (f4.transpose(1, 0, 2).reshape(4, n_pad)[:, inv]
           + jflat[:, inv2])                                # (4, N)
    forces = f4u.T[:, :3]
    energy = eng[0, 0]
    vir = jnp.asarray([[vir6[0, 0], vir6[0, 1], vir6[0, 2]],
                       [vir6[0, 1], vir6[0, 3], vir6[0, 4]],
                       [vir6[0, 2], vir6[0, 4], vir6[0, 5]]], dtype=dtype)
    if exclusions is not None and (
            getattr(exclusions, "far_excl", None) is not None):
        if exclusions.far_excl.shape[0] or exclusions.far_spec.shape[0]:
            forces, energy, vir = _far_pair_corrections(
                spec, wrapped, boundary, atoms, atoms_charge, exclusions,
                forces, energy, vir, dtype, use_lam)
    return forces, energy, vir
