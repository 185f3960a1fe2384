"""Simple Betts-Miller quasi-equilibrium convection (Frierson 2007).

Reference: src/atmos_param/qe_moist_convection/qe_moist_convection.F90 (with the
O'Gorman & Schneider 2008 virtual-temperature modifications). Per column:

1. Lift a parcel from the lowest level: dry adiabat to the LCL (Newton solve for
   T_LCL replacing the reference's cached-Newton lookup table), then
   pseudo-adiabatic ascent via the predictor-corrector dT/dlnp step; accumulate
   CIN below the level of free convection and CAPE above; find the level of
   zero buoyancy kLZB.
2. If CAPE > 0: reference profiles T_ref = T_parcel, q_ref = from rhbm * e_sat;
   relaxation increments deltaT/deltaq over tau_bm; precipitation checks
   P_q > 0 and P_T > 0 select deep convection (conserving enthalpy either by
   rescaling the moisture timescale or shifting T_ref), the "shallower" shallow
   scheme (zero-precipitation adjustment with recomputed depth), or none.

TPU-native: the reference's per-column while-loops over levels become one
`lax.scan` from the surface upward over the fixed level count with carried
phase flags; everything is batched over all columns at once. Level-last
arrays (..., L), index 0 = top.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from isca_tpu.constants import Constants, EARTH
from isca_tpu.physics.sat_vapor_pres import SatVaporPres


@dataclasses.dataclass(frozen=True)
class QEMoistConvectionConfig:
    tau_bm: float = 7200.0
    rhbm: float = 0.8
    Tmin: float = 173.0
    newton_iters: int = 25
    constants: Constants = EARTH


class ConvectionResult(NamedTuple):
    deltaT: jax.Array      # (..., L) temperature increment over dt
    deltaq: jax.Array      # (..., L) humidity increment over dt
    rain: jax.Array        # (...,) kg/m^2 accumulated over dt
    cape: jax.Array
    cin: jax.Array
    convflag: jax.Array    # 0 none, 1 cape>0, 2 deep
    tref: jax.Array
    qref: jax.Array


class QEMoistConvection:
    def __init__(self, config: QEMoistConvectionConfig, svp: SatVaporPres):
        self.config = config
        self.svp = svp
        self.C = config.constants

    # -- helpers ------------------------------------------------------
    def _mixing_ratio(self, e, p):
        C = self.C
        return (C.rdgas / C.rvgas) * e / (p - e)

    def _virtual_temp_r(self, t, r):
        C = self.C
        q = r / (1.0 + r)
        return t * (1.0 + q * (C.rvgas / C.rdgas - 1.0))

    def _lcl_temp(self, value, t_guess):
        """Newton solve of value = log(es(T) T^(-1/kappa)) (reference lcl_temp)."""
        C = self.C
        kappa = C.rdgas / C.cp_air

        def body(_, t):
            es = self.svp.es(t)
            f = value - jnp.log(es) + (1.0 / kappa) * jnp.log(t)
            dfdt = -self.svp.des_dt(t) / es + 1.0 / (kappa * t)
            return jnp.clip(t - f / dfdt, 100.0, 400.0)

        return jax.lax.fori_loop(0, self.config.newton_iters, body, t_guess)

    def _moist_dtdlnp(self, t, r):
        C = self.C
        kappa = C.rdgas / C.cp_air
        a = kappa * t + (C.hlv / C.cp_air) * r
        b = (C.hlv**2) * r / (C.cp_air * C.rvgas * t * t)
        return a / (1.0 + b)

    # -- parcel ascent (shared with the full Betts-Miller scheme) ------
    def ascent(self, tin, qin, p_full, p_half):
        """Parcel ascent from the lowest level.

        Returns (tp, rp, cape, cin, klzb) with tp/rp the parcel profile
        (environment values where the ascent is inactive), klzb = 0 where no
        convection (no cape / failed columns).
        """
        cfg, C, svp = self.config, self.C, self.svp
        kappa = C.rdgas / C.cp_air
        pref = 1.0e5
        L = tin.shape[-1]
        rin = qin / (1.0 - qin)
        tin_v = self._virtual_temp_r(tin, rin)

        t0 = tin[..., -1]
        r0 = jnp.maximum(rin[..., -1], 0.0)
        p0 = p_full[..., -1]
        es0 = svp.es(t0)
        rs0 = self._mixing_ratio(es0, p0)
        saturated = rin[..., -1] >= rs0

        # LCL (unsaturated columns)
        theta0 = t0 * (pref / p0) ** kappa
        r0_safe = jnp.maximum(r0, 1.0e-10)
        value = jnp.log(
            theta0 ** (-1.0 / kappa) * pref * r0_safe / (C.rdgas / C.rvgas + r0_safe)
        )
        tlcl = self._lcl_temp(value, jnp.full_like(t0, 260.0))
        plcl = pref * (tlcl / theta0) ** (1.0 / kappa)
        # clamp LCL to the model top and handle r0 <= 0 (-> "skip": no convection)
        top_hit = plcl < p_full[..., 0]
        plcl = jnp.where(top_hit, p_full[..., 0], plcl)
        tlcl = jnp.where(top_hit, theta0 * (plcl / pref) ** kappa, tlcl)
        no_moisture = r0 <= 0.0
        # saturated columns: LCL at the surface with latent adjustment
        t0_sat = t0 + (r0 - rs0) / (
            C.cp_air / C.hlv + C.hlv * rs0 / (C.rvgas * t0 * t0)
        )
        plcl = jnp.where(saturated, p0, plcl)

        # ---- parcel ascent scan (surface -> top) ----
        def ascent_step(carry, inputs):
            (tp_prev, rp_prev, p_prev, passed_lcl, cape, cin, nocape, stopped,
             klzb, failed) = carry
            (k, pf, ph_lo, ph_hi, t_env_v) = inputs
            # ph_lo = p_half(k+1) (below), ph_hi = p_half(k) (above)
            dlnph = jnp.log(ph_lo / ph_hi)

            is_surface = k == L - 1
            below_lcl = jnp.logical_and(~passed_lcl, pf > plcl)

            # (a) dry-adiabat branch (below LCL)
            tp_dry = theta0 * (pf / pref) ** kappa
            es_dry = svp.es(tp_dry)
            rp_dry = self._mixing_ratio(es_dry, pf)
            cin_dry = cin + C.rdgas * (t_env_v - self._virtual_temp_r(tp_dry, r0)) * dlnph

            # (b) LCL-crossing branch: two-step from (tlcl, plcl)
            dtdlnp1 = self._moist_dtdlnp(tlcl, r0_safe)
            tp_half = tlcl + dtdlnp1 * jnp.log(pf / plcl) / 2.0
            rp_half = self._mixing_ratio(svp.es(tp_half), (pf + plcl) / 2.0)
            dtdlnp2 = self._moist_dtdlnp(tp_half, rp_half)
            tp_lcl = tlcl + dtdlnp2 * jnp.log(pf / plcl)

            # (c) moist-ascent branch from previous level
            dtdlnp1m = self._moist_dtdlnp(tp_prev, rp_prev)
            tp_mh = tp_prev + dtdlnp1m * jnp.log(pf / p_prev) / 2.0
            rp_mh = self._mixing_ratio(svp.es(tp_mh), (pf + p_prev) / 2.0)
            dtdlnp2m = self._moist_dtdlnp(tp_mh, rp_mh)
            tp_moist = tp_prev + dtdlnp2m * jnp.log(pf / p_prev)

            # (d) saturated-surface special case
            rp_sat0 = self._mixing_ratio(svp.es(t0_sat), p0)

            at_lcl = jnp.logical_and(~passed_lcl, ~below_lcl)
            tp_k = jnp.where(below_lcl, tp_dry, jnp.where(at_lcl, tp_lcl, tp_moist))
            tp_k = jnp.where(jnp.logical_and(is_surface, saturated), t0_sat, tp_k)
            use_moist = ~below_lcl
            rp_k = jnp.where(
                use_moist, self._mixing_ratio(svp.es(tp_k), pf), rp_dry
            )
            rp_k = jnp.where(jnp.logical_and(is_surface, saturated), rp_sat0, rp_k)

            # Tmin guard -> whole column marked failed (no cape) if still nocape
            failed_now = jnp.logical_and(tp_k < cfg.Tmin, nocape)
            failed = jnp.logical_or(failed, failed_now)

            # buoyancy bookkeeping (moist region only; dry region handled above)
            tp_v = self._virtual_temp_r(tp_k, rp_k)
            buoyant = tp_v >= t_env_v
            # surface level never accumulates (dry contribution is zero there too)
            active = jnp.logical_and(~stopped, ~failed)
            in_moist = jnp.logical_and(use_moist, jnp.logical_and(active, ~is_surface))
            add_cape = jnp.logical_and(in_moist, buoyant)
            add_cin = jnp.logical_and(in_moist, jnp.logical_and(~buoyant, nocape))
            hit_lzb = jnp.logical_and(in_moist, jnp.logical_and(~buoyant, ~nocape))

            cape = cape + jnp.where(add_cape, C.rdgas * (tp_v - t_env_v) * dlnph, 0.0)
            cin = jnp.where(jnp.logical_and(below_lcl, active), cin_dry, cin)
            cin = cin + jnp.where(add_cin, C.rdgas * (t_env_v - tp_v) * dlnph, 0.0)
            nocape = jnp.where(add_cape, False, nocape)
            klzb = jnp.where(
                jnp.logical_and(hit_lzb, klzb == 0),
                (k + 1).astype(klzb.dtype), klzb,
            )
            stopped = jnp.logical_or(stopped, hit_lzb)

            passed_lcl = jnp.logical_or(passed_lcl, use_moist)
            new_carry = (
                jnp.where(active, tp_k, tp_prev),
                jnp.where(active, rp_k, rp_prev),
                jnp.where(active, pf, p_prev),
                passed_lcl, cape, cin, nocape, stopped, klzb, failed,
            )
            tp_out = jnp.where(active, tp_k, tin_at(k))
            rp_out = jnp.where(active, rp_k, rin_at(k))
            return new_carry, (tp_out, rp_out)

        def tin_at(k):
            return jnp.take(tin, k, axis=-1)

        def rin_at(k):
            return jnp.take(rin, k, axis=-1)

        shape = t0.shape
        carry0 = (
            t0, r0, p0,
            jnp.broadcast_to(saturated, shape),
            jnp.zeros(shape, tin.dtype), jnp.zeros(shape, tin.dtype),
            jnp.ones(shape, bool), jnp.zeros(shape, bool),
            jnp.zeros(shape, jnp.int32), jnp.broadcast_to(no_moisture, shape),
        )
        ks = jnp.arange(L - 1, -1, -1)
        xs = (
            ks,
            jnp.moveaxis(p_full[..., ::-1], -1, 0),
            jnp.moveaxis(p_half[..., 1:][..., ::-1], -1, 0),
            jnp.moveaxis(p_half[..., :-1][..., ::-1], -1, 0),
            jnp.moveaxis(tin_v[..., ::-1], -1, 0),
        )
        carry, (tp_rev, rp_rev) = jax.lax.scan(ascent_step, carry0, xs)
        (_, _, _, _, cape, cin, nocape, _, klzb, failed) = carry
        tp = jnp.moveaxis(tp_rev, 0, -1)[..., ::-1]
        rp = jnp.moveaxis(rp_rev, 0, -1)[..., ::-1]

        cape = jnp.where(failed, 0.0, cape)
        cin = jnp.where(failed, 0.0, cin)
        klzb = jnp.where(jnp.logical_or(failed, nocape), 0, klzb)
        tp = jnp.where(failed[..., None], tin, tp)
        rp = jnp.where(failed[..., None], rin, rp)
        return tp, rp, cape, cin, klzb

    # -- main ---------------------------------------------------------
    def __call__(self, dt, tin, qin, p_full, p_half) -> ConvectionResult:
        """All inputs level-last (..., L) / (..., L+1)."""
        cfg, C, svp = self.config, self.C, self.svp
        L = tin.shape[-1]
        rin = qin / (1.0 - qin)
        tp, rp, cape, cin, klzb = self.ascent(tin, qin, p_full, p_half)

        has_cape = jnp.logical_and(cape > 0.0, klzb > 0)

        # ---- reference profiles ----
        kidx = jnp.arange(L)
        in_conv = jnp.logical_and(has_cape[..., None], kidx >= klzb[..., None])
        eref = cfg.rhbm * p_full * rp / (rp + C.rdgas / C.rvgas)
        rref = self._mixing_ratio(eref, p_full)
        qref = jnp.where(in_conv, rref / (1.0 + rref), qin)
        tref = jnp.where(in_conv, tp, tin)

        dp = p_half[..., 1:] - p_half[..., :-1]   # positive
        deltaq = jnp.where(in_conv, -(qin - qref) * dt / cfg.tau_bm, 0.0)
        deltaT = jnp.where(in_conv, -(tin - tref) * dt / cfg.tau_bm, 0.0)
        Pq = jnp.sum(jnp.where(in_conv, deltaq * (-dp), 0.0), axis=-1) / C.grav
        Pt = jnp.sum(
            jnp.where(in_conv, (C.cp_air / C.hlv) * deltaT * dp, 0.0), axis=-1
        ) / C.grav

        deep = jnp.logical_and(has_cape, jnp.logical_and(Pq > 0, Pt > 0))
        shallow = jnp.logical_and(has_cape, jnp.logical_and(Pt > 0, Pq <= 0))
        none = jnp.logical_and(~deep, ~shallow)

        # ---- deep convection ----
        # Pq > Pt: rescale moisture timescale; else shift Tref (enthalpy)
        scale_q = jnp.where(Pq > Pt, Pt / jnp.where(Pq != 0, Pq, 1.0), 1.0)
        deltaq_deep = jnp.where(
            (deep & (Pq > Pt))[..., None], scale_q[..., None] * deltaq, deltaq
        )
        dk_num = -jnp.sum(
            jnp.where(in_conv, (deltaT + (C.hlv / C.cp_air) * deltaq_deep) * dp, 0.0),
            axis=-1,
        )
        dp_conv = jnp.sum(jnp.where(in_conv, dp, 0.0), axis=-1)
        deltak = dk_num / jnp.where(dp_conv > 0, dp_conv, 1.0)
        apply_shift = (deep & (Pq <= Pt))[..., None] & in_conv
        deltaT_deep = jnp.where(apply_shift, deltaT + deltak[..., None], deltaT)
        tref = jnp.where(apply_shift, tref + (deltak * cfg.tau_bm / dt)[..., None], tref)
        rain_deep = jnp.where(Pq > Pt, Pt, Pq)

        # ---- shallow convection: find zero-precipitation depth ----
        # remove levels from kLZB downward while cumulative Pq < 0
        contrib = jnp.where(in_conv, deltaq * (-dp) / C.grav, 0.0)
        # cumulative Pq after removing levels klzb..j (scan top->bottom)
        csum = jnp.cumsum(contrib, axis=-1)
        total = csum[..., -1:]
        pq_after_removing = total - csum  # removing rows klzb..j leaves rows j+1..
        # walk: k_top = first j (>= klzb) where Pq_after_removing(j) > 0... the
        # reference stops at the first k where running Pq becomes >= 0.
        found_j = pq_after_removing > 0.0
        any_found = jnp.any(found_j, axis=-1)
        k_top = jnp.argmax(found_j, axis=-1)  # first True
        in_shallow = kidx >= k_top[..., None]
        # rescale deltaq at k_top so remaining precip is exactly zero
        pq_rem = jnp.take_along_axis(pq_after_removing, k_top[..., None], axis=-1)[..., 0]
        # note: pq_rem is Pq after removing k_top itself; the reference defines
        # c = Pq_remaining*g / (deltaq(k_top)*(p_half(k_top+1)-p_half(k_top)))
        dq_ktop = jnp.take_along_axis(deltaq, k_top[..., None], axis=-1)[..., 0]
        dp_ktop = jnp.take_along_axis(dp, k_top[..., None], axis=-1)[..., 0]
        c_fac = pq_rem * C.grav / jnp.where(
            dq_ktop * dp_ktop != 0, dq_ktop * dp_ktop, 1.0
        )
        is_ktop = kidx == k_top[..., None]
        sh_mask = shallow[..., None] & any_found[..., None]
        deltaq_sh = jnp.where(sh_mask & ~in_shallow, 0.0, deltaq)
        deltaq_sh = jnp.where(sh_mask & is_ktop, deltaq * c_fac[..., None], deltaq_sh)
        deltaT_sh = jnp.where(sh_mask & ~in_shallow, 0.0, deltaT)
        deltaT_sh = jnp.where(sh_mask & is_ktop, deltaT * c_fac[..., None], deltaT_sh)
        # enthalpy shift over k_top..surface
        dknum_sh = jnp.sum(jnp.where(in_shallow, deltaT_sh * (-dp), 0.0), axis=-1)
        dp_sh = jnp.sum(jnp.where(in_shallow, dp, 0.0), axis=-1)
        deltak_sh = dknum_sh / jnp.where(dp_sh > 0, dp_sh, 1.0)
        deltaT_sh = jnp.where(
            sh_mask & in_shallow, deltaT_sh + deltak_sh[..., None], deltaT_sh
        )
        tref_sh = jnp.where(
            sh_mask & in_shallow, tref + (deltak_sh * cfg.tau_bm / dt)[..., None], tref
        )

        # ---- combine branches ----
        deltaT_out = jnp.where(
            deep[..., None], deltaT_deep,
            jnp.where(sh_mask, deltaT_sh, jnp.where(none[..., None], 0.0, deltaT)),
        )
        deltaq_out = jnp.where(
            deep[..., None], deltaq_deep,
            jnp.where(sh_mask, deltaq_sh, jnp.where(none[..., None], 0.0, deltaq)),
        )
        # shallow-without-zero-level and 'none' -> no convection at all
        dead = none | (shallow & ~any_found)
        deltaT_out = jnp.where(dead[..., None], 0.0, deltaT_out)
        deltaq_out = jnp.where(dead[..., None], 0.0, deltaq_out)
        tref_out = jnp.where(
            dead[..., None], tin, jnp.where(sh_mask, tref_sh, tref)
        )
        qref_out = jnp.where(dead[..., None], qin, qref)
        rain = jnp.where(deep, rain_deep, 0.0)
        convflag = jnp.where(deep, 2, jnp.where(has_cape, 1, 0))

        return ConvectionResult(
            deltaT=deltaT_out, deltaq=deltaq_out, rain=jnp.maximum(rain, 0.0),
            cape=cape, cin=cin, convflag=convflag, tref=tref_out, qref=qref_out,
        )
