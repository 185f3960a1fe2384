"""Relaxed Arakawa-Schubert (RAS) deep convection.

TPU-native re-design of src/atmos_param/ras/ras.f90 (Moorthi & Suarez 1992
as implemented in FMS):
  - RAS driver (:491-1309): parcel LCL cloud base, ensemble of cloud types
    (one per detrainment level, bottom-up by default), sequential relaxation
    (each cloud updates theta/qvap before the next), convective-scale
    precipitation evaporation.
  - RAS_CLOUD (:1315-1939): entrainment parameter from cloud-top neutral
    buoyancy, normalized mass-flux profile eta, cloud work function against
    the Arakawa-Schubert climatological critical value (a(p) table), kernel
    akm, and the resulting theta/q/(u,v) tendencies and precipitation.
  - COMP_LCL (:1944-2009), RAS_CEVAP (:2014-2112), RAS_CLOUD_EXIST (:2179).

Vectorization: the reference loops over columns and, per cloud type, runs
sequential level recurrences (moist-static build, work-function, kernel).
These telescope into masked suffix cumulative sums over the level axis, so
each cloud type is closed-form array math over every column at once. The
only true sequencing — the *relaxed* part, each cloud modifying the sounding
the next one sees — is an unrolled loop over the ~L-3 cloud types (each with
a static detrainment level, keeping all the level indexing static), plus a
small `lax.scan` for the precipitation re-evaporation's downward
accumulation. Not ported: random cloud ordering (ncrnd>0; off by default),
the do_strat ql/qi/qa detrainment couplings and modify_pbl (off by default).

Levels are (..., L), index 0 = top, as everywhere in the physics layer.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from isca_tpu.constants import Constants, EARTH

# Arakawa-Schubert climatological critical cloud work function
# (ras.f90:43-48 data, scaled by facm=0.01 at init :294-298)
_PH = 100.0 * np.array([150.0, 200.0, 250.0, 300.0, 350.0, 400.0, 450.0,
                        500.0, 550.0, 600.0, 650.0, 700.0, 750.0, 800.0, 850.0])
_A = 0.01 * np.array([1.6851, 1.1686, 0.7663, 0.5255, 0.4100, 0.3677,
                      0.3151, 0.2216, 0.1521, 0.1082, 0.0750, 0.0664,
                      0.0553, 0.0445, 0.0633])
_ACTOP = 1.7 * 0.01


@dataclasses.dataclass(frozen=True)
class RASConfig:
    """ras_nml (ras.f90:71-176)."""
    fracs: float = 0.25
    rasal0: float = 0.25
    puplim: float = 20.0e2
    aratio: float = 1.4
    cufric: bool = False
    rh_trig: float = 0.0
    alm_min: float = 0.0
    tokioka_on: bool = False
    tokioka_con: float = 0.05
    tokioka_plim: float = 500.0e2
    krmax: int = 2               # shallowest detrainment level (1-based)
    botop: bool = True           # bottom-up cloud ordering
    rn_ptop: float = 500.0e2
    rn_pbot: float = 800.0e2
    rn_frac_bot: float = 0.8
    rn_frac_top: float = 1.0
    evap_on: bool = True
    cfrac: float = 0.05
    hcevap: float = 0.80
    constants: Constants = EARTH


class RASResult(NamedTuple):
    dt_t: jax.Array      # (..., L) temperature increment over dtime [K]
    dt_q: jax.Array
    dt_u: jax.Array
    dt_v: jax.Array
    rain: jax.Array      # (...,) kg/m2 over the step
    snow: jax.Array
    klcl: jax.Array      # (...,) cloud-base level index (0-based)
    precip_ev: jax.Array


def _suffix_sum(x, mask):
    """S(l) = sum_{j >= l} x_j mask_j along the last axis (inclusive)."""
    xm = jnp.where(mask, x, 0.0)
    return jnp.flip(jnp.cumsum(jnp.flip(xm, -1), -1), -1)


def _take(a, idx):
    return jnp.take_along_axis(a, idx[..., None], axis=-1)[..., 0]


def _shift_up(a):
    """a(l+1) -> slot l (value below); last slot repeats (masked anyway)."""
    return jnp.concatenate([a[..., 1:], a[..., -1:]], axis=-1)


def _shift_dn(a):
    """a(l-1) -> slot l (value above); first slot repeats (masked anyway)."""
    return jnp.concatenate([a[..., :1], a[..., :-1]], axis=-1)


class RAS:
    def __init__(self, config: RASConfig, svp):
        self.config = config
        self.svp = svp
        tem = np.zeros(15)
        au = np.zeros(15)
        ad = np.zeros(15)
        ac = np.zeros(15)
        tem[1:] = _PH[1:] - _PH[:-1]
        au[1:] = _A[:-1] / tem[1:]
        ad[1:] = _A[1:] / tem[1:]
        ac[1:] = _PH[1:] * au[1:] - _PH[:-1] * ad[1:]
        ad[1:] = ad[1:] - au[1:]
        self.ac = jnp.asarray(ac)
        self.ad = jnp.asarray(ad)
        self.rn_pfac = (config.rn_frac_top - config.rn_frac_bot) / (
            config.rn_pbot - config.rn_ptop)

    def _qsat(self, t, p):
        """qsat and dqsat/dT with the pressure-broadening denominator
        (ras.f90:614-618)."""
        C = self.config.constants
        es = self.svp.es(t)
        des = self.svp.des_dt(t)
        d622 = C.rdgas / C.rvgas
        d378 = 1.0 - d622
        denom = jnp.maximum(es, p - d378 * es)
        return d622 * es / denom, d622 * des * p / denom**2

    def comp_lcl(self, t_parc, q_parc, p_parc, p_full):
        """Cloud-base level (COMP_LCL, ras.f90:1944-2009), 0-based."""
        C = self.config.constants
        es = self.svp.es(t_parc)
        qsat = (C.rdgas / C.rvgas) * es / p_parc
        rhum = jnp.clip(q_parc / qsat, 1e-10, 1.0)
        chi = t_parc / (1669.0 - 122.0 * rhum - t_parc)
        p_lcl = p_parc * jnp.exp(chi * jnp.log(rhum))
        p_lcl = jnp.clip(p_lcl, p_full[..., 0], p_parc)
        L = p_full.shape[-1]
        hit = (p_lcl[..., None] >= p_full[..., :-1]) & (
            p_lcl[..., None] <= p_full[..., 1:])
        kidx = jnp.arange(1, L)
        klcl = jnp.max(jnp.where(hit, kidx, 0), axis=-1)
        return jnp.maximum(klcl, L // 2 - 1)   # k_lcl_min = kmax/2

    # ------------------------------------------------------------------
    def _ras_cloud(self, ib, klcl, theta, qvap, uwnd, vwnd, pres_int,
                   pi_int, pi, psfc, alf, bet, gam, cp_by_dp, zbase, hl,
                   rasal, frac):
        """One cloud type with STATIC detrainment level `ib` (0-based),
        vectorized over columns (RAS_CLOUD, ras.f90:1315-1939). klcl varies
        per column; all level recurrences are masked suffix sums.

        Returns (dtheta/dt, dq/dt, du/dt, dv/dt, precip rate)."""
        cfg = self.config
        C = cfg.constants
        L = theta.shape[-1]
        lidx = jnp.arange(L)
        kex = klcl[..., None]
        rhmax = 0.9999
        cp = C.cp_air
        hlL = hl[..., None]

        in_cloud = (lidx >= ib) & (lidx <= kex)
        interior = (lidx > ib) & (lidx < kex)
        below_top = lidx < kex                 # l in [.., k-1]

        qs1 = alf + bet * theta
        qol = jnp.minimum(qs1 * rhmax, qvap)

        # dry static energy with the suffix-accumulated zzl (:1412-1441)
        dpi = pi_int[..., 1:] - pi_int[..., :-1]
        zzl_incl = _suffix_sum(dpi * theta * cp, lidx <= kex)
        ssl = (zzl_incl - dpi * theta * cp) + pi_int[..., 1:] * theta * cp
        hol = ssl + qol * hlL
        hst = ssl + qs1 * hlL

        # eta pre-entrainment: suffix sums of cp/g * dtheta; the ic layer
        # uses (pi_int(ic+1) - pi(ic)) (:1438-1441)
        deta_base = jnp.where(lidx == ib, (pi_int[..., 1:] - pi) * theta,
                              dpi * theta) * (cp / C.grav)
        eta0 = _suffix_sum(deta_base, in_cloud & below_top)
        eta0 = jnp.where(lidx > kex - 1, 0.0, eta0)

        hol_k = _take(hol, klcl)
        hst_ic = hst[..., ib]
        hst_ic1 = hst[..., ib + 1]
        hol_ic = hol[..., ib]
        hol_ic1 = hol[..., ib + 1]
        qol_ic = qol[..., ib]
        qol_ic1 = qol[..., ib + 1]

        xx1 = hol_k - hst_ic
        xx2 = jnp.sum(jnp.where(in_cloud & below_top,
                                (hst_ic[..., None] - hol) * deta_base, 0.0),
                      axis=-1)
        lcase1 = (xx2 > 0.0) & (xx1 > 0.0)
        lcase2 = (xx1 <= 0.0) & (hol_k > hst_ic1) & (ib + 1 < klcl)

        alm = jnp.where(lcase1, xx1 / jnp.where(xx2 != 0.0, xx2, 1.0), 0.0)
        alm_floor = jnp.full_like(alm, cfg.alm_min)
        if cfg.tokioka_on:
            pmid = 0.5 * (pres_int[..., ib] + pres_int[..., ib + 1])
            alm_floor = jnp.where(pmid <= cfg.tokioka_plim,
                                  cfg.tokioka_con / zbase, alm_floor)
        active = (lcase1 | lcase2) & (alm >= alm_floor)

        eta = jnp.where(in_cloud & below_top, 1.0 + alm[..., None] * eta0,
                        jnp.where(lidx == kex, 1.0, 0.0))
        eta_p1 = _shift_up(eta)
        deta = jnp.where(in_cloud & below_top, eta - eta_p1, 0.0)
        eta_ic = eta[..., ib]
        eta_ic1 = eta[..., ib + 1]

        # --- cloud work function (:1178-1215) ------------------------------
        # hcc(l) = hol(k) + sum_{j=l..k-1} deta_j hol_j
        hcc = hol_k[..., None] + _suffix_sum(deta * hol, below_top)
        hcc_p1 = _shift_up(hcc)
        dpib = pi_int[..., 1:] - pi
        dpit = pi - pi_int[..., :-1]
        wfn = jnp.sum(jnp.where(
            interior,
            (hcc_p1 * dpib + hcc * dpit
             - (eta_p1 * dpib + eta * dpit) * hst) * gam, 0.0), axis=-1)
        wfn = wfn + jnp.where(
            lcase1,
            gam[..., ib] * dpib[..., ib] * (hcc[..., ib + 1] - hst_ic * eta_ic1),
            0.0)

        # --- critical work function (:1216-1241) ---------------------------
        pmid0 = 0.5 * (pres_int[..., ib] + pres_int[..., ib + 1])
        if ib + 2 < L:
            ftop = jnp.where(
                hst_ic1 < hst_ic,
                (hst_ic1 - hol_k) / jnp.where(hst_ic1 != hst_ic,
                                              hst_ic1 - hst_ic, 1.0), 0.0)
            p_alt = 0.5 * (pres_int[..., ib + 1] + pres_int[..., ib + 2])
            pmid = jnp.where(lcase2, p_alt * (1.0 - ftop) + pmid0 * ftop,
                             pmid0)
            ftop = jnp.where(lcase2, ftop, 1.0)
        else:
            ftop = jnp.ones_like(pmid0)
            pmid = pmid0
        pk_int = _take(pres_int, klcl)        # pres_int(k)
        iwk = (pmid * 0.02e-2 - 0.999999999).astype(jnp.int32)  # 1-based
        tab = (self.ac[jnp.clip(iwk - 1, 0, 14)].astype(pmid.dtype)
               + pmid * self.ad[jnp.clip(iwk - 1, 0, 14)].astype(pmid.dtype))
        wfn_crit = jnp.where(iwk <= 1, _ACTOP,
                             jnp.where(iwk > 15, float(_A[14]), tab))
        wfn = wfn - cfg.aratio * wfn_crit * (pk_int - pmid)
        lcase1 = lcase1 & (wfn > 0.0)
        lcase2 = lcase2 & (wfn > 0.0) & (ftop > 0.0)
        active = active & (lcase1 | lcase2)

        # --- detrainment-level properties (:1246-1266) ---------------------
        dhic = jnp.where(lcase1, hst_ic - hol_ic,
                         (hol_k - hol_ic1) - (hol_ic - hol_ic1) * ftop)
        mix_h = ftop * (hol_ic - hol_ic1) + hol_ic1
        mix_q = ftop * (qol_ic - qol_ic1) + qol_ic1
        sic = mix_h - mix_q * hl
        qs1_ic = jnp.where(lcase2, mix_q + dhic / hl, qs1[..., ib])

        # --- updraft totals (:1268-1285) -----------------------------------
        def updraft(f):
            return _take(f, klcl) + jnp.sum(
                jnp.where(in_cloud & below_top, deta * f, 0.0), axis=-1)
        wlq = updraft(qol) - qs1_ic * eta_ic
        uht = updraft(uwnd) - uwnd[..., ib] * eta_ic
        vht = updraft(vwnd) - vwnd[..., ib] * eta_ic

        # --- theta-transport kernel array ("hol" reuse, :1689-1713) --------
        th_m1 = _shift_dn(theta)
        pi_m1 = _shift_dn(pi)
        cp_by_dp_m1 = _shift_dn(cp_by_dp)
        grad = jnp.where(lidx == kex, (th_m1 - theta) / (pi - pi_m1),
                         (th_m1 - theta) * eta / (pi - pi_m1))
        A = grad * (pi_int[..., :-1] - pi_m1) * pi * cp_by_dp
        B = grad * (pi - pi_int[..., :-1]) * pi_m1 * cp_by_dp_m1
        B_above = _shift_up(B)
        holT = (jnp.where((lidx > ib) & (lidx <= kex), A, 0.0)
                + jnp.where((lidx >= ib) & below_top, B_above, 0.0))
        akm = -jnp.sum(jnp.where(
            interior, holT * (eta * dpit + eta_p1 * dpib) / pi, 0.0), axis=-1)

        # --- precipitation fraction (:1720-1745) ---------------------------
        rn_frac = jnp.where(
            pmid0 > cfg.rn_pbot, cfg.rn_frac_bot,
            jnp.where(pmid0 >= cfg.rn_ptop,
                      (cfg.rn_pbot - pmid0) * self.rn_pfac + cfg.rn_frac_bot,
                      cfg.rn_frac_top))
        wdet = (1.0 - rn_frac) * wlq
        wlq = rn_frac * wlq

        # xx1 starts from the KERNEL array's ic slot (B deposited from above),
        # not the original moist static energy (ras.f90:1749 'xx1 = hol(ic)'
        # after the kernel overwrite; hic saved the original earlier)
        xx1d = holT[..., ib] + jnp.where(
            lcase2, (sic - hol_ic + qol_ic * hl) * (cp_by_dp[..., ib] / cp),
            0.0)
        holT = holT.at[..., ib].set(xx1d - wdet * hl * cp_by_dp[..., ib] / cp)
        akm = akm - jnp.where(
            lcase1, eta_ic1 * dpib[..., ib] * xx1d / pi[..., ib], 0.0)

        # --- moist-static transport gmh (:1764-1806) -----------------------
        qol_m1 = _shift_dn(qol)
        dq_eta = jnp.where(lidx == kex, qol_m1 - qol, (qol_m1 - qol) * eta)
        dq_eta = jnp.where((lidx > ib) & (lidx <= kex), dq_eta, 0.0)
        xx3 = dq_eta + _shift_up(dq_eta) * ((lidx + 1) <= kex)
        gmh = holT + xx3 * cp_by_dp * hlL * 0.5 / cp
        gmh = jnp.where((lidx > ib) & (lidx <= kex), gmh, 0.0)

        dq_ic1 = dq_eta[..., ib + 1]
        xx2g = dq_ic1 + jnp.where(
            lcase2, 2.0 * (hol_k - dhic - sic - qol_ic * hl) / hl, 0.0)
        gmh = gmh.at[..., ib].set(
            xx1d + cp_by_dp[..., ib] / cp * (xx2g * hl * 0.5 + eta_ic * dhic))

        # akm from gmh (:1794-1806): gsum(l) = gmh(k) + sum_{j=l..k-1} deta gmh
        gsum = _take(gmh, klcl)[..., None] + _suffix_sum(deta * gmh, below_top)
        gam_m1 = _shift_dn(gam)
        gam_up_term = gam_m1 * (pi_int[..., :-1] - pi_m1)
        gam_up_term = jnp.where(lcase2[..., None] & (lidx == ib + 1),
                                0.0, gam_up_term)
        akm = akm + jnp.sum(jnp.where(
            interior, gsum * (gam_up_term + gam * dpit), 0.0), axis=-1)
        km1 = jnp.maximum(klcl - 1, 0)
        akm = akm + _take(gam, km1) * (
            _take(pi_int[..., :-1], klcl) - _take(pi, km1)) * _take(gmh, klcl)

        # --- lcase2 ftop re-evaluation + level shuffle (:1824-1847) --------
        if ib + 2 < L:
            xx1f = pmid0 + 0.5 * (pres_int[..., ib + 2] - pres_int[..., ib]) \
                * (1.0 - ftop)
            xx2f = pres_int[..., ib + 1]
            xx3f = 0.5 * (pres_int[..., ib + 1] + pres_int[..., ib + 2])
            in_band = (xx1f >= xx2f) & (xx1f < xx3f)
            ftop_new = jnp.where(in_band, 1.0 - (xx1f - xx2f) / (xx3f - xx2f),
                                 jnp.where(xx1f < xx2f, 1.0, 0.0))
            shuffle = lcase2 & in_band
            ratio = cp_by_dp[..., ib + 1] / cp_by_dp[..., ib]
            holT = holT.at[..., ib + 1].add(
                jnp.where(shuffle, holT[..., ib] * ratio, 0.0))
            gmh = gmh.at[..., ib + 1].add(
                jnp.where(shuffle, gmh[..., ib] * ratio, 0.0))
            holT = holT.at[..., ib].set(jnp.where(shuffle, 0.0, holT[..., ib]))
            gmh = gmh.at[..., ib].set(jnp.where(shuffle, 0.0, gmh[..., ib]))
            ftop = jnp.where(lcase2, ftop_new, ftop)

        # --- relaxation amplitude (:1849-1872) -----------------------------
        rasalf = jnp.maximum(
            rasal * (pres_int[..., ib + 1] - cfg.puplim)
            / (psfc - cfg.puplim), 0.0)
        ok = (akm < 0.0) & (wlq >= 0.0) & active
        wfn_f = jnp.where(ok, -ftop * wfn * rasalf
                          / jnp.where(akm != 0.0, akm, -1.0), 0.0)
        wfn_f = jnp.minimum(wfn_f, (psfc - pk_int) * frac)
        wfn_f = jnp.where(ok, jnp.maximum(wfn_f, 0.0), 0.0)

        dpcu = wlq * wfn_f / C.grav
        wfnL = wfn_f[..., None]
        dtcu = jnp.where(in_cloud, wfnL / cp * holT / pi, 0.0)
        dqcu = jnp.where(in_cloud, wfnL / hlL * (gmh - holT), 0.0)

        if cfg.cufric:
            # (:1908-1936) in-cloud momentum mixing
            u_m1, v_m1 = _shift_dn(uwnd), _shift_dn(vwnd)
            dut = jnp.where(lidx == kex, u_m1 - uwnd, (u_m1 - uwnd) * eta)
            dvt = jnp.where(lidx == kex, v_m1 - vwnd, (v_m1 - vwnd) * eta)
            dut = jnp.where((lidx > ib) & (lidx <= kex), dut, 0.0)
            dvt = jnp.where((lidx > ib) & (lidx <= kex), dvt, 0.0)
            xxm = 0.5 * wfnL / cp * cp_by_dp
            ducu = jnp.where(interior | (lidx == kex),
                             (dut + _shift_up(dut)) * xxm, 0.0)
            dvcu = jnp.where(interior | (lidx == kex),
                             (dvt + _shift_up(dvt)) * xxm, 0.0)
            ducu = ducu.at[..., ib].set(
                (dut[..., ib + 1] + 2.0 * uht) * xxm[..., ib])
            dvcu = dvcu.at[..., ib].set(
                (dvt[..., ib + 1] + 2.0 * vht) * xxm[..., ib])
        else:
            ducu = jnp.zeros_like(dtcu)
            dvcu = jnp.zeros_like(dtcu)
        return dtcu, dqcu, ducu, dvcu, dpcu

    # ------------------------------------------------------------------
    def _cevap(self, ib, temp, qvap, pres, mass, qsat, dqsat, psfc, hl,
               dtime, dpcu):
        """Evaporation of convective precip (RAS_CEVAP, ras.f90:2014-2112):
        sequential downward drawdown of the precip flux."""
        cfg = self.config
        C = cfg.constants
        cem, ceta = 0.054, -544.0e-6
        L = temp.shape[-1]
        active = jnp.arange(L) > ib

        mv = lambda a: jnp.moveaxis(a, -1, 0)
        xs = (mv(temp), mv(qvap), mv(pres), mv(mass), mv(qsat), mv(dqsat),
              jnp.broadcast_to(active[(...,) + (None,) * (temp.ndim - 1)],
                               (L,) + temp.shape[:-1]))

        def step(dpevap, x):
            t_k, q_k, p_k, m_k, qs_k, dqs_k, act = x
            prec = jnp.maximum(dpcu - dpevap, 0.0)
            prec_mmph = prec * 3600.0 / dtime
            emx = jnp.sqrt(cem * cfg.cfrac * prec_mmph * jnp.sqrt(p_k / psfc))
            evef = 1.0 - jnp.exp(ceta * dtime * emx)
            cond = act & (cfg.hcevap * qs_k >= q_k) & (prec > 0.0)
            deficit = (cfg.hcevap * qs_k - q_k) / (
                1.0 + hl * cfg.hcevap * dqs_k / C.cp_air)
            deficit = jnp.minimum(evef * deficit, prec / m_k)
            deficit = jnp.where(cond, deficit, 0.0)
            return dpevap + deficit * m_k, deficit

        dpevap, defs = jax.lax.scan(step, jnp.zeros_like(dpcu), xs)
        dq = jnp.moveaxis(defs, 0, -1)
        dt = -dq * hl[..., None] / C.cp_air
        return dt, dq, dpevap

    # ------------------------------------------------------------------
    def _cloud_exist(self, ic, klcl, qvap, qsat, theta, pi_int, hl):
        """Instability for the deepest cloud (RAS_CLOUD_EXIST, :2179-2229)."""
        C = self.config.constants
        L = theta.shape[-1]
        lidx = jnp.arange(L)
        kex = klcl[..., None]
        cp = C.cp_air
        hlL = hl[..., None]
        dpi = pi_int[..., 1:] - pi_int[..., :-1]
        zzl_incl = _suffix_sum(dpi * theta * cp, lidx <= kex)
        ssl = (zzl_incl - dpi * theta * cp) + pi_int[..., 1:] * theta * cp
        hst = ssl + qsat * hlL
        qol_k = jnp.minimum(_take(qsat, klcl) * 0.9999, _take(qvap, klcl))
        hol_k = _take(pi_int[..., 1:], klcl) * _take(theta, klcl) * cp \
            + qol_k * hl
        hst_min = jnp.min(jnp.where((lidx >= ic) & (lidx <= kex), hst,
                                    jnp.inf), axis=-1)
        return hol_k > hst_min

    # ------------------------------------------------------------------
    def __call__(self, dtime, temp0, qvap0, uwnd0, vwnd0, p_full, p_half,
                 z_half, coldT=None) -> RASResult:
        """Full RAS step. Level-last (..., L), top-down; p in Pa.
        Returns increments over dtime (add to the state)."""
        cfg = self.config
        C = cfg.constants
        L = temp0.shape[-1]
        shape2d = temp0.shape[:-1]
        if coldT is None:
            coldT = jnp.zeros(shape2d, bool)
        hl = jnp.where(coldT, C.hls, C.hlv)

        frac = cfg.fracs / dtime
        rasal = cfg.rasal0 / dtime

        qsat0, dqsat0 = self._qsat(temp0, p_full)

        t_parc, q_parc, p_parc = temp0[..., -1], qvap0[..., -1], p_full[..., -1]
        klcl = self.comp_lcl(t_parc, q_parc, p_parc, p_full)
        qs_parc = self._qsat(t_parc, p_parc)[0]
        rhtrig = q_parc >= cfg.rh_trig * qs_parc

        psfc = p_half[..., -1]
        mass_p = jnp.maximum(p_half[..., 1:] - p_half[..., :-1], 1e-5)
        pi_int = (p_half / 1.0e5) ** C.kappa
        pi = (pi_int[..., 1:] * p_half[..., 1:]
              - pi_int[..., :-1] * p_half[..., :-1]) / (
            mass_p * (1.0 + C.kappa))
        pi = jnp.maximum(pi, 1e-5)
        cp_by_dp = C.cp_air / mass_p
        mass = mass_p / C.grav
        zbase = _take(z_half, klcl) - z_half[..., -1]

        theta = temp0 / pi
        # frozen linearization about the input sounding (setras once)
        alf = qsat0 - dqsat0 * temp0
        bet = dqsat0 * pi
        gam = 1.0 / ((1.0 + hl[..., None] * dqsat0 / C.cp_air) * pi)

        ic_min = cfg.krmax            # 0-based index of the deepest cloud top
        exist = self._cloud_exist(ic_min, klcl, qvap0, qsat0, theta,
                                  pi_int, hl)
        col_ok = rhtrig & exist

        ibs = list(range(L - 2, cfg.krmax - 1, -1))
        if not cfg.botop:
            ibs = ibs[::-1]

        qvap = qvap0
        uwnd, vwnd = uwnd0, vwnd0
        zeros3 = jnp.zeros_like(temp0)
        d_t, d_q, d_u, d_v = zeros3, zeros3, zeros3, zeros3
        precip = jnp.zeros(shape2d, temp0.dtype)
        precip_ev = jnp.zeros(shape2d, temp0.dtype)

        for ib in ibs:
            valid = col_ok & (ib < klcl)
            dtcu, dqcu, ducu, dvcu, dpcu = self._ras_cloud(
                ib, klcl, theta, qvap, uwnd, vwnd, p_half, pi_int, pi,
                psfc, alf, bet, gam, cp_by_dp, zbase, hl, rasal, frac)
            v3 = valid[..., None]
            dtcu = dtcu * dtime * v3
            dqcu = dqcu * dtime * v3
            ducu = ducu * dtime * v3
            dvcu = dvcu * dtime * v3
            dpcu = dpcu * dtime * valid

            if cfg.evap_on:
                dtev, dqev, dpev = self._cevap(
                    ib, theta * pi, qvap, p_full, mass, qsat0, dqsat0,
                    psfc, hl, dtime, dpcu)
                dtev = dtev * v3
                dqev = dqev * v3
                dpev = dpev * valid
                dtcu = dtcu + dtev / pi
                dqcu = dqcu + dqev
                dpcu = jnp.maximum(dpcu - dpev, 0.0)
                precip_ev = precip_ev + dpev

            theta = theta + dtcu
            qvap = qvap + dqcu
            uwnd = uwnd + ducu
            vwnd = vwnd + dvcu
            d_t = d_t + dtcu * pi
            d_q = d_q + dqcu
            d_u = d_u + ducu
            d_v = d_v + dvcu
            precip = precip + dpcu

        rain = jnp.where(coldT, 0.0, precip)
        snow = jnp.where(coldT, precip, 0.0)
        return RASResult(dt_t=d_t, dt_q=d_q, dt_u=d_u, dt_v=d_v,
                         rain=rain, snow=snow, klcl=klcl,
                         precip_ev=precip_ev)
