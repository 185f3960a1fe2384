"""EDT: entrainment-diffusivity turbulence (Grenier-Bretherton moist TKE BL).

Reference: src/atmos_param/edt/edt.F90 — edt (:715-1534, driver), trbintd
(:1935-2263, interior N2/S2/Ri from liquid-water static energy), exacol
(:2276-2398, convective-layer detection), zisocl (:2409-3027, layer
extension/merging + bulk TKE closure), caleddy (:3041-4500, diffusivities),
galperin (:4511-4552, stability functions), lengthscale (:4563-4592).
Selected by `vert_turb_driver_nml do_edt` (vert_turb_driver.F90:107).

Physics implemented (Grenier & Bretherton 2001, MWR):
  - moist conserved variables: liquid-water static energy sl and total water
    qt; buoyancy coefficients blended between unsaturated (chu, cmu) and
    saturated (chs, cms) limits by the interface saturated fraction
  - N2 = ch dsl/dz + cm dqt/dz, S2, Ri at interfaces (trbintd :2180-2215)
  - convective layers (CLs): interfaces with Ri < rimaxentr(=0), the surface
    interface convective when the surface buoyancy flux is positive; each CL
    gains entrainment interfaces at its top and base and touching CLs merge
  - bulk CL TKE: <e> = b1 <W>, <W> = (-sh*Int[l^2 N2] + sm*Int[l^2 S2]
    + surface TKE flux + cloud-top radiative production)/Int[dz], with
    (sh, sm) = galperin(min(Int l2N2/Int l2S2, ricrit)) and
    l(z) = k z/(1 + k z/(tunl*depth))
  - per-interface TKE shape: rcap = (mu l/L + wcap/<W>)/(mu l/L + 1),
    K_h = l sqrt(e) sh, K_m = l sqrt(e) sm (caleddy :3957-3985)
  - entrainment interfaces: K = dz a1l sqrt(<e>) min(evhc <e>/(dB l), 1)
    with evaporative enhancement evhc = 1 + a2l a3l L ql_top / jump(slv)
    at cloudy tops (caleddy :3781-4078)
  - stable turbulent layers (Ri < ricrit outside CLs): local equilibrium
    e = b1 l^2 (-sh N2 + sm S2), K = l sqrt(e) sh|sm (caleddy :4390-4412)

Deviations (documented; the reference's per-column dynamic loops):
  - zisocl's incremental energy test for extending a CL interface-by-
    interface is replaced by the standard single entrainment interface at
    top and base, with merging of touching CLs (the common fixed point of
    the reference's iteration)
  - the cloud-top radiative production enters the bulk TKE budget linearly
    (trmq term of :3870 without the quadratic root)

All columns batched; connected-component segment reductions are one-hot
matmuls over the (small) level axis.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from isca_tpu.constants import Constants, EARTH
from isca_tpu.physics.sat_vapor_pres import SatVaporPres

# constants (edt.F90:240-279)
B1 = 5.8
TUNL = 0.085
ALPH1, ALPH2, ALPH3, ALPH4, ALPH5 = 0.5562, -4.3640, -34.6764, -6.1272, 0.6986
RICRIT = 0.19
MU = 70.0
A1L = 0.10
A2L = 15.0
A3L = 0.8
EVHCMAX = 10.0
RIMAXENTR = 0.0
TKEMAX = 20.0
TKEMIN = 1.0e-6
NTZERO = 1.0e-10
VONKARM = 0.4
B123 = B1 ** (2.0 / 3.0)


@dataclasses.dataclass(frozen=True)
class EDTConfig:
    qcminfrac: float = 1.0e-3
    constants: Constants = EARTH
    svp: SatVaporPres = SatVaporPres()


class EDTResult(NamedTuple):
    k_m: jax.Array      # (..., L) diffusivity at half level k (interface k)
    k_t: jax.Array
    tke: jax.Array      # (..., L+1) turbulent kinetic energy at interfaces
    ri: jax.Array       # (..., L+1)
    pblh: jax.Array     # (...,)


def galperin(ri):
    """Galperin (1988) stability functions (edt.F90:4511-4552)."""
    ri = jnp.minimum(ri, 0.163)
    trma = ALPH3 * ALPH4 * ri + 2.0 * B1 * (ALPH2 - ALPH4 * ALPH5 * ri)
    trmb = ri * (ALPH3 + ALPH4) + 2.0 * B1 * (-ALPH5 * ri + ALPH1)
    det = jnp.maximum(trmb * trmb - 4.0 * trma * ri, 0.0)
    gh = jnp.clip((-trmb + jnp.sqrt(det)) / (2.0 * trma), -0.28, 0.0233)
    sh = ALPH5 / (1.0 + ALPH3 * gh)
    sm = (ALPH1 + ALPH2 * gh) / ((1.0 + ALPH3 * gh) * (1.0 + ALPH4 * gh))
    return gh, sh, sm


def _lengthscale(height, depth):
    return VONKARM * height / (1.0 + VONKARM * height
                               / (TUNL * jnp.maximum(depth, 1.0)))


def _segments(mask, dtype):
    """Connected runs of True along the last axis -> (segid (..., N) int
    with 0 outside segments and 1..nseg inside, onehot (..., N, S))."""
    n = mask.shape[-1]
    prev = jnp.concatenate(
        [jnp.zeros_like(mask[..., :1]), mask[..., :-1]], axis=-1)
    start = mask & ~prev
    segid = jnp.cumsum(start, axis=-1) * mask          # 0 outside
    nseg_max = (n + 1) // 2 + 1
    onehot = (segid[..., None] == jnp.arange(1, nseg_max + 1)).astype(dtype)
    return segid, onehot


def edt(cfg: EDTConfig, tdtlw, u_star, b_star, t, qv, ql, qi, qa,
        u, v, z_full, p_full, z_half, p_half) -> EDTResult:
    """All (..., L) top-down; z/p_half (..., L+1). tdtlw LW heating [K/s].
    Returns diffusivities at half levels (interface k above full level k)."""
    C = cfg.constants
    L = t.shape[-1]
    dtype = t.dtype
    karr = jnp.arange(L + 1)

    zsurf = z_half[..., -1]
    zm = z_full - zsurf[..., None]                      # full heights AGL
    zi = z_half - zsurf[..., None]                      # interface heights

    qc = ql + qi
    qt = qv + qc
    hleff = (jnp.clip(0.05 * (t - C.tfreeze + 20.0), 0.0, 1.0) * C.hlv
             + jnp.clip(0.05 * (C.tfreeze - t), 0.0, 1.0) * C.hls)
    sl = C.cp_air * t + C.grav * zm - hleff * qc
    slv = sl * (1.0 + C.zvir * qt)

    # saturation at the liquid-water temperature (edt.F90 sfdiag inputs)
    tl = t - hleff * qc / C.cp_air
    esl = cfg.svp.es(tl)
    d622 = C.rdgas / C.rvgas
    qsl = d622 * esl / jnp.maximum(p_full - (1.0 - d622) * esl, 1.0)
    dqsldtl = qsl * hleff / (C.rvgas * tl * tl)

    # buoyancy coefficients (trbintd :2010-2022)
    bfact = C.grav / (t * (1.0 + C.zvir * qv - qc))
    chu = (1.0 + C.zvir * qt) * bfact / C.cp_air
    chs = ((1.0 + (1.0 + C.zvir) * dqsldtl * t)
           / (1.0 + hleff * dqsldtl / C.cp_air)) * bfact / C.cp_air
    cmu = C.zvir * bfact * t
    cms = hleff * chs - bfact * t

    # interface values (average adjacent layers); saturated fraction from
    # the prognosed/diagnosed cloud fraction (simplified sfdiag)
    def iface(a):
        return 0.5 * (a[..., :-1] + a[..., 1:])        # (..., L-1): k=1..L-1

    sfi = jnp.clip(iface(qa), 0.0, 1.0)
    ch = iface(chu) * (1.0 - sfi) + iface(chs) * sfi
    cm = iface(cmu) * (1.0 - sfi) + iface(cms) * sfi
    rdz = 1.0 / (zm[..., :-1] - zm[..., 1:])
    dsldz = (sl[..., :-1] - sl[..., 1:]) * rdz
    dqtdz = (qt[..., :-1] - qt[..., 1:]) * rdz
    n2_i = ch * dsldz + cm * dqtdz
    s2_i = jnp.maximum(((u[..., :-1] - u[..., 1:]) ** 2
                        + (v[..., :-1] - v[..., 1:]) ** 2) * rdz ** 2,
                       NTZERO)
    ri_i = n2_i / s2_i

    # pad to (..., L+1) interfaces: index 0 = model top, L = surface
    pad0 = jnp.zeros_like(ri_i[..., :1])
    n2 = jnp.concatenate([pad0, n2_i, pad0], axis=-1)
    s2 = jnp.concatenate([pad0, s2_i, pad0 + NTZERO], axis=-1)
    ri = jnp.concatenate([pad0, ri_i, pad0], axis=-1)

    bflxs = u_star * b_star                            # surface buoy flux
    tkes = jnp.clip(B123 * u_star ** 2, TKEMIN, TKEMAX)

    # riex: surface interface treated via rimaxentr - bflxs (exacol :2319)
    riex = ri.at[..., -1].set(RIMAXENTR - bflxs)
    core = (riex < RIMAXENTR) & (karr >= 1)
    # entrainment interfaces: one above and one below each core run;
    # touching CLs merge (zisocl fixed point)
    up = jnp.concatenate([core[..., 1:], core[..., :1] & False], axis=-1)
    dn = jnp.concatenate([core[..., :1] & False, core[..., :-1]], axis=-1)
    belongcv = (core | up | dn) & (karr >= 1)

    segid, onehot = _segments(belongcv, dtype)                # (..., L+1, S)
    seg_any = jnp.sum(onehot, axis=-2) > 0             # (..., S)

    # per-interface geometry
    zm_ext = jnp.concatenate([zm, jnp.zeros_like(zm[..., :1])], axis=-1)
    dz_int = jnp.concatenate(
        [jnp.zeros_like(zm[..., :1]), zm[..., :-1] - zm[..., 1:],
         zm[..., -1:]], axis=-1)                       # dz around iface k

    # segment top/base interface heights -> lbulk
    zi_big = jnp.where(belongcv, zi, -jnp.inf)
    zi_small = jnp.where(belongcv, zi, jnp.inf)
    seg_ztop = jnp.max(jnp.where(onehot > 0, zi_big[..., None], -jnp.inf),
                       axis=-2)
    seg_zbot = jnp.min(jnp.where(onehot > 0, zi_small[..., None], jnp.inf),
                       axis=-2)
    seg_ztop = jnp.where(seg_any, seg_ztop, 1.0)
    seg_zbot = jnp.where(seg_any, seg_zbot, 0.0)
    has_sfc = onehot[..., -1, :] > 0                   # segment touches sfc
    zm_low = zm[..., -1]                               # lowest full level

    lbulk = seg_ztop - seg_zbot
    # surface segment: lbulk measured to the lowest full level when the
    # surface buoyancy flux is negative (zisocl :2470-2490)
    lbulk = jnp.where(has_sfc & (bflxs <= 0)[..., None],
                      seg_ztop - zm_low[..., None], lbulk)
    lbulk = jnp.maximum(lbulk, 1.0)

    # per-interface length scale with its segment's lbulk
    lbulk_k = jnp.einsum("...ks,...s->...k", onehot, lbulk)
    leng = _lengthscale(jnp.maximum(zi, 1.0), jnp.maximum(lbulk_k, 1.0))

    # integrals over interior CL interfaces (exclude entrainment edges at
    # the segment top/base; interior = core interfaces)
    interior = core & belongcv & (karr >= 1) & (karr <= L - 1)
    w_int = jnp.where(interior, dz_int, 0.0)
    l2n2 = jnp.einsum("...ks,...k->...s", onehot, w_int * leng ** 2 * n2)
    l2s2 = jnp.einsum("...ks,...k->...s", onehot, w_int * leng ** 2 * s2)
    lint = jnp.einsum("...ks,...k->...s", onehot, w_int)
    # surface TKE contribution (zisocl :2462-2466)
    dwsurf = jnp.where(has_sfc & (bflxs > 0)[..., None],
                       (tkes / B1 * zm_low)[..., None], 0.0)
    lint = lint + jnp.where(has_sfc & (bflxs > 0)[..., None],
                            zm_low[..., None], 0.0)
    lint = jnp.maximum(lint, 1.0)

    ricl = jnp.minimum(l2n2 / jnp.maximum(l2s2, NTZERO), RICRIT)
    ghc, shc, smc = galperin(ricl)

    # cloud-top radiative production: LW flux divergence at the CL top
    dpg = (p_half[..., 1:] - p_half[..., :-1]) / C.grav    # (..., L)
    radflux = -tdtlw * C.cp_air * dpg                      # W/m2 per layer
    rho = p_full / (C.rdgas * t * (1.0 + C.zvir * qv - qc))
    buoy_rad = C.grav * jnp.maximum(radflux, 0.0) / (rho * C.cp_air * t)
    # attribute a layer's radiative buoyancy production to the interface
    # above it when that interface is a CL top edge
    prev_cv = jnp.concatenate(
        [belongcv[..., :1] & False, belongcv[..., :-1]], axis=-1)
    is_top_edge = belongcv & ~prev_cv
    buoy_rad_i = jnp.concatenate([buoy_rad, pad0], axis=-1)
    radf_seg = jnp.einsum("...ks,...k->...s", onehot,
                          jnp.where(is_top_edge, buoy_rad_i * leng
                                    * dz_int, 0.0))

    wint = jnp.maximum(-shc * l2n2 + smc * l2s2 + dwsurf + radf_seg, 0.0)
    wbrk = wint / lint
    ebrk = jnp.clip(B1 * wbrk, TKEMIN, TKEMAX)

    # per-interface TKE and diffusivities inside CLs (caleddy :3940-3990)
    shc_k = jnp.einsum("...ks,...s->...k", onehot, shc)
    smc_k = jnp.einsum("...ks,...s->...k", onehot, smc)
    ebrk_k = jnp.einsum("...ks,...s->...k", onehot, ebrk)
    wbrk_k = jnp.maximum(ebrk_k / B1, TKEMIN)
    wcap = leng ** 2 * (-shc_k * n2 + smc_k * s2)
    mull = MU * leng / jnp.maximum(lbulk_k, 1.0)
    rcap = (mull + wcap / wbrk_k) / (mull + 1.0)
    tke_cv = jnp.clip(ebrk_k * jnp.clip(rcap, 0.0, None), TKEMIN, TKEMAX)
    kvh_cv = leng * jnp.sqrt(tke_cv) * shc_k
    kvm_cv = leng * jnp.sqrt(tke_cv) * smc_k

    # entrainment interfaces (caleddy :4060-4170): replace K at the edges
    next_cv = jnp.concatenate(
        [belongcv[..., 1:], belongcv[..., :1] & False], axis=-1)
    is_base_edge = belongcv & ~next_cv & (karr < L)    # surface not an edge
    jzm = dz_int
    jbu = jnp.maximum(n2 * dz_int, 1.0e-6)
    # evaporative enhancement at cloudy tops: ql just below the top edge
    ql_below = jnp.concatenate([ql, ql[..., -1:]], axis=-1)
    slv_ext = jnp.concatenate([slv, slv[..., -1:]], axis=-1)
    slv_2up = jnp.concatenate([slv_ext[..., :2], slv_ext[..., :-2]], axis=-1)
    jt2slv = jnp.maximum(slv_2up - slv_ext, 1.0)
    hleff_i = jnp.concatenate([hleff, hleff[..., -1:]], axis=-1)
    evhc = jnp.where(ql_below > cfg.qcminfrac * 1.0e-3,
                     jnp.minimum(1.0 + A2L * A3L * hleff_i * ql_below
                                 / jt2slv, EVHCMAX), 1.0)
    kentr_top = (jzm * A1L * jnp.sqrt(ebrk_k)
                 * jnp.minimum(evhc * ebrk_k / (jbu * jnp.maximum(leng, 1.0)),
                               1.0))
    kentr_base = (jzm * A1L * jnp.sqrt(ebrk_k)
                  * jnp.minimum(ebrk_k / (jbu * jnp.maximum(leng, 1.0)), 1.0))
    kvh_cv = jnp.where(is_top_edge, kentr_top, kvh_cv)
    kvm_cv = jnp.where(is_top_edge, kentr_top, kvm_cv)
    kvh_cv = jnp.where(is_base_edge, kvh_cv + kentr_base, kvh_cv)
    kvm_cv = jnp.where(is_base_edge, kvm_cv + kentr_base, kvm_cv)

    # ---- stable turbulent layers (caleddy :4318-4412) ----
    belongst = (ri < RICRIT) & ~belongcv & (karr >= 1)
    belongst = belongst.at[..., -1].set(
        belongst[..., -1] | ~belongcv[..., -1])
    segid_s, onehot_s = _segments(belongst, dtype)
    zi_bs = jnp.where(belongst, zi, -jnp.inf)
    seg_ztop_s = jnp.max(jnp.where(onehot_s > 0, zi_bs[..., None], -jnp.inf),
                         axis=-2)
    seg_ztop_s = jnp.where(jnp.isfinite(seg_ztop_s), seg_ztop_s, 1.0)
    zi_ss = jnp.where(belongst, zi, jnp.inf)
    seg_zbot_s = jnp.min(jnp.where(onehot_s > 0, zi_ss[..., None], jnp.inf),
                         axis=-2)
    seg_zbot_s = jnp.where(jnp.isfinite(seg_zbot_s), seg_zbot_s, 0.0)
    lbulk_s = jnp.maximum(seg_ztop_s - seg_zbot_s, 1.0)
    lbulk_sk = jnp.einsum("...ks,...s->...k", onehot_s, lbulk_s)
    leng_s = _lengthscale(jnp.maximum(zi, 1.0), jnp.maximum(lbulk_sk, 1.0))
    _, sh_s, sm_s = galperin(ri)
    tke_st = jnp.clip(B1 * leng_s ** 2 * (-sh_s * n2 + sm_s * s2),
                      TKEMIN, TKEMAX)
    kvh_st = leng_s * jnp.sqrt(tke_st) * sh_s
    kvm_st = leng_s * jnp.sqrt(tke_st) * sm_s

    kvh = jnp.where(belongcv, kvh_cv, jnp.where(belongst, kvh_st, 0.0))
    kvm = jnp.where(belongcv, kvm_cv, jnp.where(belongst, kvm_st, 0.0))
    kvh = jnp.clip(jnp.nan_to_num(kvh), 0.0, 1.0e4)
    kvm = jnp.clip(jnp.nan_to_num(kvm), 0.0, 1.0e4)
    tke = jnp.where(belongcv, tke_cv, jnp.where(belongst, tke_st, 0.0))
    tke = tke.at[..., -1].set(tkes)

    turb = belongcv | belongst
    pblh = jnp.max(jnp.where(turb[..., 1:], zi[..., 1:], 0.0), axis=-1)

    # diffusivities at our half-level convention (interface k = K[..., k])
    return EDTResult(k_m=kvm[..., :L], k_t=kvh[..., :L],
                     tke=tke, ri=ri, pblh=pblh)
