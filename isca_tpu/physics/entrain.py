"""Entrainment-closure boundary layer (Bretherton-style `entrain` module).

Reference: src/atmos_param/entrain/entrain.F90 (entrain :786-1853, pbl_depth
:1901-1964, radml_depth :2160-2224, diffusivity_pbl :2266-2305).  Selected by
`vert_turb_driver_nml do_entrain` in the reference (vert_turb_driver.F90:110).

The scheme diagnoses two kinds of mixed layers and replaces the boundary-layer
diffusivities within them:

1. *Surface-driven convective PBL* (b_star > 0): PBL top from a lifted surface
   parcel with Monin-Obukhov-scaled excess buoyancy; K profile = MO similarity
   in the inner `frac_inner` fraction, cubic Troen-Mahrt outer profile above
   it; entrainment K at the inversion from the closure
   w_e = beta_surf (V_surf^3 + V_shear^3)/h / (g dslv/slv + W^2/h).
2. *Radiatively-driven mixed layer* (stratocumulus): cloud top located from
   the longwave cooling maximum below `zcldtopmax`; mixed-layer base from a
   cloud-top parcel (radml_depth); radiative velocity scale
   v_rad^3 = g h dR / (rho slv); entrainment K at cloud top with beta_rad,
   interior K ~ 0.85 k v_rad z'^2 sqrt(1-z') profile.

All columns batched; the reference's per-column level searches become masked
argmax reductions over the level axis. Level convention: (..., L) top-down,
matching the reference's k=1 (top) .. nlev (bottom).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from isca_tpu.constants import Constants, EARTH
from isca_tpu.physics.diffusivity import _mo_diff
from isca_tpu.physics.monin_obukhov import MOConfig


@dataclasses.dataclass(frozen=True)
class EntrainConfig:
    """entrain_nml (entrain.F90:142-185)."""
    akmax: float = 1.0e4
    wentrmax: float = 0.05
    parcel_buoy: float = 1.0
    frac_inner: float = 0.1
    beta_surf: float = 0.23
    ashear: float = 25.0
    beta_rad: float = 0.23
    radfmin: float = 30.0
    qdotmin: float = 10.0       # K/day
    radperturb: float = 0.3
    critjump: float = 0.3
    parcel_option: int = 1
    zcldtopmax: float = 3.0e3
    pr: float = 0.75
    qamin: float = 0.3
    do_jump_exit: bool = True
    apply_entrain: bool = True
    convect_shutoff: bool = False
    mo: MOConfig = MOConfig()
    constants: Constants = EARTH


class EntrainResult(NamedTuple):
    k_m: jax.Array        # (..., L) merged diffusivities at half levels
    k_t: jax.Array
    zsml: jax.Array       # (...,) surface mixed layer depth [m]
    use_entr: jax.Array   # (..., L) 1 where the scheme set the K
    zradbase: jax.Array
    zradtop: jax.Array
    wentr_pbl: jax.Array
    wentr_rad: jax.Array


SMALL = 1.0e-4
VONKARM = 0.4


def _bottom_most_true(cond):
    """Largest level index with cond True (first hit scanning up from the
    bottom); returns (idx, found). cond (..., L)."""
    L = cond.shape[-1]
    rev = jnp.flip(cond, axis=-1)
    idx = L - 1 - jnp.argmax(rev, axis=-1)
    return idx, jnp.any(cond, axis=-1)


def _top_most_true(cond):
    """Smallest level index with cond True; (idx, found)."""
    return jnp.argmax(cond, axis=-1), jnp.any(cond, axis=-1)


def _onehot(idx, L, dtype):
    return (jnp.arange(L) == idx[..., None]).astype(dtype)


def _take(a, idx):
    return jnp.take_along_axis(a, idx[..., None], axis=-1)[..., 0]


def entrain(cfg: EntrainConfig, tdtlw, convect, u_star, b_star,
            t, qv, ql, qi, qa, u, v, z_full, p_full, z_half, p_half,
            diff_m, diff_t) -> EntrainResult:
    """tdtlw: LW heating rate [K/s]; convect bool (...,); diff_m/diff_t the
    incoming diffusivities (overwritten inside detected mixed layers when
    apply_entrain). All (..., L) top-down, z/p_half (..., L+1)."""
    C = cfg.constants
    L = t.shape[-1]
    dtype = t.dtype
    karr = jnp.arange(L)

    zsurf = z_half[..., -1]
    zf = z_full - zsurf[..., None]
    zh = z_half - zsurf[..., None]          # (..., L+1)

    # liquid-water virtual static energy (entrain.F90:905-911)
    hleff = (jnp.clip(0.05 * (t - C.tfreeze + 20.0), 0.0, 1.0) * C.hlv
             + jnp.clip(0.05 * (C.tfreeze - t), 0.0, 1.0) * C.hls)
    slv = C.cp_air * t + C.grav * zf - hleff * (ql + qi)
    slv = slv * (1.0 + C.zvir * (qv + ql + qi))
    density = p_full / (C.rdgas * t * (1.0 + C.zvir * qv - ql - qi))
    tcp = slv / C.cp_air                    # (..., L)

    k_t_entr = jnp.zeros_like(t)
    k_m_entr = jnp.zeros_like(t)
    use_entr = jnp.zeros_like(t)

    # ================= surface-driven convective PBL =================
    conv_active = b_star > 0.0

    tb = tcp[..., -1]
    h1 = zf[..., -1]
    km_ref, _ = _mo_diff(cfg.mo, h1, u_star, b_star)
    ws = jnp.maximum(SMALL, km_ref / (VONKARM * h1))
    excess = cfg.parcel_buoy * u_star * b_star / C.grav / ws
    svp = tb * (1.0 + excess)

    # bottom-most level k in [1, L-2] with tcp[k] > svp (pbl_depth :1944-1952)
    cond = (tcp > svp[..., None]) & (karr >= 1) & (karr <= L - 2)
    kfound, found = _bottom_most_true(cond)
    kfound = jnp.where(found, kfound, 1)
    t2 = _take(tcp, kfound)
    h2 = _take(zf, kfound)
    t1 = _take(tcp, kfound + 1)
    h1b = _take(zf, kfound + 1)
    zsml = h2 + (h1b - h2) * (t2 - svp) / jnp.where(t2 != t1, t2 - t1, 1.0)
    ipbl = kfound + 1

    # strong-inversion adjustment (entrain.F90:1006-1015): bottom-most level
    # k in [ipbl+1, L-1] whose jump exceeds critjump caps the PBL there
    jump = jnp.concatenate(
        [jnp.zeros_like(tcp[..., :1]), tcp[..., :-1] - tcp[..., 1:]], axis=-1)
    condj = (jump > cfg.critjump) & (karr > ipbl[..., None]) & (karr <= L - 1)
    kj, foundj = _bottom_most_true(condj)
    ipbl = jnp.where(foundj, kj, ipbl)
    zsml = jnp.where(foundj, _take(zh, kj), zsml)
    zsml = jnp.maximum(zsml, SMALL)

    vsurf3 = u_star * b_star * zsml
    vshear3 = cfg.ashear * u_star ** 3
    dslv = jnp.maximum(0.1, _take(tcp, ipbl - 1) - _take(tcp, ipbl))
    tmp1 = C.grav * dslv / _take(tcp, ipbl)
    tmp2 = (vsurf3 + vshear3) ** (2.0 / 3.0) / zsml
    wentr_pbl = jnp.clip(cfg.beta_surf * (vsurf3 + vshear3) / zsml
                         / (tmp1 + tmp2), 0.0, cfg.wentrmax)
    k_entr_sfc = jnp.minimum(
        wentr_pbl * (_take(zf, ipbl - 1) - _take(zf, ipbl)), cfg.akmax)
    if cfg.convect_shutoff:
        shut = convect & conv_active
        wentr_pbl = jnp.where(shut, 0.0, wentr_pbl)
        k_entr_sfc = jnp.where(shut, 0.0, k_entr_sfc)

    oh_ipbl = _onehot(ipbl, L, dtype) * conv_active[..., None]
    k_t_troen = oh_ipbl * k_entr_sfc[..., None]

    # Troen-Mahrt profile below the entrainment level (diffusivity_pbl)
    hinner = cfg.frac_inner * zsml
    zin = zh[..., :L]                       # half level k (above full k)
    km_i, kt_i = _mo_diff(cfg.mo, jnp.maximum(zin, SMALL),
                          u_star[..., None], b_star[..., None])
    km_h, kt_h = _mo_diff(cfg.mo, jnp.maximum(hinner, SMALL), u_star, b_star)
    denom = jnp.maximum(zsml - hinner, SMALL)[..., None]
    factor = jnp.clip((zin / hinner[..., None])
                      * (1.0 - (zin - hinner[..., None]) / denom) ** 2,
                      0.0, None)
    inner = zin < hinner[..., None]
    km_prof = jnp.where(inner, km_i, jnp.minimum(km_h[..., None] * factor,
                                                 cfg.akmax))
    kt_prof = jnp.where(inner, kt_i, jnp.minimum(kt_h[..., None] * factor,
                                                 cfg.akmax))
    below = (karr > ipbl[..., None]) & conv_active[..., None]
    k_t_troen = k_t_troen + jnp.where(below, kt_prof, 0.0)
    k_m_troen = oh_ipbl * k_entr_sfc[..., None] + jnp.where(below, km_prof, 0.0)

    in_pbl = (karr >= ipbl[..., None]) & conv_active[..., None]
    use_entr = jnp.where(in_pbl, 1.0, use_entr)
    k_t_entr = k_t_entr + k_t_troen
    k_m_entr = k_m_entr + k_m_troen
    convpbl = conv_active

    # ================= radiatively-driven mixed layer =================
    dpg = (p_half[..., 1:] - p_half[..., :-1]) / C.grav
    radf_lay = -tdtlw * C.cp_air * dpg          # W/m2 per layer
    eligible = zh[..., :L] < cfg.zcldtopmax
    # primary criterion: integrated cooling above radfmin (entrain.F90:1060)
    cand1 = eligible & (radf_lay > cfg.radfmin)
    k1, f1 = _top_most_true(
        cand1 & (radf_lay >= jnp.max(jnp.where(cand1, radf_lay, -jnp.inf),
                                     axis=-1, keepdims=True)))
    # fallback: cooling rate above qdotmin K/day (entrain.F90:1073)
    qdot = -tdtlw * 86400.0
    cand2 = eligible & (qdot > cfg.qdotmin)
    k2, f2 = _top_most_true(
        cand2 & (qdot >= jnp.max(jnp.where(cand2, qdot, -jnp.inf),
                                 axis=-1, keepdims=True)))
    kcld = jnp.where(f1, k1, k2)
    rad_active = f1 | f2
    maxradf = jnp.where(f1, _take(radf_lay, jnp.where(f1, k1, 0)),
                        _take(radf_lay, jnp.where(f2, k2, 0)))

    # move the top down one level if slv decreases upward there (:1085-1090)
    kcld = jnp.clip(kcld, 1, L - 1)
    unstable = _take(tcp, kcld - 1) < _take(tcp, kcld)
    kcld = jnp.where(unstable, kcld - 1, kcld)
    kcld = jnp.clip(kcld, 1, L - 1)
    still_unstable = _take(tcp, kcld - 1) < _take(tcp, kcld)
    rad_active = rad_active & ~(unstable & still_unstable)

    # require cloud at/near the top (:1094-1096)
    kp1 = jnp.minimum(kcld + 1, L - 1)
    has_cloud = ((_take(qa, kcld) >= cfg.qamin)
                 | (_take(qa, jnp.maximum(kcld - 1, 0)) >= cfg.qamin)
                 | (_take(qa, kp1) >= cfg.qamin))
    rad_active = rad_active & has_cloud

    svpcp = jnp.minimum(_take(tcp, kcld), _take(tcp, kp1))
    if cfg.parcel_option != 1:
        svpcp = jnp.minimum(_take(tcp, kcld), _take(tcp, kp1) + cfg.radperturb)
    zradtop = _take(zh, kcld)

    # radml_depth: first level below cloud top where tcp < svpcp - radperturb,
    # or a critjump stable interface (vectorized :2160-2224)
    svpar = svpcp - cfg.radperturb
    below_top = karr > kcld[..., None]
    condb = (tcp < svpar[..., None]) & below_top
    kb, fb = _top_most_true(condb)
    kb = jnp.where(fb, kb, L - 1)
    t2b = _take(tcp, kb)
    t1bb = _take(tcp, jnp.maximum(kb - 1, 0))
    h2b = _take(zf, kb)
    h1bb = _take(zf, jnp.maximum(kb - 1, 0))
    zb_parcel = h2b + (h1bb - h2b) * (svpar - t2b) / jnp.where(
        t1bb != t2b, t1bb - t2b, 1.0)
    if cfg.do_jump_exit:
        condjump = (jump > cfg.critjump) & (karr > (kcld + 1)[..., None])
        kjmp, fjmp = _top_most_true(condjump)
        use_jump = fjmp & (~fb | (kjmp < kb))
        zb_parcel = jnp.where(use_jump, _take(zh, kjmp), zb_parcel)
        fb = fb | fjmp
    zradbase = jnp.where(fb, jnp.maximum(zb_parcel, 0.0), 0.0)
    zradml = jnp.maximum(zradtop - zradbase, SMALL)

    vrad3 = (C.grav * zradml * maxradf
             / (_take(density, kcld) * _take(slv, kcld)))
    vrad3 = jnp.maximum(vrad3, 0.0)
    vrad = vrad3 ** (1.0 / 3.0)
    dslv_r = jnp.maximum(0.1, _take(tcp, jnp.maximum(kcld - 1, 0)) - svpcp)
    tmp1r = C.grav * dslv_r / _take(tcp, kcld)
    tmp2r = vrad ** 2 / zradml
    wentr_rad = jnp.clip(cfg.beta_rad * vrad3 / zradml / (tmp1r + tmp2r),
                         0.0, cfg.wentrmax)
    dz_top = _take(zf, jnp.maximum(kcld - 1, 0)) - _take(zf, kcld)
    k_entr_rad = jnp.minimum(cfg.akmax, wentr_rad * dz_top)

    # combined surface+radiative inversion (:1125-1140)
    same = rad_active & convpbl & (ipbl == kcld)
    tmp2c = (vrad3 + vsurf3 + vshear3) ** (2.0 / 3.0) / zradml
    wentr_c = jnp.clip(
        (cfg.beta_surf * (vsurf3 + vshear3) + cfg.beta_rad * vrad3)
        / zradml / (tmp1r + tmp2c), 0.0, cfg.wentrmax)
    k_entr_c = jnp.minimum(cfg.akmax, wentr_c * dz_top)
    wentr_rad = jnp.where(same, wentr_c, wentr_rad)

    oh_kcld = _onehot(kcld, L, dtype) * rad_active[..., None]
    k_rad_top = jnp.where(same[..., None], k_entr_c[..., None],
                          k_entr_rad[..., None]) * oh_kcld
    # when combined, the cloud-top K REPLACES the surface entrainment K there
    k_t_entr = jnp.where(same[..., None] * oh_kcld > 0, 0.0, k_t_entr)
    k_m_entr = jnp.where(same[..., None] * oh_kcld > 0, 0.0, k_m_entr)
    k_t_entr = k_t_entr + k_rad_top
    k_m_entr = k_m_entr + k_rad_top
    use_entr = jnp.where(oh_kcld > 0, 1.0, use_entr)

    # interior radiative-ML profile (:1148-1166)
    ztmp = jnp.clip((zh[..., :L] - zradbase[..., None])
                    / zradml[..., None], 0.0, 1.0)
    k_rad_in = jnp.minimum(
        0.85 * VONKARM * vrad[..., None] * ztmp ** 2
        * zradml[..., None] * jnp.sqrt(jnp.clip(1.0 - ztmp, 0.0, None)),
        cfg.akmax)
    in_radml = ((karr > kcld[..., None]) & (ztmp > 0.0)
                & rad_active[..., None])
    k_t_entr = k_t_entr + jnp.where(in_radml, k_rad_in, 0.0)
    k_m_entr = k_m_entr + jnp.where(in_radml, cfg.pr * k_rad_in, 0.0)
    use_entr = jnp.where(in_radml, 1.0, use_entr)

    # decoupled-layer guard (:1170-1181): kill surface entrainment when the
    # radiative base undercuts the surface layer from above
    kill = (zradbase < zsml) & convpbl & (ipbl > kcld) & rad_active
    k_t_entr = k_t_entr - jnp.where(kill[..., None] * oh_ipbl > 0,
                                    oh_ipbl * k_entr_sfc[..., None], 0.0)
    k_m_entr = k_m_entr - jnp.where(kill[..., None] * oh_ipbl > 0,
                                    oh_ipbl * k_entr_sfc[..., None], 0.0)
    wentr_pbl = jnp.where(kill, 0.0, wentr_pbl)

    k_t_entr = jnp.maximum(k_t_entr, 0.0)
    k_m_entr = jnp.maximum(k_m_entr, 0.0)

    if cfg.apply_entrain:
        sel = (use_entr > 0.0) & (karr >= 1)
        k_m = jnp.where(sel, k_m_entr, diff_m)
        k_t = jnp.where(sel, k_t_entr, diff_t)
    else:
        k_m, k_t = diff_m, diff_t

    return EntrainResult(
        k_m=k_m, k_t=k_t, zsml=jnp.where(conv_active, zsml, 0.0),
        use_entr=use_entr,
        zradbase=jnp.where(rad_active, zradbase, 0.0),
        zradtop=jnp.where(rad_active, zradtop, 0.0),
        wentr_pbl=jnp.where(conv_active, wentr_pbl, 0.0),
        wentr_rad=jnp.where(rad_active, wentr_rad, 0.0))
