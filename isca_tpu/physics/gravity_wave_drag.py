"""Gravity-wave drag: orographic (mg_drag) and convective (cg_drag).

TPU-native re-design of:
  - src/atmos_param/mg_drag/mg_drag.f90:85-943 — Stern/Pierrehumbert mountain
    gravity-wave drag: low-level base flux from subgrid orography variance,
    upward saturation-flux profile, and a monotone flux adjustment whose
    vertical divergence is the drag.
  - src/atmos_param/cg_drag/cg_drag.f90:259-871 — Alexander & Dunkerton (1999)
    spectral convective gravity-wave drag: a discrete phase-speed spectrum
    launched at a latitude-dependent source level; each wave propagates upward
    until breaking/critical-level conditions deposit its momentum flux.

Vectorization notes: the reference walks every column with nested
level x phase-speed loops and an in-place flux work array. Here all columns
are batched; mg_drag is pure closed-form array arithmetic (the monotone taup
profile is a reversed cumulative max), and cg_drag's upward walk is a single
`lax.scan` over the (small) level axis carrying the (columns x phase-speeds)
propagation mask, with the deposition sums as masked reductions over the
phase-speed axis. The reference's two-pass in-place smoothing of the forcing
profile telescopes to the closed form wv[k] = 0.5*(raw[k]+raw[k-1]) (with the
documented asymmetric top treatment), applied after the scan.

All arrays are level-last (..., L), index 0 = model top.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from isca_tpu.constants import Constants, EARTH


# ---------------------------------------------------------------------------
# mg_drag — orographic gravity-wave drag
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MgDragConfig:
    """mg_drag_nml (mg_drag.f90:74-78)."""
    xl_mtn: float = 1.0e5        # mountain wavelength scale [m]
    gmax: float = 2.0
    acoef: float = 1.0
    rho: float = 1.13            # low-level air density [kg/m^3]
    low_lev_frac: float = 0.23   # fraction of ps defining the low layer
    flux_cut_level: float = 0.0  # Pa; >0 freezes flux above this level
    do_conserve_energy: bool = False
    constants: Constants = EARTH


class MgDragResult(NamedTuple):
    dt_u: jax.Array      # (..., L) zonal drag tendency [m/s^2]
    dt_v: jax.Array
    dt_t: jax.Array      # dissipative heating [K/s]
    taubx: jax.Array     # (...) base-flux components
    tauby: jax.Array
    tausf: jax.Array     # (..., L) saturation flux profile diag


def mg_drag(cfg: MgDragConfig, delta_t, u, v, temp, p_full, p_half,
            z_full, z_half, hprime) -> MgDragResult:
    """Mountain GWD (mg_drag.f90:85-468 non-MCM path).

    hprime: (...,) subgrid-orography standard deviation [m].
    """
    C = cfg.constants
    L = u.shape[-1]
    kidx = jnp.arange(L)
    small = 1e-20
    xli = 1.0 / cfg.xl_mtn
    p00 = 1.0e5

    psurf = p_half[..., -1]
    ptop = (1.0 - cfg.low_lev_frac) * psurf
    # first (highest) level with pfull >= ptop, capped at L-2
    ktop = jnp.minimum(jnp.argmax(p_full >= ptop[..., None], axis=-1), L - 2)

    # --- base flux (mgwd_base_flux, mg_drag.f90:473-597) ---
    in_low = kidx >= ktop[..., None]          # [ktop, L-1]
    delp = p_half[..., 1:] - p_half[..., :-1]
    w = jnp.where(in_low, delp, 0.0)
    sumw = jnp.sum(w, axis=-1)
    ubar = jnp.sum(w * u, axis=-1) / sumw
    vbar = jnp.sum(w * v, axis=-1) / sumw
    ulow = jnp.sqrt(ubar**2 + vbar**2)
    xn = ubar / (ulow + small)
    yn = vbar / (ulow + small)

    theta = temp * (p_full / p00) ** (-C.kappa)
    take = lambda a, k: jnp.take_along_axis(a, k[..., None], axis=-1)[..., 0]
    th_t, th_b = take(theta, ktop), theta[..., -1]
    pf_t, pf_b = take(p_full, ktop), p_full[..., -1]
    t_t, t_b = take(temp, ktop), temp[..., -1]
    bnv2 = (C.grav**2 * (pf_t + pf_b) * (th_t - th_b)
            / (C.rdgas * (th_t + th_b) * (pf_b - pf_t) * 0.5 * (t_t + t_b)))
    stable = bnv2 > 0.0
    bnv = jnp.sqrt(jnp.where(stable, bnv2, 1.0))
    fr = bnv * hprime / (ulow + 1e-12)
    g = cfg.gmax * fr**2 / (fr**2 + cfg.acoef**2)
    taub = jnp.where(stable, -cfg.rho * xli * ulow**3 / bnv * g, 0.0)
    taubx, tauby = taub * xn, taub * yn

    # --- saturation flux (mgwd_satur_flux, mg_drag.f90:601-872) ---
    # half-level arrays of length L+1
    umag_top = jnp.abs(u[..., :1] * xn[..., None] + v[..., :1] * yn[..., None])
    umag_int = jnp.abs(0.5 * (u[..., :-1] + u[..., 1:]) * xn[..., None]
                       + 0.5 * (v[..., :-1] + v[..., 1:]) * yn[..., None])
    umag = jnp.concatenate(
        [umag_top, umag_int, jnp.zeros_like(umag_top)], axis=-1)
    umag = jnp.where(umag < 1e-12, 0.0, umag)

    dudz0 = (umag[..., :1] - umag[..., 1:2]) / (z_full[..., :1] - z_half[..., 1:2])
    dudz_int = (umag[..., 1:L] - umag[..., 2:L + 1]) / (
        z_half[..., 1:L] - z_half[..., 2:L + 1])
    dudz = jnp.concatenate([dudz0, dudz_int], axis=-1)     # length L

    d2_int = (dudz[..., 1:] - dudz[..., :-1]) / (z_full[..., 1:] - z_full[..., :-1])
    d2udz2 = jnp.concatenate(
        [d2_int[..., :1], d2_int,
         (dudz[..., -1:] / (z_full[..., -1:] - z_half[..., -1:]))], axis=-1)

    bn_int = (C.grav**2 * (p_full[..., :-1] + p_full[..., 1:])
              * (theta[..., :-1] - theta[..., 1:])
              / (C.rdgas * (theta[..., :-1] + theta[..., 1:])
                 * (p_full[..., 1:] - p_full[..., :-1])
                 * 0.5 * (temp[..., :-1] + temp[..., 1:])))
    bnvk2 = jnp.concatenate(
        [bn_int[..., :1], bn_int, bn_int[..., -1:]], axis=-1)   # length L+1

    umag_pos = umag > 0.0
    extend = jnp.where(umag_pos, d2udz2 / jnp.where(umag_pos, umag, 1.0), 0.0)
    d2i = jnp.where(umag_pos,
                    bnvk2 / jnp.where(umag_pos, umag, 1.0) ** 2 - extend,
                    1.0e30)
    d = jnp.where(d2i < 1e-30, 1.0e30,
                  1.0 / jnp.sqrt(jnp.maximum(d2i, 1e-30)))
    d = jnp.where(umag_pos, d, 0.0)

    t_half_mid = 0.5 * (temp[..., :-1] + temp[..., 1:])   # Fortran k=2..kdim
    taus_mid = (-p_half[..., 1:L] * umag[..., 1:L] ** 2 * d[..., 1:L]
                * xli * cfg.gmax / (t_half_mid * C.rdgas))
    kh = jnp.arange(L + 1)
    taus = jnp.where(kh >= ktop[..., None], taub[..., None],
                     jnp.concatenate([taus_mid[..., :1], taus_mid,
                                      taub[..., None]], axis=-1))
    taus = taus.at[..., 0].set(taus[..., 1])
    taus = jnp.where(bnvk2 < 0.0, taub[..., None], taus)

    if cfg.flux_cut_level > 0.0:
        kcut = jnp.argmax(p_half >= cfg.flux_cut_level, axis=-1)
        taus_at_cut = jnp.take_along_axis(taus, kcut[..., None], axis=-1)
        taus = jnp.where(kh < kcut[..., None], taus_at_cut, taus)

    # --- tendency (mgwd_tend, mg_drag.f90:876-943) ---
    # taup[k] = max over j>=k of seq[j], with the bottom entry forced to taub.
    seq = jnp.concatenate([taus[..., :L], taub[..., None]], axis=-1)
    taup = jnp.flip(jax.lax.cummax(jnp.flip(seq, axis=-1), axis=seq.ndim - 1),
                    axis=-1)
    tausf = taup[..., 1:]
    dterm = C.grav * (taup[..., 1:] - taup[..., :-1]) / delp
    dt_u = xn[..., None] * dterm
    dt_v = yn[..., None] * dterm
    if cfg.do_conserve_energy:
        dt_t = -((u + 0.5 * delta_t * dt_u) * dt_u
                 + (v + 0.5 * delta_t * dt_v) * dt_v) / C.cp_air
    else:
        dt_t = jnp.zeros_like(dt_u)
    return MgDragResult(dt_u, dt_v, dt_t, taubx, tauby, tausf)


# ---------------------------------------------------------------------------
# cg_drag — Alexander-Dunkerton convective gravity-wave drag
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CgDragConfig:
    """cg_drag_nml (cg_drag.f90:50-95)."""
    source_level_pressure: float = 315.0e2   # Pa
    nk: int = 1                              # number of wavelengths
    cmax: float = 99.6                       # max phase speed [m/s]
    dc: float = 1.2                          # spectral resolution [m/s]
    Bt_0: float = 0.004                      # total source stress / density
    Bt_nh: float = 0.001
    Bt_sh: float = -0.001
    phi0n: float = 30.0
    phi0s: float = -30.0
    dphin: float = 5.0
    dphis: float = -5.0
    Bw: float = 0.4                          # wide-spectrum amplitude
    Bn: float = 0.0                          # narrow-spectrum amplitude
    cw: float = 40.0                         # wide half-width [m/s]
    cn: float = 2.0                          # narrow half-width [m/s]
    flag: int = 1                            # 1: peak flux at c=0
    bflim: float = 2.5e-5                    # buoyancy-frequency floor [1/s^2]
    calculate_ked: bool = False
    constants: Constants = EARTH


class CgDragResult(NamedTuple):
    gwfcng_x: jax.Array   # (..., L) [m/s^2]
    gwfcng_y: jax.Array
    ked_x: jax.Array
    ked_y: jax.Array


class CgDrag:
    """Precomputes the phase-speed spectrum, source levels and amplitudes.

    cg_drag_init (cg_drag.f90:259-534): source level descends toward the
    surface away from the equator; source amplitude has tanh-shaped
    hemispheric augmentations.
    """

    def __init__(self, cfg: CgDragConfig, lat2d, pref):
        """lat2d: (...,) radians; pref: (L,) reference full pressures [Pa]."""
        self.cfg = cfg
        import numpy as np

        kmax = len(pref)
        self.kmax = kmax
        dtype = jnp.asarray(lat2d).dtype
        nc = int(2.0 * cfg.cmax / cfg.dc + 1)
        self.c0 = jnp.asarray((np.arange(nc)) * cfg.dc - cfg.cmax, dtype)
        # wavelengths 300, 3000, ... km (cg_drag.f90:231-236)
        self.kwv = jnp.asarray(
            [2.0 * np.pi / ((30.0 * 10.0 ** (n + 1)) * 1.0e3)
             for n in range(cfg.nk)], dtype)
        lat = np.asarray(lat2d)
        # first level (1-based from top) below the source pressure
        klevel = int(np.argmax(np.asarray(pref) > cfg.source_level_pressure)) + 1
        src = (kmax + 1) - ((kmax + 1 - klevel) * np.cos(lat) + 0.5)
        self.source_level = jnp.asarray(
            np.minimum(src.astype(np.int32), kmax - 1))   # 1-based (ext index)
        pif = np.pi / 180.0
        latdeg = lat / pif
        self.source_amp = jnp.asarray(
            cfg.Bt_0
            + cfg.Bt_nh * 0.5 * (1.0 + np.tanh((latdeg - cfg.phi0n) / cfg.dphin))
            + cfg.Bt_sh * 0.5 * (1.0 + np.tanh((latdeg - cfg.phi0s) / cfg.dphis)),
            dtype)

    def __call__(self, p_full, z_full, temp, u, v) -> CgDragResult:
        """cg_drag_calc (cg_drag.f90:571-871). Level-last (..., L)."""
        cfg = self.cfg
        C = cfg.constants
        L = self.kmax

        # centered dT/dz (one-sided at top), density, buoyancy frequency
        dtdz_top = (temp[..., :1] - temp[..., 1:2]) / (z_full[..., :1] - z_full[..., 1:2])
        dtdz_mid = (temp[..., :-2] - temp[..., 2:]) / (z_full[..., :-2] - z_full[..., 2:])
        dtdz = jnp.concatenate([dtdz_top, dtdz_mid, dtdz_top * 0], axis=-1)
        rho = p_full / (temp * C.rdgas)
        bf2 = (C.grav / temp) * (dtdz + C.grav / C.cp_air)
        bf = jnp.sqrt(jnp.maximum(bf2, cfg.bflim))

        # extended arrays, index 0 = extrapolated level above model top
        ext = lambda a0, rest: jnp.concatenate([a0, rest], axis=-1)
        z_e = ext(2.0 * z_full[..., :1] - z_full[..., 1:2], z_full)
        u_e = ext(2.0 * u[..., :1] - u[..., 1:2], u)
        v_e = ext(2.0 * v[..., :1] - v[..., 1:2], v)
        rho_e = ext(rho[..., :1] ** 2 / rho[..., 1:2], rho)
        bf_e = ext(bf[..., :1], bf)

        gx, kx = self._gwfc(rho_e, u_e, bf_e, z_e)
        gy, ky = self._gwfc(rho_e, v_e, bf_e, z_e)
        return CgDragResult(gx[..., 1:], gy[..., 1:], kx[..., 1:], ky[..., 1:])

    def _gwfc(self, rho, u, bf, z):
        """AD99 wave-breaking walk (gwfc, cg_drag.f90:497-650).

        Inputs are extended (..., L+1) arrays (index 0 above the top).
        Returns (forcing, eddy diffusivity) on the same extended levels.
        """
        cfg = self.cfg
        c0 = self.c0
        iz0 = self.source_level                          # (...,) ext index
        Lp1 = u.shape[-1]
        take = lambda a, k: jnp.take_along_axis(a, k[..., None], axis=-1)[..., 0]

        u_src = take(u, iz0)
        rho_src = take(rho, iz0)
        c0mu0 = c0 - u_src[..., None]                    # (..., nc)
        c = c0 * cfg.flag + c0mu0 * (1 - cfg.flag)
        amp = (cfg.Bw * jnp.exp(-jnp.log(2.0) * (c / cfg.cw) ** 2)
               + cfg.Bn * jnp.exp(-jnp.log(2.0) * (c / cfg.cn) ** 2))
        B0 = jnp.where(c0mu0 == 0.0, 0.0, jnp.sign(c0mu0) * amp)
        Bsum = jnp.sum(jnp.abs(B0), axis=-1)
        eps = (self.source_amp / cfg.nk) / jnp.maximum(Bsum, 1e-30) / rho_src

        dz = z[..., :-1] - z[..., 1:]                    # (..., L)
        Hb = -dz / jnp.log(rho[..., :-1] / rho[..., 1:])
        alp2 = 0.25 / Hb**2
        rbh = jnp.sqrt(rho[..., :-1] * rho[..., 1:])

        gwf = jnp.zeros_like(u)
        ked = jnp.zeros_like(u)
        for ink in range(cfg.nk):
            kwv = self.kwv[ink]
            k2 = kwv * kwv
            fac = 0.5 * (rho / rho_src[..., None]) * kwv / bf
            omc_mid = jnp.sqrt((bf[..., :-1] ** 2 * k2) / (k2 + alp2))
            # omc defined on k=0..L-1 (needs rho[k+1]); pad bottom (unused:
            # scan never evaluates omc at k = L because iz0 <= L-1)
            omc = jnp.concatenate([omc_mid, omc_mid[..., -1:]], axis=-1)

            def step(msk, k):
                u_k = u[..., k]
                c0mu = c0 - u_k[..., None]
                active = (k <= iz0)[..., None]
                consider = msk & active
                crit = c0mu == 0.0
                turn = jnp.abs(c0mu) * kwv - omc[..., k][..., None] >= 0.0
                Foc = B0 / jnp.where(crit, 1.0, c0mu) ** 3 - fac[..., k][..., None]
                brk = (Foc >= 0.0) | (c0mu0 * c0mu <= 0.0)
                at_top = k == 0
                stops = crit | turn | at_top | brk
                deposit = (consider & ~crit & ~turn & (at_top | brk)
                           & (k < iz0)[..., None])
                fm = jnp.sum(jnp.where(deposit, B0, 0.0), axis=-1)
                fe = jnp.sum(jnp.where(deposit, c0mu * B0, 0.0), axis=-1)
                new_msk = jnp.where(consider & stops, False, msk)
                below_src = k < iz0
                raw_f = jnp.where(
                    below_src,
                    (rho_src / rbh[..., k]) * fm * eps / dz[..., k], 0.0)
                raw_k = jnp.where(
                    below_src,
                    (rho_src / rbh[..., k]) * fe * eps
                    / (dz[..., k] * bf[..., k] ** 2), 0.0)
                return new_msk, (raw_f, raw_k)

            msk0 = jnp.ones(u.shape[:-1] + (c0.shape[0],), dtype=bool)
            ks = jnp.arange(Lp1 - 1, -1, -1)             # L .. 0 upward walk
            _, (raw_f_rev, raw_k_rev) = jax.lax.scan(step, msk0, ks)
            # scan stacks along axis 0 in descending-k order -> reorder to
            # (..., k ascending)
            raw_f = jnp.moveaxis(jnp.flip(raw_f_rev, axis=0), 0, -1)
            raw_k = jnp.moveaxis(jnp.flip(raw_k_rev, axis=0), 0, -1)

            def smooth(raw):
                # wv[0]=raw[0]; wv[1]=0.5*raw[1]+raw[0]; wv[k]=0.5*(raw[k]+raw[k-1])
                wv = 0.5 * (raw + jnp.roll(raw, 1, axis=-1))
                wv = wv.at[..., 0].set(raw[..., 0])
                wv = wv.at[..., 1].set(0.5 * raw[..., 1] + raw[..., 0])
                # zero above... below source: raw already 0 for k >= iz0, but
                # wv[iz0] = 0.5*raw[iz0-1] is real deposition smoothing (kept,
                # matching the reference); for k > iz0 wv is 0.
                return wv

            gwf = gwf + smooth(raw_f)
            ked = ked + smooth(raw_k)
        return gwf, ked


# ---------------------------------------------------------------------------
# constant drag (damping_driver.f90:283-307, do_const_drag)
# ---------------------------------------------------------------------------

def const_drag(amp, offset, lat2d, p_full, day_of_year, days_per_year):
    """Empirical constant upper-level zonal drag with annual cycle."""
    cosday = jnp.cos(2.0 * jnp.pi * day_of_year / days_per_year)
    phPa = p_full * 0.01
    minp = jnp.log(jnp.min(phPa)) - 1.0
    utnd = jnp.where(phPa < jnp.e, -amp * ((jnp.log(phPa) - 1.0) / minp), 0.0)
    lat = lat2d[..., None]
    shape = (-1.65 * jnp.abs(lat) ** 3 + 2.5 * lat**2 + 0.17 * jnp.abs(lat)
             + offset)
    return jnp.where(phPa < jnp.e,
                     utnd * jnp.sign(lat) * cosday * shape, 0.0)
