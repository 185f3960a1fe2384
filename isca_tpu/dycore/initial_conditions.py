"""Published baroclinic-wave initial states.

Jablonowski & Williamson (2006, QJRMS 132: "A baroclinic instability test case
for atmospheric model dynamical cores") — a balanced zonal jet in sigma
coordinates plus a localized zonal-wind perturbation that triggers a growing
baroclinic wave with a documented evolution (reference implementation:
src/atmos_spectral/init/jablonowski_2006.F90).

Formulas (eta ~ sigma here):
  nv      = (sigma - n0) pi/2,  n0 = 0.252
  u(phi, k)   = U0 cos^{3/2}(nv) sin^2(2 phi) + perturbation
  Tbar(k)     = T0 sigma^{R lapse/g} (+ deltaT (nt - sigma)^5 above nt = 0.2)
  T(phi, k)   = Tbar + (3/4)(pi U0 sigma/R) sin(nv) cos^{1/2}(nv) *
                [ (10/63 - 2 sin^6(cos^2+1/3)) 2 U0 cos^{3/2}(nv)
                  + a Omega (1.6 cos^3 (sin^2+2/3) - pi/4) ]
  Phi_s(phi)  = U0 cos^{3/2}(nv_s) [ ... same bracket at sigma=1 ... ]
  ps = p0; perturbation u' = Up exp(-(10 r)^2), r = great-circle distance from
  (lonc, latc) in radians.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class Jablonowski2006Config:
    n0: float = 0.252
    U0: float = 35.0
    nt: float = 0.20
    lapse: float = 0.005
    T0: float = 288.0
    Up: float = 1.0
    lonc: float = 20.0
    latc: float = 40.0
    deltaT: float = 4.8e5


def jablonowski_2006_state(cfg: Jablonowski2006Config, lats, lons, sigma,
                           radius, omega, rdgas, grav, ps0=1.0e5):
    """Grid initial fields (u, t, surf_geopotential) as numpy, level-first.

    lats (nlat,), lons (nlon,) radians; sigma (L,) full-level sigma values.
    """
    lats = np.asarray(lats, np.float64)
    lons = np.asarray(lons, np.float64)
    sigma = np.asarray(sigma, np.float64)
    sin_lat = np.sin(lats)
    cos_lat = np.cos(lats)
    halfpi = 0.5 * np.pi

    nv = (sigma - cfg.n0) * halfpi
    xx = rdgas * cfg.lapse / grav
    z2 = cfg.U0 * np.cos(nv) ** 1.5                                # (L,)
    z3 = 0.75 * np.pi * cfg.U0 * sigma * np.sin(nv) * np.sqrt(np.cos(nv)) / rdgas
    z1 = cfg.T0 * sigma**xx + np.where(
        sigma <= cfg.nt, cfg.deltaT * np.maximum(cfg.nt - sigma, 0.0) ** 5, 0.0
    )

    lat1 = 10.0 / 63.0 - 2.0 * sin_lat**6 * (cos_lat**2 + 1.0 / 3.0)  # (nlat,)
    lat2 = radius * omega * (1.6 * cos_lat**3 * (sin_lat**2 + 2.0 / 3.0) - 0.25 * np.pi)

    basic_flow = z2[:, None] * np.sin(2.0 * lats)[None, :] ** 2        # (L, nlat)
    basic_temp = z1[:, None] + z3[:, None] * (lat1[None, :] * 2.0 * z2[:, None]
                                              + lat2[None, :])

    nv_s = (1.0 - cfg.n0) * halfpi
    u_s = cfg.U0 * np.cos(nv_s) ** 1.5
    surf_geopot_1d = u_s * (lat1 * u_s + lat2)                          # (nlat,)

    # perturbation: Up exp(-(10 r)^2), r = great-circle angle from (lonc, latc)
    latc = np.deg2rad(cfg.latc)
    lonc = np.deg2rad(cfg.lonc)
    cosr = (np.sin(latc) * sin_lat[:, None]
            + np.cos(latc) * cos_lat[:, None] * np.cos(lons[None, :] - lonc))
    r = 10.0 * np.arccos(np.clip(cosr, -1.0, 1.0))
    pert = cfg.Up * np.exp(-(r**2))                                     # (nlat, nlon)

    L, nlat, nlon = len(sigma), len(lats), len(lons)
    u = np.broadcast_to(basic_flow[:, :, None], (L, nlat, nlon)) + pert[None]
    t = np.broadcast_to(basic_temp[:, :, None], (L, nlat, nlon)).copy()
    surf_geopot = np.broadcast_to(surf_geopot_1d[:, None], (nlat, nlon)).copy()
    return u, t, surf_geopot


def apply_jablonowski_2006(core, cfg: Jablonowski2006Config = Jablonowski2006Config(),
                           surf_geopotential_out=None):
    """Build a PrimitiveState from the J&W 2006 balanced state on `core`.

    Returns (state, surf_geopotential); pass the geopotential into
    dynamics_step (the state itself carries the band-limited grid fields).
    """
    import jax
    import jax.numpy as jnp

    from isca_tpu.dycore.time_integration import TwoLevel
    from isca_tpu.spectral import transforms as tr

    T = core.T
    C = core.C
    c = core.config
    ps0 = c.reference_sea_level_press
    sigma = (np.asarray(core.pk_np[:-1] + core.pk_np[1:]) / 2.0
             + (core.bk_np[:-1] + core.bk_np[1:]) / 2.0 * ps0) / ps0
    u0, t0, zs = jablonowski_2006_state(
        cfg, np.asarray(T.lats), np.asarray(T.lons), sigma,
        C.radius, C.omega, C.rdgas, C.grav, ps0,
    )

    @jax.jit
    def _init(u, t, zs_g):
        v = jnp.zeros_like(u)
        ts = tr.grid_to_spec(T, t)
        tg = tr.spec_to_grid(T, ts)
        vors, divs = tr.vor_div_from_uv_grid(T, u, v)
        ug, vg = tr.uv_grid_from_vor_div(T, vors, divs)
        vorg = tr.spec_to_grid(T, vors)
        divg = tr.spec_to_grid(T, divs)
        ln_psg = jnp.full(T.grid_shape, jnp.log(ps0), u.dtype)
        lnps = tr.grid_to_spec(T, ln_psg)
        psg = jnp.exp(tr.spec_to_grid(T, lnps))
        return vors, divs, ts, lnps, ug, vg, tg, psg, vorg, divg

    dtype = c.dtype
    vors, divs, ts, lnps, ug, vg, tg, psg, vorg, divg = _init(
        jnp.asarray(u0, dtype), jnp.asarray(t0, dtype), jnp.asarray(zs, dtype)
    )
    from isca_tpu.dycore.primitive import PrimitiveState

    two = lambda x: TwoLevel(x, x)
    state = PrimitiveState(
        vors=two(vors), divs=two(divs), ts=two(ts), lnps=two(lnps),
        ug=two(ug), vg=two(vg), tg=two(tg), psg=two(psg),
        vorg=two(vorg), divg=two(divg), tracers={}, spec_tracers={},
        wg_full=jnp.zeros((c.num_levels,) + T.grid_shape, dtype),
    )
    surf_geopotential = jnp.asarray(zs, dtype)
    return state, surf_geopotential
