"""Surface boundary conditions: analytic Gaussian mountains, idealized land
masks, and spectrally-smoothed input topography.

Reference: src/shared/topography/gaussian_topog.F90 (analytic mountains),
src/extra/python/isca/land_generator_fn.py (idealized land masks: squares and
Sauliere-2012-style continents), and src/atmos_spectral/init/
{spectral_init_cond,topog_regularization}.F90 (band-limiting input topography
through the spectral transform to reduce Gibbs ringing). Host-side numpy at
model-build time.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from isca_tpu.spectral import transforms as tr


def gaussian_topography(
    lons_deg, lats_deg, height=3000.0, olon=90.0, olat=45.0,
    wlon=15.0, wlat=15.0, rlon=0.0, rlat=0.0,
):
    """Gaussian mountain on (lat, lon) grid, heights in meters
    (gaussian_topog.F90:215-259 semantics, incl. ridge half-widths r*)."""
    lon = np.deg2rad(np.asarray(lons_deg))
    lat = np.deg2rad(np.asarray(lats_deg))
    d2r = np.pi / 180.0
    dy = np.abs(lat[:, None] - olat * d2r)
    yy = np.maximum(0.0, dy - rlat * d2r) / (wlat * d2r)
    dx = np.abs(lon[None, :] - olon * d2r)
    dx = np.minimum(dx, np.abs(dx - 2 * np.pi))
    xx = np.maximum(0.0, dx - rlon * d2r) / (wlon * d2r)
    return height * np.exp(-(xx**2) - yy**2)


# Sauliere 2012-style idealized continents (land_generator_fn.py:63-120)
_CONTINENTS = {
    # name: callable(lon_deg 2d, lat_deg 2d) -> bool mask
    "NA": lambda lo, la: (la >= 20) & (la <= 60)
    & (lo >= 260 - 0.8 * (la - 20)) & (lo <= 300 - 0.4 * (la - 20)),
    "SA": lambda lo, la: (la <= 20) & (la >= -60)
    & (lo >= 280 - 0.5 * (la - 20)) & (lo <= 310 + 0.3 * (la - 20)),
    "EA": lambda lo, la: (la >= 20) & (la <= 70) & (lo >= 0) & (lo <= 130),
    "AF": lambda lo, la: (la <= 20) & (la >= -35) & (lo >= 0 + 0.5 * (20 - la))
    & (lo <= 50),
    "AUS": lambda lo, la: (la <= -10) & (la >= -40) & (lo >= 110) & (lo <= 155),
    "IND": lambda lo, la: (la <= 23) & (la >= 5) & (lo >= 65) & (lo <= 90),
}


def land_mask(
    lons_deg, lats_deg, land_mode="square",
    boundaries=(20.0, 60.0, 20.0, 60.0), continents=("all",),
):
    """Idealized land mask on (lat, lon): 1 over land, 0 over ocean."""
    lo, la = np.meshgrid(np.asarray(lons_deg), np.asarray(lats_deg))
    if land_mode == "none":
        return np.zeros_like(lo)
    if land_mode == "square":
        s, n, w, e = boundaries
        return (((la >= s) & (la <= n)) & ((lo >= w) & (lo <= e))).astype(np.float64)
    if land_mode == "continents":
        names = _CONTINENTS.keys() if "all" in continents else continents
        mask = np.zeros_like(lo, dtype=bool)
        for name in names:
            mask |= _CONTINENTS[name](lo, la)
        return mask.astype(np.float64)
    raise ValueError(land_mode)


def band_limit_topography(T: tr.SphericalTransforms, zsurf, n_smooth_passes=0,
                          smooth_fraction=0.0):
    """Round-trip topography through the spectral transform so the initial
    surface geopotential is band-limited (spectral_init_cond semantics); an
    optional weak del^2 smoothing pass approximates topog_regularization's
    ocean smoothing."""
    z = jnp.asarray(zsurf, T.P.dtype)
    zs = tr.grid_to_spec(T, z)
    if n_smooth_passes > 0 and smooth_fraction > 0:
        lam = -T.eigenvalues / float(jnp.max(-T.eigenvalues))
        damp = (1.0 - smooth_fraction * lam.astype(T.P.dtype)) ** n_smooth_passes
        zs = zs * damp.astype(zs.dtype)
    return tr.spec_to_grid(T, zs)
