"""Generate band-limited ERA5 topography + land-mask boundary files.

Equivalent of the reference's topography generator
(src/extra/python/scripts/create_era5_topography.py), rebuilt on the
framework's own spherical transforms instead of pyshtools: the ERA5 invariant
geopotential and land-sea mask are regridded to the target Gaussian grid,
expanded in spherical harmonics with `isca_tpu.spectral`, truncated at T and
smoothed with the same jinc ("optimal") filter
    factor(n) = 2 J1(n*Theta) / (n*Theta),  Theta = 3.8317/(T+0.5)
the reference applies per (l, m), then synthesized back. Output files follow
the reference naming `era-spectral_T{N}_{nlat}x{nlon}.nc` with float32
`zsurf` (m) and `land_mask` (0/1) on ascending Gaussian latitudes, readable
by isca_tpu.utils.input_files.load_topography / topog_stats.

Usage:
  python tools/create_era5_topography.py --lsm <era5 lsm.inv.nc> \
      --z <era5 z.inv.nc> [--truncations 21,42,85,170] [--outdir .]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GRAV = 9.80  # m/s^2, value used by the reference script


def _find(d: dict, names):
    for n in names:
        if n in d:
            return np.asarray(d[n]).squeeze()
    raise KeyError(f"none of {names} found; file has {sorted(d)}")


def _jinc_filter_factors(num_spherical: int, trunc: int) -> np.ndarray:
    """2*J1(n*Theta)/(n*Theta) per total wavenumber (1.0 at n=0)."""
    from scipy.special import j1

    theta = 3.8317 / (trunc + 0.5)
    n = np.arange(num_spherical + 1, dtype=np.float64)
    x = n * theta
    with np.errstate(divide="ignore", invalid="ignore"):
        f = np.where(x > 0, 2.0 * j1(x) / np.where(x == 0, 1.0, x), 1.0)
    return f


def band_limit_era5(zsurf, lsm, lat_in, lon_in, trunc: int):
    """Regrid + spectrally smooth one truncation; returns (lats_deg, lons_deg,
    zsurf_t, land_mask_t) on the ascending Gaussian grid of `trunc`."""
    import jax.numpy as jnp

    from isca_tpu.spectral import transforms as tr
    from isca_tpu.utils.input_files import regrid_bilinear

    T = tr.make_transforms(trunc, dtype=jnp.float64)
    lats_deg = np.degrees(np.asarray(T.lats))
    lons_deg = np.degrees(np.asarray(T.lons))

    factors = _jinc_filter_factors(T.num_spherical, trunc)

    out = []
    for field in (zsurf, lsm):
        g = regrid_bilinear(lat_in, lon_in, field, lats_deg, lons_deg)
        s = tr.grid_to_spec(T, jnp.asarray(g))
        s = s * jnp.asarray(factors)   # broadcasts over the trailing n axis
        smooth = np.asarray(tr.spec_to_grid(T, s))
        out.append(smooth)
    zs_t, lsm_t = out
    return lats_deg, lons_deg, zs_t.astype(np.float32), np.rint(
        np.clip(lsm_t, 0.0, 1.0)).astype(np.float32)


def write_topography_file(path, lats_deg, lons_deg, zsurf, land_mask):
    from scipy.io import netcdf_file

    with netcdf_file(path, "w") as nc:
        nc.createDimension("lat", len(lats_deg))
        nc.createDimension("lon", len(lons_deg))
        v = nc.createVariable("lat", "d", ("lat",))
        v[:] = lats_deg
        v.units = b"degrees_N"
        v = nc.createVariable("lon", "d", ("lon",))
        v[:] = lons_deg
        v.units = b"degrees_E"
        v = nc.createVariable("zsurf", "f", ("lat", "lon"))
        v[:] = zsurf
        v.units = b"m"
        v = nc.createVariable("land_mask", "f", ("lat", "lon"))
        v[:] = land_mask


def main(argv=None):
    from isca_tpu.utils.input_files import read_netcdf

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--lsm", required=True, help="ERA5 invariant land-sea mask nc")
    ap.add_argument("--z", required=True, help="ERA5 invariant geopotential nc")
    ap.add_argument("--truncations", default="21,42,85,170")
    ap.add_argument("--outdir", default=".")
    args = ap.parse_args(argv)

    dl = read_netcdf(args.lsm)
    dz = read_netcdf(args.z)
    lsm = _find(dl, ["lsm", "land_mask"])
    z = _find(dz, ["z", "zsurf"])
    lat_in = _find(dl, ["latitude", "lat"]).ravel()
    lon_in = _find(dl, ["longitude", "lon"]).ravel()
    if z.shape != lsm.shape:
        raise ValueError(f"shape mismatch: z {z.shape} vs lsm {lsm.shape}")
    zsurf = z / GRAV if "z" in dz else z

    for t in (int(s) for s in args.truncations.split(",")):
        lats, lons, zs_t, lm_t = band_limit_era5(zsurf, lsm, lat_in, lon_in, t)
        name = f"era-spectral_T{t}_{len(lats)}x{len(lons)}.nc"
        path = os.path.join(args.outdir, name)
        write_topography_file(path, lats, lons, zs_t, lm_t)
        print(f"wrote {path}  zsurf [{zs_t.min():.0f}, {zs_t.max():.0f}] m, "
              f"land fraction {lm_t.mean():.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
