#!/usr/bin/env python
"""Ocean q-flux calculator (reference scripts/calculate_qflux parity).

Computes the implied ocean heat transport ("q-flux") from a control run's
surface energy budget, following the reference's
src/extra/python/scripts/calculate_qflux/calculate_qflux.py (Russell et al.
1985 method):

    qflux = dH_ml/dt + dH_deep/dt - F_net,
    F_net = s*SW_net + LW_down - sigma*T_s^4 - SH - LH    (ocean points)

where dH_ml/dt is the mixed-layer heat-content tendency (rho c_w d dSST/dt),
the deep-ocean term makes the global budget close, and the SW scaling factor
s forces the long-term area-averaged ocean surface flux to zero (so the slab
run forced with this q-flux has no net drift).

Input: a diagnostics NetCDF from a control run carrying monthly means of
  t_surf, swdn_sfc (net SW at surface), lwdn_sfc (LW down), flux_t, flux_lhe
Output: a 12-month (or time-mean) `ocean_qflux.nc` usable via
  `model.physics.ocean_qflux` (mixed_layer q-flux input).
"""

import argparse
import sys

import numpy as np

SIGMA = 5.6734e-8
RHO_CP_W = 1.035e3 * 3989.24495292815   # sea water rho*c_p (mixed_layer.F90)


def area_weights(lats_deg):
    w = np.cos(np.radians(np.asarray(lats_deg)))
    return w / w.sum()


def compute_qflux(t_surf, sw_net, lw_down, flux_t, flux_lhe, lats_deg,
                  land_mask=None, ml_depth=20.0, seconds_per_month=2592000.0):
    """All inputs (12, nlat, nlon) monthly climatologies. Returns
    qflux (12, nlat, nlon) positive = ocean heat-flux convergence [W/m2]."""
    nt = t_surf.shape[0]
    ocean = 1.0 if land_mask is None else (1.0 - land_mask)[None]
    w = area_weights(lats_deg)[None, :, None] * np.ones_like(t_surf)
    w = w * ocean
    wsum = w.sum(axis=(1, 2), keepdims=True)

    def aav(x):
        return (x * w).sum(axis=(1, 2), keepdims=True) / wsum

    lw_up = SIGMA * t_surf ** 4
    # SW scaling closing the annual-mean ocean budget (reference :186-190)
    num = (aav(lw_up) + aav(flux_t) + aav(flux_lhe) - aav(lw_down)).mean()
    den = aav(sw_net).mean()
    scale = float(num / den) if den != 0 else 1.0

    f_net = (scale * sw_net + lw_down - lw_up - flux_t - flux_lhe) * ocean

    # mixed-layer heat-content tendency by centered differences over the
    # annually-periodic climatology (reference time_gradient :50-54)
    h_ml = RHO_CP_W * ml_depth * t_surf
    dhdt = (np.roll(h_ml, -1, axis=0) - np.roll(h_ml, 1, axis=0)) / (
        2.0 * seconds_per_month) * ocean

    # deep-ocean term closes the global budget each month (reference :202)
    d_deep = aav(f_net) - aav(dhdt)

    qflux = (dhdt + d_deep - f_net) * ocean
    return qflux.squeeze() if nt == 1 else qflux, scale


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("infile", help="control-run diag NetCDF (monthly means)")
    p.add_argument("outfile", nargs="?", default="ocean_qflux.nc")
    p.add_argument("--ml-depth", type=float, default=20.0)
    p.add_argument("--land-file", default=None)
    args = p.parse_args(argv)

    from isca_tpu.utils.input_files import read_netcdf

    d = read_netcdf(args.infile)
    land = None
    if args.land_file:
        land = read_netcdf(args.land_file)["land_mask"]
    qflux, scale = compute_qflux(
        d["t_surf"], d["swdn_sfc"], d["lwdn_sfc"], d["flux_t"],
        d["flux_lhe"], d["lat"], land_mask=land, ml_depth=args.ml_depth)
    print(f"SW scaling factor: {scale:.4f}; qflux range "
          f"[{qflux.min():.1f}, {qflux.max():.1f}] W/m2")

    from scipy.io import netcdf_file
    with netcdf_file(args.outfile, "w") as nc:
        nt = qflux.shape[0] if qflux.ndim == 3 else 1
        nc.createDimension("time", nt)
        nc.createDimension("lat", len(d["lat"]))
        nc.createDimension("lon", len(d["lon"]))
        nc.createVariable("lat", "d", ("lat",))[:] = d["lat"]
        nc.createVariable("lon", "d", ("lon",))[:] = d["lon"]
        nc.createVariable("time", "d", ("time",))[:] = np.arange(nt)
        v = nc.createVariable("ocean_qflux", "f", ("time", "lat", "lon"))
        v[:] = np.asarray(qflux, np.float32).reshape(nt, len(d["lat"]),
                                                     len(d["lon"]))
    print(f"wrote {args.outfile}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
