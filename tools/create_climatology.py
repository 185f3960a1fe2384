"""Create climatology / timeseries input NetCDF files on the model grid.

TPU-framework equivalent of the reference's creator-script family
(src/extra/python/scripts/): create_timeseries.py (grid + time scaffolding +
writer), create_co2_timeseries.py (CO2 scenario), create_cmip5_ozone_timeseries
(ozone climatology regrid), create_amip_sst_timeseries.py (monthly SSTs), and
the gfdl_grid_files / gauss_grid.py / resolutions.py grid tooling. The grid
comes straight from `isca_tpu.spectral` (no pre-baked grid files needed).

Time conventions follow the reference (create_timeseries.py:75-104): a
360-day year; climatology files carry 12 month-center times with units
'days since 0000-01-01' (year zero marks a climatology), timeseries files
'days since 0001-01-01'. Output is read back by isca_tpu.utils.time_interp
(from_netcdf / load_pressure_climatology).

Usage:
  python tools/create_climatology.py grid  --res T42 [--out tXX.nc]
  python tools/create_climatology.py co2   --res T42 --years 100 \
      --expr "300.*1.01**(day/360.)" --out co2.nc [--var co2]
  python tools/create_climatology.py ozone --input o3_cmip.nc --invar O3 \
      --res T42 --out ozone_clim.nc
  python tools/create_climatology.py sst   --input amip_sst.nc --invar sst \
      --res T42 --out sst_clim.nc [--timeseries]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

YEAR_DAYS = 360.0


def model_grid(res):
    """(lats, latbs, lons, lonbs) in degrees for a truncation (ascending lat)."""
    import jax.numpy as jnp

    from isca_tpu.spectral import transforms as tr

    T = tr.make_transforms(res if res.startswith("T") else int(res),
                           dtype=jnp.float64)
    lats = np.degrees(np.asarray(T.lats))
    lons = np.degrees(np.asarray(T.lons))
    latb = np.zeros(lats.size + 1)
    latb[0], latb[-1] = -90.0, 90.0
    latb[1:-1] = 0.5 * (lats[:-1] + lats[1:])
    dlon = 360.0 / lons.size
    lonb = np.concatenate([lons - dlon / 2.0, [lons[-1] + dlon / 2.0]])
    return lats, latb, lons, lonb


def _nc_var(nc, name, typ, dims, data, units=None):
    v = nc.createVariable(name, typ, dims)
    v[:] = data
    if units:
        v.units = units.encode()
    return v


def write_field(path, var, data, lats, latb, lons, lonb, times, time_units,
                p_full=None, p_half=None, time_bounds=None):
    """Write a (time[, pfull], lat, lon) field in the reference's file layout
    (create_timeseries.py output_to_file)."""
    from scipy.io import netcdf_file

    with netcdf_file(path, "w") as nc:
        nc.createDimension("time", None)
        nc.createDimension("lat", lats.size)
        nc.createDimension("latb", latb.size)
        nc.createDimension("lon", lons.size)
        nc.createDimension("lonb", lonb.size)
        dims = ("time", "lat", "lon")
        if p_full is not None:
            nc.createDimension("pfull", len(p_full))
            nc.createDimension("phalf", len(p_half))
            _nc_var(nc, "pfull", "d", ("pfull",), p_full, "hPa")
            _nc_var(nc, "phalf", "d", ("phalf",), p_half, "hPa")
            dims = ("time", "pfull", "lat", "lon")
        _nc_var(nc, "lat", "d", ("lat",), lats, "degrees_N")
        _nc_var(nc, "latb", "d", ("latb",), latb, "degrees_N")
        _nc_var(nc, "lon", "d", ("lon",), lons, "degrees_E")
        _nc_var(nc, "lonb", "d", ("lonb",), lonb, "degrees_E")
        tv = _nc_var(nc, "time", "d", ("time",), times, time_units)
        tv.calendar = b"360_day"
        if time_bounds is not None:
            nc.createDimension("nv", 2)
            _nc_var(nc, "time_bounds", "d", ("time", "nv"), time_bounds)
        _nc_var(nc, var, "f", dims, np.asarray(data, np.float32))


def climatology_times(nt=12):
    """Month-center day numbers + year-zero units (marks a climatology)."""
    days = (np.arange(nt) + 0.5) * (YEAR_DAYS / nt)
    return days, "days since 0000-01-01 00:00:00.0"


def timeseries_times(num_years, per_year=1):
    n = int(num_years * per_year) + 1
    days = np.linspace(0, num_years * YEAR_DAYS, n)
    return days, "days since 0001-01-01 00:00:00.0"


def cmd_grid(args):
    from scipy.io import netcdf_file

    lats, latb, lons, lonb = model_grid(args.res)
    out = args.out or f"t{args.res.lstrip('T')}.nc"
    with netcdf_file(out, "w") as nc:
        nc.createDimension("lat", lats.size)
        nc.createDimension("latb", latb.size)
        nc.createDimension("lon", lons.size)
        nc.createDimension("lonb", lonb.size)
        _nc_var(nc, "lat", "d", ("lat",), lats, "degrees_N")
        _nc_var(nc, "latb", "d", ("latb",), latb, "degrees_N")
        _nc_var(nc, "lon", "d", ("lon",), lons, "degrees_E")
        _nc_var(nc, "lonb", "d", ("lonb",), lonb, "degrees_E")
    print(f"wrote {out}: {lats.size} Gaussian lats x {lons.size} lons")
    return 0


def cmd_co2(args):
    lats, latb, lons, lonb = model_grid(args.res)
    days, units = timeseries_times(args.years)
    p_full, p_half = [300.0, 900.0], [0.0, 600.0, 1200.0]
    day = days  # name used in --expr
    values = eval(args.expr, {"np": np, "day": day})  # noqa: S307 - user CLI expr
    values = np.broadcast_to(np.asarray(values, np.float64), days.shape)
    data = np.broadcast_to(
        values[:, None, None, None],
        (days.size, len(p_full), lats.size, lons.size))
    half = np.diff(days, prepend=days[0] - (days[1] - days[0]))[:, None] / 2.0
    bounds = np.concatenate([days[:, None] - half, days[:, None] + half], axis=1)
    write_field(args.out, args.var, data, lats, latb, lons, lonb, days, units,
                p_full, p_half, time_bounds=bounds)
    print(f"wrote {args.out}: {args.var}({days.size},{len(p_full)},"
          f"{lats.size},{lons.size}), {values[0]:.1f} -> {values[-1]:.1f}")
    return 0


def _load_monthly(path, varname):
    from isca_tpu.utils.input_files import read_netcdf

    d = read_netcdf(path)
    data = np.asarray(d[varname], np.float64).squeeze()
    lat = np.asarray([d[k] for k in ("lat", "latitude") if k in d][0]).ravel()
    lon = np.asarray([d[k] for k in ("lon", "longitude") if k in d][0]).ravel()
    plev = None
    for k in ("pfull", "plev", "level"):
        if k in d:
            plev = np.asarray(d[k], np.float64).ravel()
            break
    return data, lat, lon, plev


def _regrid_time_stack(data, lat_in, lon_in, lats, lons):
    from isca_tpu.utils.input_files import regrid_bilinear

    flat = data.reshape((-1,) + data.shape[-2:])
    out = np.stack([regrid_bilinear(lat_in, lon_in, f, lats, lons) for f in flat])
    return out.reshape(data.shape[:-2] + (lats.size, lons.size))


def cmd_ozone(args):
    lats, latb, lons, lonb = model_grid(args.res)
    data, lat_in, lon_in, plev = _load_monthly(args.input, args.invar)
    if data.ndim == 3:          # (time, lat, lon) single-level
        data = data[:, None]
        plev = np.array([500.0])
    if data.shape[0] != 12:
        # multi-year monthly input -> 12-month climatology
        data = data[: data.shape[0] // 12 * 12].reshape(
            (-1, 12) + data.shape[1:]).mean(axis=0)
    out = _regrid_time_stack(data, lat_in, lon_in, lats, lons)
    days, units = climatology_times(12)
    p_full = plev if plev is not None else np.array([500.0])
    p_half = np.concatenate([[0.0], 0.5 * (p_full[:-1] + p_full[1:]),
                             [max(1200.0, p_full[-1] * 1.2)]])
    write_field(args.out, args.var or "ozone_1990", out, lats, latb, lons,
                lonb, days, units, p_full, p_half)
    print(f"wrote {args.out}: shape {out.shape}")
    return 0


def cmd_sst(args):
    lats, latb, lons, lonb = model_grid(args.res)
    data, lat_in, lon_in, _ = _load_monthly(args.input, args.invar)
    if args.timeseries:
        days, units = timeseries_times(data.shape[0] / 12.0, per_year=12)
        days = days[: data.shape[0]]
    else:
        if data.shape[0] != 12:
            data = data[: data.shape[0] // 12 * 12].reshape(
                (-1, 12) + data.shape[1:]).mean(axis=0)
        days, units = climatology_times(12)
    out = _regrid_time_stack(data, lat_in, lon_in, lats, lons)
    if np.nanmax(out) < 200.0:   # degC input -> K
        out = out + 273.15
    out = np.nan_to_num(out, nan=271.35)   # ice-covered/missing ocean
    write_field(args.out, args.var or "sst", out, lats, latb, lons, lonb,
                days, units)
    print(f"wrote {args.out}: shape {out.shape}, "
          f"range [{out.min():.1f}, {out.max():.1f}] K")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("grid", help="write a Gaussian grid file")
    g.add_argument("--res", default="T42")
    g.add_argument("--out")
    g.set_defaults(fn=cmd_grid)

    c = sub.add_parser("co2", help="CO2 scenario timeseries")
    c.add_argument("--res", default="T42")
    c.add_argument("--years", type=float, default=100.0)
    c.add_argument("--expr", default="300.*1.01**(day/360.)",
                   help="ppmv as a function of `day` (numpy as np)")
    c.add_argument("--var", default="co2")
    c.add_argument("--out", default="co2.nc")
    c.set_defaults(fn=cmd_co2)

    o = sub.add_parser("ozone", help="ozone (pressure-level) climatology")
    o.add_argument("--input", required=True)
    o.add_argument("--invar", default="O3")
    o.add_argument("--res", default="T42")
    o.add_argument("--var")
    o.add_argument("--out", default="ozone_clim.nc")
    o.set_defaults(fn=cmd_ozone)

    s = sub.add_parser("sst", help="AMIP-style SST climatology/timeseries")
    s.add_argument("--input", required=True)
    s.add_argument("--invar", default="sst")
    s.add_argument("--res", default="T42")
    s.add_argument("--timeseries", action="store_true",
                   help="keep all months instead of averaging to a climatology")
    s.add_argument("--var")
    s.add_argument("--out", default="sst_clim.nc")
    s.set_defaults(fn=cmd_sst)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
