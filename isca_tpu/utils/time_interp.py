"""Calendar-aware interpolation of time-varying climatology inputs.

Replaces the reference's interpolator/time_interp machinery
(src/atmos_shared/interpolator/interpolator.F90, src/shared/time_interp) for
the common cases: annually-periodic monthly climatologies (ozone, SSTs, sea
ice) and multi-year timeseries (CO2 concentrations). Design: all file reading
and index/weight precomputation happens host-side at model build; inside jit
the lookup is a gather of two time slices plus a linear blend, driven by the
model's time_seconds scalar — no host callbacks on the hot path.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "times"],
    meta_fields=["periodic", "period_seconds"],
)
@dataclasses.dataclass(frozen=True)
class TimeSeries:
    """A (time, ...) climatology with device-side linear time interpolation."""

    data: jax.Array     # (nt, ...) field values
    times: jax.Array    # (nt,) seconds (within one period if periodic)
    periodic: bool      # annually repeating climatology
    period_seconds: float

    def at(self, time_seconds):
        """Linearly interpolated field at model time (jit-safe)."""
        t = jnp.asarray(time_seconds, self.times.dtype)
        if self.periodic:
            t = jnp.mod(t, self.period_seconds)
            times = self.times
            nt = times.shape[0]
            # wrap-around: index of the last record <= t
            i0 = jnp.clip(jnp.searchsorted(times, t, side="right") - 1, -1, nt - 1)
            t0 = jnp.where(i0 < 0, times[nt - 1] - self.period_seconds, times[i0])
            i1 = jnp.mod(i0 + 1, nt)
            t1 = jnp.where(i0 + 1 >= nt, times[0] + self.period_seconds, times[i1])
            i0 = jnp.mod(i0, nt)
            w = (t - t0) / jnp.where(t1 != t0, t1 - t0, 1.0)
            return (1.0 - w) * self.data[i0] + w * self.data[i1]
        times = self.times
        nt = times.shape[0]
        i0 = jnp.clip(jnp.searchsorted(times, t, side="right") - 1, 0, nt - 2)
        w = jnp.clip((t - times[i0]) / (times[i0 + 1] - times[i0]), 0.0, 1.0)
        return (1.0 - w) * self.data[i0] + w * self.data[i0 + 1]


def monthly_climatology(fields, year_seconds: float = 360 * 86400.0,
                        dtype=jnp.float32) -> TimeSeries:
    """Build an annually-periodic TimeSeries from 12 monthly mean fields,
    timestamped at month centers (the reference's climatology convention)."""
    fields = np.asarray(fields)
    nt = fields.shape[0]
    month = year_seconds / nt
    times = (np.arange(nt) + 0.5) * month
    return TimeSeries(
        data=jnp.asarray(fields, dtype), times=jnp.asarray(times, dtype),
        periodic=True, period_seconds=float(year_seconds),
    )


def from_netcdf(path: str, var: str, time_units_seconds: float = 86400.0,
                periodic: bool = False, period_seconds: float = 360 * 86400.0,
                dtype=jnp.float32) -> TimeSeries:
    """Load a (time, ...) variable from a NetCDF file as a TimeSeries."""
    from isca_tpu.utils.input_files import read_netcdf

    d = read_netcdf(path)
    data = d[var]
    t = d.get("time", np.arange(data.shape[0]))
    return TimeSeries(
        data=jnp.asarray(data, dtype),
        times=jnp.asarray(np.asarray(t, np.float64) * time_units_seconds, dtype),
        periodic=periodic, period_seconds=float(period_seconds),
    )


def interp_pressure(field, plevs, p_full):
    """Vertical interpolation of a pressure-level climatology onto model
    levels inside jit — the reference interpolator's INTERP_WEIGHTED_P mode
    (src/atmos_shared/interpolator/interpolator.F90).

    field: (..., nplev) values on climatology pressure levels (any leading
    dims broadcastable against p_full's leading dims); plevs: (nplev,)
    increasing [Pa]; p_full: (..., L) model pressures [Pa].  Linear in
    log-pressure, constant extrapolation outside the climatology range.
    """
    plevs = jnp.asarray(plevs, p_full.dtype)
    logp = jnp.log(plevs)
    lt = jnp.log(p_full)
    np_ = plevs.shape[0]
    i0 = jnp.clip(jnp.searchsorted(logp, lt, side="right") - 1, 0, np_ - 2)
    w = jnp.clip((lt - logp[i0]) / (logp[i0 + 1] - logp[i0]), 0.0, 1.0)
    f = jnp.broadcast_to(field, p_full.shape[:-1] + (np_,))
    lo = jnp.take_along_axis(f, i0, axis=-1)
    hi = jnp.take_along_axis(f, i0 + 1, axis=-1)
    return (1.0 - w) * lo + w * hi


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["series", "plevs"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class PressureTimeSeries:
    """Time-varying climatology on fixed pressure levels (e.g. ozone): time
    interpolation + per-column log-p vertical interpolation, all on device.

    series.data has shape (nt, ..., nplev) with the pressure axis LAST (the
    loader moves it); `at(t, p_full)` returns (..., L) on model levels.
    """

    series: TimeSeries
    plevs: jax.Array        # (nplev,) increasing [Pa]

    def at(self, time_seconds, p_full):
        f = self.series.at(time_seconds)       # (..., nplev)
        return interp_pressure(f, self.plevs, p_full)


def load_pressure_climatology(path, var, lat_model, lon_model,
                              periodic=True,
                              year_seconds=360 * 86400.0,
                              dtype=jnp.float32) -> PressureTimeSeries:
    """Read a (time, pfull, lat[, lon]) climatology file (the reference's
    ozone_1990-style input), bilinearly regrid horizontally onto the model
    grid at load time, and wrap for on-device time+pressure interpolation.

    Mirrors interpolator_init + interpolator (interpolator.F90) for the
    INTERP_WEIGHTED_P / annually-periodic case used by rrtm_radiation
    (rrtm_radiation.F90 o3 input).
    """
    from isca_tpu.utils.input_files import read_netcdf, regrid_bilinear

    d = read_netcdf(path)
    data = np.asarray(d[var], np.float64)
    lat_names = [k for k in ("lat", "latitude") if k in d]
    lon_names = [k for k in ("lon", "longitude") if k in d]
    p_names = [k for k in ("pfull", "plev", "level", "pressure") if k in d]
    lat_in = np.asarray(d[lat_names[0]]).ravel()
    p_in = np.asarray(d[p_names[0]], np.float64).ravel()
    if p_in.max() < 2000.0:          # file in hPa -> Pa
        p_in = p_in * 100.0
    if data.ndim == 3:               # (time, pfull, lat): zonal-mean file
        data = data[..., None]
        lon_in = np.array([0.0])
    else:
        lon_in = np.asarray(d[lon_names[0]]).ravel()

    nt, npl = data.shape[0], data.shape[1]
    out = np.empty((nt, npl, lat_model.size, lon_model.size))
    for it in range(nt):
        for ip in range(npl):
            if lon_in.size == 1:
                prof = np.interp(np.asarray(lat_model), np.sort(lat_in),
                                 data[it, ip, np.argsort(lat_in), 0])
                out[it, ip] = prof[:, None]
            else:
                out[it, ip] = regrid_bilinear(
                    lat_in, lon_in, data[it, ip],
                    np.asarray(lat_model), np.asarray(lon_model))
    # sort pressure increasing and move the level axis last:
    order = np.argsort(p_in)
    out = out[:, order]
    out = np.moveaxis(out, 1, -1)    # (nt, lat, lon, nplev)
    series = monthly_climatology(out, year_seconds, dtype) if periodic else \
        TimeSeries(data=jnp.asarray(out, dtype),
                   times=jnp.asarray(np.asarray(d.get(
                       "time", np.arange(nt)), np.float64) * 86400.0, dtype),
                   periodic=False, period_seconds=float(year_seconds))
    return PressureTimeSeries(series=series,
                              plevs=jnp.asarray(p_in[order], dtype))
