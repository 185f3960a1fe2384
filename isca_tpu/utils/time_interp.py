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
