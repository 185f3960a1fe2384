"""Orbital mechanics / insolation (astronomy).

Reference: src/shared/astronomy/astronomy.f90 (diurnal_solar :1123,
daily_mean_solar, annual_mean_solar). Pure-jnp functions of orbital parameters:

* declination from obliquity and orbital position (Kepler's equation solved by
  Newton iteration for eccentric orbits)
* instantaneous coszen = sin(lat) sin(dec) + cos(lat) cos(dec) cos(h)
* time-averaged coszen over a radiation window (analytic integral over the
  sunlit part of the hour-angle interval), as used with use_time_average_coszen
* daily-mean coszen and fraction of day with sun up

Angles in radians; time_since_ae = orbital position since autumnal equinox
(2*pi = one year), gmt = greenwich time of day as angle (2*pi = one day).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Orbit:
    ecc: float = 0.0
    obliq_deg: float = 23.439
    per_deg: float = 102.932   # longitude of perihelion (from autumnal equinox)

    @property
    def obliq(self):
        return jnp.deg2rad(self.obliq_deg)


def orbital_angle(orbit: Orbit, time_since_ae, iters: int = 8):
    """True anomaly measured from autumnal equinox for elliptical orbits.

    With ecc=0 this is just time_since_ae. Otherwise solve Kepler's equation
    M = E - e sin E by Newton, with M referenced to perihelion.
    """
    e = orbit.ecc
    if e == 0.0:
        return time_since_ae
    per = jnp.deg2rad(orbit.per_deg)
    M = time_since_ae - per  # mean anomaly relative to perihelion (approx.)

    def body(_, E):
        return E - (E - e * jnp.sin(E) - M) / (1.0 - e * jnp.cos(E))

    E = jax.lax.fori_loop(0, iters, body, M)
    nu = 2.0 * jnp.arctan(jnp.sqrt((1 + e) / (1 - e)) * jnp.tan(E / 2.0))
    return nu + per


def declination(orbit: Orbit, time_since_ae):
    """Solar declination. time_since_ae = 0 at the autumnal equinox, so a
    quarter year later is the (northern) winter solstice: dec = -obliquity."""
    ang = orbital_angle(orbit, time_since_ae)
    return jnp.arcsin(-jnp.sin(orbit.obliq) * jnp.sin(ang))


def earth_sun_distance_factor(orbit: Orbit, time_since_ae):
    """(a/r)^2 insolation scaling."""
    e = orbit.ecc
    if e == 0.0:
        return jnp.asarray(1.0)
    nu = orbital_angle(orbit, time_since_ae) - jnp.deg2rad(orbit.per_deg)
    r_over_a = (1.0 - e * e) / (1.0 + e * jnp.cos(nu))
    return 1.0 / (r_over_a * r_over_a)


def diurnal_solar(orbit: Orbit, lat, lon, gmt, time_since_ae, dt_radians=None):
    """(coszen, fracday, rrsun).

    lat, lon broadcastable arrays (radians). If dt_radians is given, coszen is
    the average over [t, t + dt] of max(0, coszen) divided by the sunlit
    fraction... following the reference: returns the mean cosine of the zenith
    angle over the SUNLIT part of the interval, and fracday = sunlit fraction.
    """
    dec = declination(orbit, time_since_ae)
    rr = earth_sun_distance_factor(orbit, time_since_ae)
    a = jnp.sin(lat) * jnp.sin(dec)
    b = jnp.cos(lat) * jnp.cos(dec)
    # hour angle: 0 at local noon; gmt measured from midnight -> h = gmt + lon - pi
    h = jnp.mod(gmt + lon - jnp.pi, 2.0 * jnp.pi)
    h = jnp.where(h > jnp.pi, h - 2.0 * jnp.pi, h)

    # half-day length H: cos H = -a/b
    cosH = jnp.clip(-a / jnp.where(b != 0, b, 1e-30), -1.0, 1.0)
    H = jnp.arccos(cosH)
    H = jnp.where(b <= 0, jnp.where(a > 0, jnp.pi, 0.0), H)

    if dt_radians is None:
        cz = jnp.maximum(a + b * jnp.cos(h), 0.0)
        frac = (cz > 0.0).astype(cz.dtype)
        return cz, frac, rr

    # analytic average of max(0, a + b cos h') over h' in [h, h + dt]
    dt = dt_radians
    h1, h2 = h, h + dt
    # integration bounds clipped to the sunlit window [-H, H] (mod 2 pi)
    # handle the wrap by also considering the next day's window [2pi-H, ...]
    def sunlit_integral(lo, hi):
        lo_c = jnp.clip(lo, -H, H)
        hi_c = jnp.clip(hi, -H, H)
        ints = a * (hi_c - lo_c) + b * (jnp.sin(hi_c) - jnp.sin(lo_c))
        time = hi_c - lo_c
        return ints, time

    i1, t1 = sunlit_integral(h1, h2)
    # window of the following day (centered at h = 2 pi)
    i2, t2 = sunlit_integral(h1 - 2 * jnp.pi, h2 - 2 * jnp.pi)
    total_int = i1 + i2
    total_time = t1 + t2
    frac = total_time / dt
    cz = jnp.where(total_time > 0, total_int / jnp.where(total_time > 0, total_time, 1.0), 0.0)
    return jnp.maximum(cz, 0.0), frac, rr


def daily_mean_solar(orbit: Orbit, lat, time_since_ae):
    """(coszen averaged over sunlit hours, fraction of day with sun up)."""
    dec = declination(orbit, time_since_ae)
    rr = earth_sun_distance_factor(orbit, time_since_ae)
    a = jnp.sin(lat) * jnp.sin(dec)
    b = jnp.cos(lat) * jnp.cos(dec)
    cosH = jnp.clip(-a / jnp.where(b != 0, b, 1e-30), -1.0, 1.0)
    H = jnp.arccos(cosH)
    H = jnp.where(b <= 0, jnp.where(a > 0, jnp.pi, 0.0), H)
    frac = H / jnp.pi
    integ = a * H + b * jnp.sin(H)
    cz = jnp.where(H > 0, integ / jnp.where(H > 0, H, 1.0), 0.0)
    return jnp.maximum(cz, 0.0), frac, rr


def annual_mean_p2_insolation(solar_constant, lat, del_sol=1.4, del_sw=0.0):
    """S/4 [1 + del_sol P2(sin lat) + del_sw sin lat] (two_stream default)."""
    p2 = (1.0 - 3.0 * jnp.sin(lat) ** 2) / 4.0
    return 0.25 * solar_constant * (1.0 + del_sol * p2 + del_sw * jnp.sin(lat))
