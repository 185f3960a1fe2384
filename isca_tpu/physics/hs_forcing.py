"""Held-Suarez (1994) forcing: Newtonian temperature relaxation + Rayleigh
boundary-layer friction.

Reference: src/atmos_param/hs_forcing/hs_forcing.F90:508-679 (defaults :70-85).

  T_eq = max( T_strat - eps sin(lat),
              [T* - delv cos^2(lat) ln(p/p0)] (p/p0)^kappa )
  T*   = T0 - delh sin^2(lat) - eps sin(lat)
  k_T  = ka + (ks - ka) cos^4(lat) max(0, (sigma - sigma_b)/(1 - sigma_b))
  k_v  = kf max(0, (sigma - sigma_b)/(1 - sigma_b))
  dT/dt = -k_T (T - T_eq);  du/dt = -k_v u;  dv/dt = -k_v v
  optional: dT/dt += -(u du + v dv)/cp   (do_conserve_energy)

Negative ka/ks/kf are in days (reference flag convention). Called with fields at
the `previous` time level and pressures at `current` (atmosphere.F90:304-311).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from isca_tpu.constants import Constants, EARTH
from isca_tpu.dycore.primitive import GridTendencies


@dataclasses.dataclass(frozen=True)
class HSForcingConfig:
    t_zero: float = 315.0
    t_strat: float = 200.0
    delh: float = 60.0
    delv: float = 10.0
    eps: float = 0.0
    sigma_b: float = 0.7
    P00: float = 1.0e5
    ka: float = -40.0   # negative => days
    ks: float = -4.0
    kf: float = -1.0
    do_conserve_energy: bool = True
    constants: Constants = EARTH


def _per_sec(k):
    return 1.0 / (-k * 86400.0) if k < 0 else (1.0 / k if k != 0 else 0.0)


class HSForcing:
    def __init__(self, config: HSForcingConfig, lats: jax.Array):
        """lats: (nlat,) radians."""
        self.config = config
        c = config
        self.tka = _per_sec(c.ka)
        self.tks = _per_sec(c.ks)
        self.vkf = _per_sec(c.kf)
        sin_lat = jnp.sin(lats)[:, None]
        self.sin_lat = sin_lat
        self.cos_lat_2 = 1.0 - sin_lat**2
        self.cos_lat_4 = self.cos_lat_2**2
        self.t_star_lat = c.t_zero - c.delh * sin_lat**2 - c.eps * sin_lat
        self.tstr = c.t_strat - c.eps * sin_lat

    def __call__(self, u, v, t, p_full, psg) -> GridTendencies:
        """All fields level-first (L, lat, lon); psg (lat, lon)."""
        c = self.config
        C = c.constants
        kappa = C.rdgas / C.cp_air

        p_norm = p_full / c.P00
        ln_p = jnp.log(p_norm)
        the = self.t_star_lat[None] - c.delv * self.cos_lat_2[None] * ln_p
        teq = jnp.maximum(the * p_norm**kappa, self.tstr[None])

        sigma = p_full / psg[None]
        sfac = jnp.where(
            (sigma <= 1.0) & (sigma > c.sigma_b),
            (sigma - c.sigma_b) / (1.0 - c.sigma_b),
            0.0,
        )
        tdamp = self.tka + (self.tks - self.tka) * self.cos_lat_4[None] * sfac
        dt_t = -tdamp * (t - teq)

        vfac = self.vkf * sfac
        dt_u = -vfac * u
        dt_v = -vfac * v
        if c.do_conserve_energy:
            dt_t = dt_t - (u * dt_u + v * dt_v) / C.cp_air
        return GridTendencies(du=dt_u, dv=dt_v, dt=dt_t)
