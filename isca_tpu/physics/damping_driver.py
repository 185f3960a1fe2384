"""Upper-atmosphere damping driver: Rayleigh sponge (+ gravity-wave-drag hooks).

Reference: src/atmos_param/damping_driver/damping_driver.f90. The Rayleigh
sponge damps winds where p < sponge_pbottom with rate
rfactr * ((pb - p)/pb)^2, optionally returning the dissipative heating.
The orographic (mg_drag) and convective (cg_drag) gravity-wave schemes plug in
via the same tendency interface (to be filled in a later tier; their namelist
seams are reserved here).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from isca_tpu.constants import Constants, EARTH


@dataclasses.dataclass(frozen=True)
class DampingDriverConfig:
    do_rayleigh: bool = True
    trayfric: float = -0.5          # days if negative (reference convention)
    sponge_pbottom: float = 50.0    # Pa
    do_conserve_energy: bool = True
    do_mg_drag: bool = False        # orographic GWD (later tier)
    do_cg_drag: bool = False        # convective GWD (later tier)
    constants: Constants = EARTH


class DampingResult(NamedTuple):
    dt_u: jax.Array
    dt_v: jax.Array
    dt_t: jax.Array


def damping_driver(
    cfg: DampingDriverConfig, delta_t, p_full, u, v, dt_u, dt_v, dt_t
) -> DampingResult:
    """Level-last arrays (..., L)."""
    C = cfg.constants
    if not cfg.do_rayleigh:
        return DampingResult(dt_u, dt_v, dt_t)
    tray = cfg.trayfric * (-86400.0 if cfg.trayfric < 0 else 1.0)
    rfactr = 1.0 / tray if tray != 0 else 0.0
    pb = cfg.sponge_pbottom
    fact = jnp.where(
        p_full < pb, rfactr * (pb - p_full) ** 2 / pb**2, 0.0
    )
    du = -u * fact
    dv = -v * fact
    dt_u2 = dt_u + du
    dt_v2 = dt_v + dv
    if cfg.do_conserve_energy:
        diss = -((u + 0.5 * delta_t * du) * du + (v + 0.5 * delta_t * dv) * dv) / C.cp_air
        dt_t2 = dt_t + diss
    else:
        dt_t2 = dt_t
    return DampingResult(dt_u2, dt_v2, dt_t2)
