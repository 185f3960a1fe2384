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


from isca_tpu.physics.gravity_wave_drag import (
    CgDrag,
    CgDragConfig,
    MgDragConfig,
    const_drag,
    mg_drag,
)


@dataclasses.dataclass(frozen=True)
class DampingDriverConfig:
    do_rayleigh: bool = True
    trayfric: float = -0.5          # days if negative (reference convention)
    sponge_pbottom: float = 50.0    # Pa
    do_conserve_energy: bool = True
    do_mg_drag: bool = False        # orographic GWD (mg_drag.f90)
    do_cg_drag: bool = False        # convective GWD (cg_drag.f90, AD99)
    do_const_drag: bool = False     # empirical drag (damping_driver.f90:283)
    # Garner (2001) topographic drag: the reference ships it as a FATAL stub
    # ("not supported as part of the public release", topo_drag.f90:62-63);
    # selecting it here raises the same way
    do_topo_drag: bool = False
    const_drag_amp: float = 3.0e-4
    const_drag_off: float = 0.0
    mg: MgDragConfig = MgDragConfig()
    cg: CgDragConfig = CgDragConfig()
    constants: Constants = EARTH


class DampingResult(NamedTuple):
    dt_u: jax.Array
    dt_v: jax.Array
    dt_t: jax.Array
    diagnostics: dict


def damping_driver(
    cfg: DampingDriverConfig, delta_t, p_full, u, v, dt_u, dt_v, dt_t,
    temp=None, p_half=None, z_full=None, z_half=None, hprime=None,
    cg: CgDrag | None = None, lat2d=None, day_of_year=0.0,
    days_per_year=360.0,
) -> DampingResult:
    """damping_driver.f90:168-330 sequencing: rayleigh -> mg_drag ->
    cg_drag -> const_drag. Level-last arrays (..., L)."""
    C = cfg.constants
    diag = {}
    if cfg.do_topo_drag:
        raise NotImplementedError(
            "topo_drag is not supported (the reference's topo_drag.f90 is a "
            "FATAL stub in the public release)")

    def add_diss(du, dv, dt_t):
        diss = -((u + 0.5 * delta_t * du) * du
                 + (v + 0.5 * delta_t * dv) * dv) / C.cp_air
        return dt_t + diss

    if cfg.do_rayleigh:
        tray = cfg.trayfric * (-86400.0 if cfg.trayfric < 0 else 1.0)
        rfactr = 1.0 / tray if tray != 0 else 0.0
        pb = cfg.sponge_pbottom
        fact = jnp.where(p_full < pb, rfactr * (pb - p_full) ** 2 / pb**2, 0.0)
        du, dv = -u * fact, -v * fact
        dt_u, dt_v = dt_u + du, dt_v + dv
        if cfg.do_conserve_energy:
            dt_t = add_diss(du, dv, dt_t)
        diag["udt_rdamp"] = du

    if cfg.do_mg_drag:
        mg = mg_drag(cfg.mg, delta_t, u, v, temp, p_full, p_half,
                     z_full, z_half, hprime)
        dt_u, dt_v = dt_u + mg.dt_u, dt_v + mg.dt_v
        dt_t = dt_t + mg.dt_t
        diag.update(udt_gwd=mg.dt_u, vdt_gwd=mg.dt_v,
                    taubx=mg.taubx, tauby=mg.tauby)

    if cfg.do_cg_drag:
        res = cg(p_full, z_full, temp, u, v)
        dt_u, dt_v = dt_u + res.gwfcng_x, dt_v + res.gwfcng_y
        diag.update(gwfu_cgwd=res.gwfcng_x, gwfv_cgwd=res.gwfcng_y)

    if cfg.do_const_drag:
        du = const_drag(cfg.const_drag_amp, cfg.const_drag_off, lat2d,
                        p_full, day_of_year, days_per_year)
        dt_u = dt_u + du
        diag["udt_cnstd"] = du

    return DampingResult(dt_u, dt_v, dt_t, diag)
