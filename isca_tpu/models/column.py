"""Single-column (or lat-lon grid of independent columns) physics model.

Reference: src/atmos_column/column.F90 + the COLUMN_MODEL cpp variant of the
driver (atmosphere.F90:39-53): the spectral dynamical core is replaced by a
no-op dynamics on a (possibly 1x1) grid; the same leapfrog time levels and the
full idealized_moist_phys stack run unchanged. Useful for physics development
and fast parameter sweeps (all columns are independent -> embarrassingly
parallel on the batch axes).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from isca_tpu.constants import Constants, EARTH
from isca_tpu.dycore import press_geopot as pgm
from isca_tpu.dycore import vert_coordinate as vc
from isca_tpu.dycore.time_integration import TwoLevel
from isca_tpu.physics.moist_driver import MoistPhysics, MoistPhysicsConfig


@dataclasses.dataclass(frozen=True)
class ColumnConfig:
    nlat: int = 1
    nlon: int = 1
    lat_deg: float = 0.0           # latitude(s) of the column(s)
    num_levels: int = 25
    dt: float = 600.0
    vert_coord_option: str = "uneven_sigma"
    vert_coord_kwargs: tuple = (("scale_heights", 6.0), ("surf_res", 0.5), ("exponent", 7.5))
    robert_coeff: float = 0.03
    initial_temperature: float = 264.0
    initial_sphum: float = 2.0e-6
    t_surf_init: float = 285.0
    ps: float = 1.0e5
    valid_range_t: tuple = (100.0, 500.0)
    physics: MoistPhysicsConfig = MoistPhysicsConfig()
    constants: Constants = EARTH
    dtype: Any = jnp.float32


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["t", "q", "u", "v", "t_surf", "time_seconds"],
    meta_fields=[],
)
@dataclasses.dataclass
class ColumnState:
    t: TwoLevel      # (lat, lon, L) level-last
    q: TwoLevel
    u: TwoLevel
    v: TwoLevel
    t_surf: jax.Array
    time_seconds: jax.Array


class ColumnModel:
    def __init__(self, config: ColumnConfig = ColumnConfig()):
        self.config = c = config
        self.C = c.constants
        pk, bk = vc.compute_vert_coord(c.vert_coord_option, c.num_levels,
                                       **dict(c.vert_coord_kwargs))
        self.pk = jnp.asarray(pk, c.dtype)
        self.bk = jnp.asarray(bk, c.dtype)
        self.top_is_zero = bool(pk[0] == 0.0 and bk[0] == 0.0)
        lats = jnp.asarray(np.deg2rad(np.full(c.nlat, c.lat_deg)), c.dtype)
        lons = jnp.asarray(np.zeros(c.nlon), c.dtype)
        self.physics = MoistPhysics(c.physics, lats, lons)
        # minimal grid info for the Experiment/diag layer (column_grid role)
        from types import SimpleNamespace
        self.T = SimpleNamespace(lats=lats, lons=lons,
                                 grid_shape=(c.nlat, c.nlon))
        ps = jnp.full((c.nlat, c.nlon), c.ps, c.dtype)
        ph, lph, pf, lpf = pgm.pressure_variables(jnp, self.pk, self.bk, ps, self.top_is_zero)
        self.p_half, self.p_full = ph, pf
        self.ln_p_half, self.ln_p_full = lph, lpf

    # valid_range_t guard (column variant; level-last layout)
    validity_name = "temperature"

    @property
    def validity_range(self):
        return self.config.valid_range_t

    def validity(self, state: "ColumnState"):
        from isca_tpu.utils.validity import check_range
        lo, hi = self.config.valid_range_t
        return check_range(state.t.curr, lo, hi)

    def initial_state(self) -> ColumnState:
        c = self.config
        shape = (c.nlat, c.nlon, c.num_levels)
        two = lambda x: TwoLevel(x, x)
        return ColumnState(
            t=two(jnp.full(shape, c.initial_temperature, c.dtype)),
            q=two(jnp.full(shape, c.initial_sphum, c.dtype)),
            u=two(jnp.zeros(shape, c.dtype)),
            v=two(jnp.zeros(shape, c.dtype)),
            t_surf=jnp.full((c.nlat, c.nlon), c.t_surf_init, c.dtype),
            time_seconds=jnp.zeros((), jnp.float32),
        )

    def step(self, state: ColumnState, first: bool = False) -> ColumnState:
        c, C = self.config, self.C
        delta_t = c.dt if first else 2.0 * c.dt
        geo_f, geo_h = pgm.compute_geopotential(
            jnp, C.rdgas, state.t.curr, self.ln_p_half, self.ln_p_full,
            jnp.zeros((c.nlat, c.nlon), c.dtype), self.top_is_zero,
            p_half=self.p_half,
        )
        day = C.seconds_per_day
        gmt = jnp.mod(state.time_seconds, day) / day * 2.0 * jnp.pi
        tsae = jnp.mod(
            state.time_seconds / C.orbital_period
            - c.physics.radiation.equinox_day, 1.0
        ) * 2.0 * jnp.pi
        phys = self.physics(
            delta_t, c.dt,
            state.u.prev, state.v.prev, state.t.prev, state.q.prev,
            self.p_full, self.p_half, self.p_full, self.p_half,
            geo_f / C.grav, geo_h / C.grav,
            state.t_surf, gmt=gmt, time_since_ae=tsae,
        )

        # Robert-filtered leapfrog on the columns (no dynamics tendencies)
        from isca_tpu.dycore.time_integration import leapfrog
        lf = lambda x, tend: leapfrog(x, tend, delta_t, c.robert_coeff, 1.0)
        return ColumnState(
            t=lf(state.t, phys.dt_t),
            q=lf(state.q, phys.dt_q),
            u=lf(state.u, phys.dt_u),
            v=lf(state.v, phys.dt_v),
            t_surf=phys.t_surf,
            time_seconds=state.time_seconds + c.dt,
        )

    def run(self, state: ColumnState, num_steps: int, first: bool = True) -> ColumnState:
        if first:
            state = self.step(state, first=True)
            num_steps -= 1
        body = lambda s, _: (self.step(s), None)
        state, _ = jax.lax.scan(body, state, None, length=num_steps)
        return state

    def diag_fields(self, state: ColumnState) -> dict:
        return {
            "temp": jnp.moveaxis(state.t.curr, -1, 0),
            "sphum": jnp.moveaxis(state.q.curr, -1, 0),
            "t_surf": state.t_surf,
        }
