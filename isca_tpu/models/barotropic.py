"""Spectral barotropic vorticity model.

Reference: src/atmos_spectral_barotropic/{barotropic_dynamics,atmosphere,
barotropic_physics}.F90. The smallest full model loop in the hierarchy:

    d(zeta)/dt = -div[ (zeta + f) V ] + stirring - hyperdiffusion

solved pseudo-spectrally: the nonlinear term is formed in grid space as the
rotational tendency pair (pv*v, -pv*u) and converted with vor_div_from_uv_grid;
time stepping is Robert-filtered leapfrog; damping is implicit del^(2k).

TPU-first notes: state is a pytree; `step` is a pure jittable function; a model
day is a `lax.scan` over steps inside one jit. An optional spectral tracer is
advected with horizontal_advection (advective form).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from isca_tpu.dycore.damping import SpectralDamping, apply_damping, make_damping
from isca_tpu.dycore.time_integration import TwoLevel, leapfrog
from isca_tpu.physics.stirring import Stirring, make_stirring, stir
from isca_tpu.spectral import transforms as tr


@dataclasses.dataclass(frozen=True)
class BarotropicConfig:
    resolution: str | int = "T85"
    nlon: int | None = None       # lon_max nml; default from resolution table
    nlat: int | None = None       # lat_max nml
    dt: float = 1200.0
    radius: float = 6371.0e3
    omega: float = 7.292e-5
    robert_coeff: float = 0.04
    raw_filter_coeff: float = 1.0
    damping_option: str = "resolution_dependent"
    damping_order: int = 4
    damping_coeff: float = 1.0e-4
    damping_coeff_r: float = 0.0
    cutoff_wn: int = 30
    initial_zonal_wind: str = "two_jets"   # 'two_jets' | 'zero'
    # initial vorticity eddy perturbation (barotropic_dynamics.F90:~280)
    zeta_0: float = 8.0e-5
    m_0: int = 4
    eddy_width: float = 15.0
    eddy_lat: float = 45.0
    spec_tracer: bool = True
    valid_range_v: tuple[float, float] = (-1.0e3, 1.0e3)
    transform_precision: str = "highest"   # MXU einsum precision
    truncation_shape: str = "triangular"   # or 'rhomboidal'
    fourier_inc: int = 1
    # stirring_nml
    stirring_amplitude: float = 0.0
    stirring_decay_time: float = 2 * 86400.0
    stirring_lat0: float = 45.0
    stirring_lon0: float = 180.0
    stirring_widthy: float = 12.0
    stirring_widthx: float = 45.0
    stirring_B: float = 0.0
    stirring_do_localize: bool = True
    stirring_n_max: int = 15
    stirring_n_min: int = 9
    stirring_m_min: int = 3
    dtype: Any = jnp.float32


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["vors", "u", "v", "vorg", "trs", "s_stir", "rng"],
    meta_fields=[],
)
@dataclasses.dataclass
class BarotropicState:
    vors: TwoLevel     # spectral vorticity (M+1, N+2) complex, two levels
    u: TwoLevel        # grid winds (nlat, nlon)
    v: TwoLevel
    vorg: TwoLevel     # grid vorticity
    trs: TwoLevel      # spectral tracer (zeros if disabled)
    s_stir: jax.Array  # stirring AR(1) state
    rng: jax.Array


class BarotropicModel:
    """Holds the (static) transform tables and config; provides pure step fns."""

    def __init__(self, config: BarotropicConfig = BarotropicConfig()):
        self.config = c = config
        self.T = tr.make_transforms(c.resolution, nlon=c.nlon, nlat=c.nlat,
                                    radius=c.radius, dtype=c.dtype,
                                    precision=c.transform_precision,
                                    truncation_shape=c.truncation_shape,
                                    fourier_inc=c.fourier_inc)
        self.damping = make_damping(
            self.T,
            damping_coeff=c.damping_coeff,
            damping_order=c.damping_order,
            damping_option=c.damping_option,
            cutoff_wn=c.cutoff_wn,
            damping_coeff_r=c.damping_coeff_r,
        )
        self.stirring = make_stirring(
            self.T,
            dt=c.dt,
            amplitude=c.stirring_amplitude,
            decay_time=c.stirring_decay_time,
            lat0=c.stirring_lat0,
            lon0=c.stirring_lon0,
            widthy=c.stirring_widthy,
            widthx=c.stirring_widthx,
            B=c.stirring_B,
            do_localize=c.stirring_do_localize,
            n_total_forcing_max=c.stirring_n_max,
            n_total_forcing_min=c.stirring_n_min,
            zonal_forcing_min=c.stirring_m_min,
        )
        self.coriolis = tr.coriolis_grid(self.T, c.omega)

    # ------------------------------------------------------------------
    # valid_range_v wind guard (P8 graceful-shutdown analogue)
    validity_name = "wind component (0=u, 1=v)"

    @property
    def validity_range(self):
        return self.config.valid_range_v

    def validity(self, state: "BarotropicState"):
        from isca_tpu.utils.validity import check_range
        lo, hi = self.config.valid_range_v
        return check_range(jnp.stack([state.u.curr, state.v.curr]), lo, hi)

    def initial_state(self, seed: int = 0) -> BarotropicState:
        c, T = self.config, self.T
        if c.initial_zonal_wind == "two_jets":
            cl, sl = np.asarray(T.coslat), np.asarray(T.sinlat)
            u1d = 25.0 * cl - 30.0 * cl**3 + 300.0 * sl**2 * cl**6
        elif c.initial_zonal_wind == "zero":
            u1d = np.zeros(T.nlat)
        else:
            raise ValueError(c.initial_zonal_wind)
        u0 = np.broadcast_to(u1d[:, None], (T.nlat, T.nlon)).astype(np.float64)

        # Gaussian eddy perturbation in vorticity at zonal wavenumber m_0
        # (barotropic_dynamics.F90 init: 0.5*zeta_0*cos(lat)*exp(-yy^2)*cos(m_0*lon),
        # yy = (lat - eddy_lat)/eddy_width in degrees).
        lat = np.degrees(np.asarray(T.lats))
        lon = np.asarray(T.lons)
        yy = (lat - c.eddy_lat) / c.eddy_width
        envelope = 0.5 * np.asarray(T.coslat) * np.exp(-yy * yy)
        pert = c.zeta_0 * envelope[:, None] * np.cos(c.m_0 * lon)[None, :]

        # tracer: 1 in 10-20N band, -1 poleward of 70N (reference init)
        lat_deg = lat[:, None]
        trg = np.zeros(T.grid_shape)
        trg = np.where((lat_deg > 10.0) & (lat_deg < 20.0), 1.0, trg)
        trg = np.where(lat_deg > 70.0, -1.0, trg)

        @jax.jit
        def _init(u, pert, trg):
            v = jnp.zeros_like(u)
            vors, _ = tr.vor_div_from_uv_grid(T, u, v)
            vors = tr.triangular_truncate(T, vors + tr.grid_to_spec(T, pert))
            u, v = tr.uv_grid_from_vor_div(T, vors, jnp.zeros_like(vors))
            vorg = tr.spec_to_grid(T, vors)
            trs = tr.grid_to_spec(T, trg) if c.spec_tracer else jnp.zeros_like(vors)
            return vors, u, v, vorg, trs, jnp.zeros_like(vors)

        vors, u, v, vorg, trs, s_stir = _init(
            jnp.asarray(u0, c.dtype),
            jnp.asarray(pert, c.dtype),
            jnp.asarray(trg, c.dtype),
        )

        two = lambda x: TwoLevel(x, x)
        return BarotropicState(
            vors=two(vors),
            u=two(u),
            v=two(v),
            vorg=two(vorg),
            trs=two(trs),
            s_stir=s_stir,
            rng=jax.random.PRNGKey(seed),
        )

    # ------------------------------------------------------------------
    def step(self, state: BarotropicState, first: bool = False) -> BarotropicState:
        """One leapfrog step (pure; jit/scan-able). `first` -> forward Euler."""
        c, T = self.config, self.T
        delta_t = c.dt if first else 2.0 * c.dt

        pv = state.vorg.curr + self.coriolis.astype(c.dtype)
        tend_u = pv * state.v.curr
        tend_v = -pv * state.u.curr
        dt_vors, _ = tr.vor_div_from_uv_grid(T, tend_u, tend_v)
        dt_vors = apply_damping(self.damping, state.vors.prev, dt_vors, delta_t)
        s_stir, rng = stir(self.stirring, T, state.s_stir, state.rng)
        dt_vors = dt_vors + s_stir

        vors = leapfrog(state.vors, dt_vors, delta_t, c.robert_coeff, c.raw_filter_coeff)
        vorg_future = tr.spec_to_grid(T, vors.curr)
        u_future, v_future = tr.uv_grid_from_vor_div(T, vors.curr, jnp.zeros_like(vors.curr))

        # spectral tracer: advective-form transport + damping + leapfrog
        if c.spec_tracer:
            adv = tr.horizontal_advection(T, state.trs.curr, state.u.curr, state.v.curr)
            dt_trs = tr.grid_to_spec(T, adv)
            dt_trs = apply_damping(self.damping, state.trs.prev, dt_trs, delta_t)
            trs = leapfrog(state.trs, dt_trs, delta_t, c.robert_coeff, c.raw_filter_coeff)
        else:
            trs = state.trs

        advance = lambda old, fut: TwoLevel(old.curr, fut)
        return BarotropicState(
            vors=vors,
            u=advance(state.u, u_future),
            v=advance(state.v, v_future),
            vorg=advance(state.vorg, vorg_future),
            trs=trs,
            s_stir=s_stir,
            rng=rng,
        )

    # ------------------------------------------------------------------
    def run(self, state: BarotropicState, num_steps: int, first: bool = True) -> BarotropicState:
        """Scan num_steps steps under one jit (first step forward if `first`)."""
        if first:
            state = self.step(state, first=True)
            num_steps -= 1
        body = lambda s, _: (self.step(s), None)
        state, _ = jax.lax.scan(body, state, None, length=num_steps)
        return state

    def diag_fields(self, state: BarotropicState) -> dict[str, jax.Array]:
        return {"ucomp": state.u.curr, "vcomp": state.v.curr, "vor": state.vorg.curr}

    def diagnostics(self, state: BarotropicState) -> dict[str, jax.Array]:
        @jax.jit
        def _diag(state):
            T = self.T
            stream = tr.spec_to_grid(T, tr.inverse_laplacian(T, state.vors.prev))
            energy = -tr.area_weighted_mean(T, stream * state.vorg.prev)
            enstrophy = tr.area_weighted_mean(T, state.vorg.prev * state.vorg.curr)
            return {"energy": energy, "enstrophy": enstrophy, "stream": stream}
        return _diag(state)
