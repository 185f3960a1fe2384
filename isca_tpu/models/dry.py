"""Held-Suarez dry primitive-equation model (the reference's `held_suarez.x`).

Composes the spectral dycore (isca_tpu.dycore.primitive) with Held-Suarez
forcing evaluated at the `previous` time level
(driver: src/atmos_spectral/driver/solo/atmosphere.F90:292-330).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from isca_tpu.dycore.primitive import (
    GridTendencies,
    PrimitiveConfig,
    PrimitiveCore,
    PrimitiveState,
)
from isca_tpu.physics.hs_forcing import HSForcing, HSForcingConfig
from isca_tpu.spectral import transforms as tr


@dataclasses.dataclass(frozen=True)
class HeldSuarezConfig:
    core: PrimitiveConfig = PrimitiveConfig()
    forcing: HSForcingConfig = HSForcingConfig()


class HeldSuarezModel:
    def __init__(self, config: HeldSuarezConfig = HeldSuarezConfig()):
        self.config = config
        self.core = PrimitiveCore(config.core)
        self.forcing = HSForcing(config.forcing, self.core.T.lats)
        self.surf_geopotential = jnp.zeros(self.core.T.grid_shape, config.core.dtype)

    def initial_state(self) -> PrimitiveState:
        return self.core.cold_start(self.surf_geopotential)

    # valid_range_t guard (spectral_dynamics.F90:940-1005)
    validity_name = "temperature"

    @property
    def validity_range(self):
        return self.config.core.valid_range_t

    def validity(self, state: PrimitiveState):
        return self.core.validity(state)

    def step(self, state: PrimitiveState, first: bool = False) -> PrimitiveState:
        # pressures at `current`, prognostic fields at `previous` (reference order)
        with jax.named_scope("physics"):
            _, _, p_full, _ = self.core.pressure_variables(state.psg.curr)
            phys = self.forcing(
                state.ug.prev, state.vg.prev, state.tg.prev, p_full, state.psg.curr
            )
        with jax.named_scope("dynamics"):
            return self.core.dynamics_step(
                state, phys, self.surf_geopotential, first=first
            )

    def run(self, state: PrimitiveState, num_steps: int, first: bool = True) -> PrimitiveState:
        if first:
            state = self.step(state, first=True)
            num_steps -= 1
        body = lambda s, _: (self.step(s), None)
        state, _ = jax.lax.scan(body, state, None, length=num_steps)
        return state

    def diag_fields(self, state: PrimitiveState, extended: bool = False
                    ) -> dict[str, jax.Array]:
        """Standard 'dynamics' module diagnostic fields (SURVEY.md B.2).

        extended=True adds heights/pressures/slp/wspd, eddy covariance
        products, tracer fluxes, EKE/vort_norm (spectral_diagnostics set)."""
        if extended:
            return self.core.spectral_diagnostics(state, self.surf_geopotential)
        return {
            "ps": state.psg.curr,
            "ucomp": state.ug.curr,
            "vcomp": state.vg.curr,
            "temp": state.tg.curr,
            "vor": state.vorg.curr,
            "div": state.divg.curr,
            "omega": state.wg_full,
        }

    def diagnostics(self, state: PrimitiveState) -> dict[str, jax.Array]:
        @jax.jit
        def _diag(state):
            T = self.core.T
            return {
                "mean_ps": tr.area_weighted_mean(T, state.psg.curr),
                "mean_T": tr.area_weighted_mean(T, state.tg.curr.mean(axis=0)),
                "tmin": state.tg.curr.min(),
                "tmax": state.tg.curr.max(),
                "umax": jnp.abs(state.ug.curr).max(),
                "u_zonal": state.ug.curr.mean(axis=2),
                "t_zonal": state.tg.curr.mean(axis=2),
                "energy": self.core.mass_weighted_integral(
                    0.5 * (state.ug.curr**2 + state.vg.curr**2)
                    + self.core.C.cp_air * state.tg.curr,
                    state.psg.curr,
                ),
            }
        return _diag(state)
