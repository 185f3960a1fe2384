"""Slab-ocean mixed layer with implicit surface energy balance.

Reference: src/atmos_spectral/driver/solo/mixed_layer.F90 (:568-747 step;
defaults :84-130) + atmos_param/qflux/qflux.f90 (Merlis analytic Q-flux).
Closes the implicit surface chain between the vertical-diffusion down and up
sweeps:

  gamma_t = 1/(1 - dtmass (dflux_t + dhdt_atm/cp))
  gamma_q = 1/(1 - dtmass (dflux_q + dedq_atm))
  fn = gamma (delta + dtmass flux);  en = gamma dtmass dflux/dT_surf
  corrected_flux = -SW_net - LW_down + cp alpha_t + alpha_lw [+ L alpha_q] - Qflux
  C_eff = C + dt dF/dT_surf ; dT_surf = -corrected_flux dt / C_eff
  delta_t = fn_t + en_t dT_surf ; delta_q = fn_q + en_q dT_surf

SST modes: interactive energy balance (default), prescribed APE analytic
profile 27(1 - sin^2(3 lat/2)), or externally provided SSTs.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from isca_tpu.constants import Constants, EARTH
from isca_tpu.physics.vert_diff import TriSurf


@dataclasses.dataclass(frozen=True)
class MixedLayerConfig:
    depth: float = 40.0
    albedo_value: float = 0.06
    evaporation: bool = True
    qflux_amp: float = 0.0
    qflux_width: float = 16.0
    do_qflux: bool = False
    do_ape_sst: bool = False
    do_sc_sst: bool = False
    tconst: float = 305.0
    land_h_capacity_prefactor: float = 1.0
    land_albedo_prefactor: float = 1.0
    constants: Constants = EARTH


class MixedLayerResult(NamedTuple):
    t_surf: jax.Array
    delta_t: jax.Array    # closed bottom-level increments for gcm_vert_diff_up
    delta_q: jax.Array
    delta_t_surf: jax.Array


def analytic_qflux(cfg: MixedLayerConfig, lats):
    """Merlis analytic ocean heat transport divergence (qflux.f90:48-62)."""
    lat_deg = jnp.degrees(lats)
    w = cfg.qflux_width
    return -cfg.qflux_amp * (1.0 - 2.0 * lat_deg**2 / w**2) * jnp.exp(
        -(lat_deg**2) / w**2
    ) / jnp.cos(lats)


def ape_sst(lats):
    """Aquaplanet Experiment analytic SST: 273.15 + 27(1-sin^2(3 lat/2)), |lat|<60."""
    sst = 273.15 + 27.0 * (1.0 - jnp.sin(1.5 * lats) ** 2)
    return jnp.where(jnp.abs(lats) < jnp.pi / 3.0, sst, 273.15)


def mixed_layer_step(
    cfg: MixedLayerConfig,
    dt,
    t_surf,
    tri: TriSurf,
    flux_t, flux_q, flux_r,
    net_surf_sw_down, surf_lw_down,
    dhdt_surf, dedt_surf, dedq_surf, drdt_surf, dhdt_atm, dedq_atm,
    ocean_qflux=0.0,
    heat_capacity=None,
    land_mask=None,
    sst_prescribed=None,
    lats=None,
) -> MixedLayerResult:
    C = cfg.constants
    inv_cp = 1.0 / C.cp_air
    if heat_capacity is None:
        heat_capacity = C.dens_h2o * 3989.24495292815 * cfg.depth
        if land_mask is not None:
            heat_capacity = jnp.where(
                land_mask, cfg.land_h_capacity_prefactor * heat_capacity, heat_capacity
            )

    gamma_t = 1.0 / (1.0 - tri.dtmass * (tri.dflux_t + dhdt_atm * inv_cp))
    gamma_q = 1.0 / (1.0 - tri.dtmass * (tri.dflux_q + dedq_atm))
    fn_t = gamma_t * (tri.delta_t + tri.dtmass * flux_t * inv_cp)
    fn_q = gamma_q * (tri.delta_q + tri.dtmass * flux_q)
    en_t = gamma_t * tri.dtmass * dhdt_surf * inv_cp
    en_q = gamma_q * tri.dtmass * dedt_surf

    alpha_t = flux_t * inv_cp + dhdt_atm * inv_cp * fn_t
    alpha_q = flux_q + dedq_atm * fn_q
    alpha_lw = flux_r
    beta_t = dhdt_surf * inv_cp + dhdt_atm * inv_cp * en_t
    beta_q = dedt_surf + dedq_atm * en_q
    beta_lw = drdt_surf

    corrected_flux = (
        -net_surf_sw_down - surf_lw_down + alpha_t * C.cp_air + alpha_lw - ocean_qflux
    )
    t_surf_dependence = beta_t * C.cp_air + beta_lw
    if cfg.evaporation:
        corrected_flux = corrected_flux + alpha_q * C.hlv
        t_surf_dependence = t_surf_dependence + beta_q * C.hlv

    if cfg.do_ape_sst or cfg.do_sc_sst:
        sst_new = ape_sst(lats) if cfg.do_ape_sst else sst_prescribed
        delta_t_surf = sst_new - t_surf
        t_surf = sst_new
    else:
        eff_heat_capacity = heat_capacity + t_surf_dependence * dt
        delta_t_surf = -corrected_flux * dt / eff_heat_capacity
        t_surf = t_surf + delta_t_surf

    delta_t = fn_t + en_t * delta_t_surf
    delta_q = fn_q + en_q * delta_t_surf if cfg.evaporation else tri.delta_q
    return MixedLayerResult(
        t_surf=t_surf, delta_t=delta_t, delta_q=delta_q, delta_t_surf=delta_t_surf
    )
