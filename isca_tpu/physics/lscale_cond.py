"""Large-scale condensation.

Reference: src/atmos_param/lscale_cond/lscale_cond.F90:79-. Saturated points
condense to exactly saturation (with the latent-heat feedback denominator);
optional re-evaporation of falling precipitation into subsaturated layers below
(top-down scan); rain/snow split by coldT (or all rain with do_simple).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from isca_tpu.constants import Constants, EARTH
from isca_tpu.physics.sat_vapor_pres import SatVaporPres


@dataclasses.dataclass(frozen=True)
class LscaleCondConfig:
    hc: float = 1.0            # relative-humidity threshold for condensation
    do_evap: bool = False
    do_simple: bool = False    # constant L (no snow)
    constants: Constants = EARTH


class CondResult(NamedTuple):
    tdel: jax.Array
    qdel: jax.Array
    rain: jax.Array
    snow: jax.Array


class LscaleCond:
    def __init__(self, config: LscaleCondConfig, svp: SatVaporPres):
        self.config = config
        self.svp = svp
        self.C = config.constants

    def __call__(self, tin, qin, p_full, p_half, coldT=None) -> CondResult:
        """Level-last arrays (..., L)."""
        cfg, C = self.config, self.C
        qsat, dqsat = self.svp.qs_and_dqsdt(tin, p_full)
        qsat = qsat * cfg.hc
        dqsat = dqsat * cfg.hc
        if cfg.do_simple or coldT is None:
            hlcp = jnp.full(tin.shape[:-1], C.hlv / C.cp_air, tin.dtype)
        else:
            hlcp = jnp.where(coldT, C.hls / C.cp_air, C.hlv / C.cp_air)
        hl = hlcp[..., None]

        do_adjust = (qin - qsat) * qsat > 0.0
        qdel = jnp.where(do_adjust, (qsat - qin) / (1.0 + hl * dqsat), 0.0)
        tdel = -hl * qdel
        pmass = (p_half[..., 1:] - p_half[..., :-1]) / C.grav

        if cfg.do_evap:
            # top-down scan re-evaporating excess condensate into dry layers
            def body(exq, inp):
                qd, td, pm, qs, qi, dqs = inp
                exq = jnp.where(qd < 0.0, exq - qd * pm, exq)
                cond = (qd >= 0.0) & (exq > 0.0)
                exq_l = exq / pm
                deficit = jnp.clip((qs - qi) / (1.0 + hlcp * dqs), 0.0, exq_l)
                qd2 = jnp.where(cond, qd + deficit, qd)
                td2 = jnp.where(cond, td - deficit * hlcp, td)
                exq = jnp.where(cond, (exq_l - deficit) * pm, exq)
                return exq, (qd2, td2)

            mv = lambda x: jnp.moveaxis(x, -1, 0)
            _, (qdel_s, tdel_s) = jax.lax.scan(
                body, jnp.zeros(tin.shape[:-1], tin.dtype),
                (mv(qdel), mv(tdel), mv(pmass), mv(qsat), mv(qin), mv(dqsat)),
            )
            qdel = jnp.moveaxis(qdel_s, 0, -1)
            tdel = jnp.moveaxis(tdel_s, 0, -1)

        precip = jnp.maximum(-jnp.sum(pmass * qdel, axis=-1), 0.0)
        if cfg.do_simple or coldT is None:
            return CondResult(tdel, qdel, precip, jnp.zeros_like(precip))
        rain = jnp.where(coldT, 0.0, precip)
        snow = jnp.where(coldT, precip, 0.0)
        return CondResult(tdel, qdel, rain, snow)
