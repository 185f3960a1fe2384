"""Dry convective adjustment (Schneider & Walker 2006).

Reference: src/atmos_param/dry_convection/dry_convection.f90. Lift a parcel
from the lowest level along a gamma-adiabat (gamma=1: dry adiabat); find the
first unstable run above the surface (CIN below it, CAPE within it, LZB at its
top); relax T toward the parcel profile shifted by a uniform increment that
conserves column enthalpy over [LZB..surface]; no convection if CIN > CAPE.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from isca_tpu.constants import Constants, EARTH


@dataclasses.dataclass(frozen=True)
class DryConvectionConfig:
    tau: float = 14400.0     # relaxation timescale (s)
    gamma: float = 1.0       # fraction of the dry-adiabatic lapse rate
    constants: Constants = EARTH


class DryConvectionResult(NamedTuple):
    dt_tg: jax.Array
    cape: jax.Array
    cin: jax.Array
    lzb: jax.Array
    lcl: jax.Array


def dry_convection(cfg: DryConvectionConfig, tg, p_full, p_half) -> DryConvectionResult:
    """Level-last (..., L)."""
    C = cfg.constants
    cons1 = C.rdgas / C.cp_air
    L = tg.shape[-1]

    # parcel profile: upward scan from the surface
    ratio = (p_full[..., :-1] / p_full[..., 1:]) ** cons1   # (..., L-1), level k vs k+1

    def lift(tp_below, r):
        tp = tp_below + cfg.gamma * (tp_below * r - tp_below)
        return tp, tp

    mv = lambda x: jnp.moveaxis(x[..., ::-1], -1, 0)
    _, tp_up = jax.lax.scan(lift, tg[..., -1], mv(ratio))
    tp_lift = jnp.concatenate(
        [jnp.moveaxis(tp_up, 0, -1)[..., ::-1], tg[..., -1:]], axis=-1
    )

    unstable = tp_lift > tg
    dlnp = jnp.log(p_half[..., 1:] / p_half[..., :-1])   # (..., L)

    # upward scan bookkeeping (k = L-2 .. 0)
    def book(carry, inp):
        cape, cin, lcl, lzb, in_cloud, done = carry
        k, uns, uns_below, tp_k, tg_k, dlnp_k = inp
        contrib = C.rdgas * (tp_k - tg_k) * dlnp_k
        start = uns & ~in_cloud & ~done
        cape = cape + jnp.where((in_cloud | start) & uns & ~done, contrib, 0.0)
        # LCL: first unstable level whose lower neighbor was stable
        lcl = jnp.where(start & ~uns_below, k.astype(lcl.dtype), lcl)
        cin = cin + jnp.where(~uns & ~in_cloud & ~done, -contrib, 0.0)
        # LZB: when the run ends (stable above an unstable run) or model top
        end = in_cloud & ~uns
        lzb = jnp.where(end & ~done, (k + 1).astype(lzb.dtype), lzb)
        lzb = jnp.where((in_cloud | start) & (k == 0) & ~done, jnp.zeros_like(lzb), lzb)
        done = done | end
        in_cloud = (in_cloud | start) & ~end
        return (cape, cin, lcl, lzb, in_cloud, done), None

    shape = tg.shape[:-1]
    ks = jnp.arange(L - 2, -1, -1)
    uns_seq = mv(unstable[..., :-1])
    uns_below_seq = mv(unstable[..., 1:])   # level k+1 (one below)
    carry0 = (
        jnp.zeros(shape, tg.dtype), jnp.zeros(shape, tg.dtype),
        jnp.full(shape, L - 1, jnp.int32), jnp.full(shape, L - 1, jnp.int32),
        jnp.zeros(shape, bool), jnp.zeros(shape, bool),
    )
    (cape, cin, lcl, lzb, in_cloud, done), _ = jax.lax.scan(
        book, carry0,
        (ks, uns_seq, uns_below_seq, mv(tp_lift[..., :-1]), mv(tg[..., :-1]),
         mv(dlnp[..., :-1])),
    )

    convecting = (cape > cin) & (lzb < L - 1)
    kidx = jnp.arange(L)
    in_layer = convecting[..., None] & (kidx >= lzb[..., None])
    # inside the layer: lifted profile where unstable, else environment
    tp = jnp.where(in_layer & unstable, tp_lift, tg)

    dp_half = p_half[..., 1:] - p_half[..., :-1]
    ener = jnp.sum(jnp.where(in_layer, dp_half * (tg - tp), 0.0), axis=-1)
    dp_tot = jnp.sum(jnp.where(in_layer, dp_half, 0.0), axis=-1)
    shift = ener / jnp.where(dp_tot > 0, dp_tot, 1.0)
    tp = jnp.where(in_layer, tp + shift[..., None], tp)

    dt_tg = (tp - tg) / cfg.tau
    return DryConvectionResult(dt_tg=dt_tg, cape=cape, cin=cin, lzb=lzb, lcl=lcl)
