"""K-profile boundary-layer diffusivity (Troen-Mahrt style, Frierson simple option).

Reference: src/atmos_param/diffusivity/diffusivity.F90:263-524. PBL depth from
the first level where the bulk Richardson number (stable / do_simple) exceeds
rich_crit_pbl, or where a buoyant-parcel virtual static energy is exceeded
(unstable), linearly interpolated; K(z) = vonkarm u* z / phi(z/L) in the inner
layer (z < frac_inner*h) and the cubic profile k_ref*(z/h_i)(1-(z-h_i)/(h-h_i))^2
above, zero above h.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from isca_tpu.constants import Constants, EARTH
from isca_tpu.physics.monin_obukhov import MOConfig, _phi_m, _phi_t


@dataclasses.dataclass(frozen=True)
class DiffusivityConfig:
    fixed_depth: bool = False
    depth_0: float = 5000.0
    frac_inner: float = 0.1
    rich_crit_pbl: float = 1.0
    znom: float = 1000.0
    do_simple: bool = False
    parcel_buoy: float = 8.5
    free_atm_diff: bool = False
    background_m: float = 0.0
    background_t: float = 0.0
    mo: MOConfig = MOConfig()
    constants: Constants = EARTH


def _mo_diff(cfg: MOConfig, z, u_star, b_star):
    """(k_m, k_t) = vonkarm u* z / phi_{m,t}(z/L)."""
    mo_inv = jnp.where(u_star > 0, -cfg.vonkarm * b_star / (u_star**2), 0.0)
    zeta = z * mo_inv
    k_m = cfg.vonkarm * u_star * z / _phi_m(cfg, zeta)
    k_t = cfg.vonkarm * u_star * z / _phi_t(cfg, zeta)
    return k_m, k_t


class DiffusivityResult(NamedTuple):
    k_m: jax.Array     # (..., L) at half levels below layer k (index k = interface k)
    k_t: jax.Array
    h_pbl: jax.Array


def diffusivity(
    cfg: DiffusivityConfig,
    t, q, u, v, p_full, p_half, z_full, z_half,
    u_star, b_star,
) -> DiffusivityResult:
    """Level-last (..., L); z_half (..., L+1). Returns K at half levels 0..L-1
    (K[...,k] sits at interface k, matching vert_diff's nu indexing)."""
    C = cfg.constants
    gcp = C.grav / C.cp_air
    d608 = C.rvgas / C.rdgas - 1.0
    small = 1.0e-4
    L = t.shape[-1]

    z_surf = z_half[..., -1:]
    z_full_ag = z_full - z_surf
    z_half_ag = z_half - z_surf
    if cfg.do_simple:
        svcp = t + gcp * z_full_ag
    else:
        svcp = t * (1.0 + d608 * q) + gcp * z_full_ag

    tbot = svcp[..., -1:]
    rich = z_full_ag * C.grav * (svcp - tbot) / tbot / (u * u + v * v + small)

    if cfg.fixed_depth:
        h = jnp.full(t.shape[:-1], cfg.depth_0, t.dtype)
    else:
        # --- stable / do_simple branch: first level above with rich > crit ---
        rc = cfg.rich_crit_pbl
        above = rich > rc                      # (..., L); scan upward = decreasing k
        # first k (from bottom going up) where rich > rc:
        # find max k with above True among k < L-1... use argmax over reversed axis
        rev = above[..., ::-1]                 # index 0 = bottom
        found = jnp.any(rev[..., 1:], axis=-1)
        idx_rev = jnp.argmax(rev[..., 1:], axis=-1) + 1   # first True going up
        k_hit = L - 1 - idx_rev                # level index of crossing
        z2 = jnp.take_along_axis(z_full_ag, k_hit[..., None], axis=-1)[..., 0]
        r2 = jnp.take_along_axis(rich, k_hit[..., None], axis=-1)[..., 0]
        z1 = jnp.take_along_axis(z_full_ag, jnp.minimum(k_hit + 1, L - 1)[..., None], axis=-1)[..., 0]
        r1 = jnp.take_along_axis(rich, jnp.minimum(k_hit + 1, L - 1)[..., None], axis=-1)[..., 0]
        h_stable = z2 + (z1 - z2) * (r2 - rc) / jnp.where(r2 != r1, r2 - r1, 1.0)
        h_stable = jnp.where(found, h_stable, z_full_ag[..., 0])

        # --- unstable branch: parcel virtual static energy exceedance ---
        h_inner_nom = cfg.frac_inner * cfg.znom
        ws_m, _ = _mo_diff(cfg.mo, jnp.broadcast_to(h_inner_nom, u_star.shape), u_star, b_star)
        ws = jnp.maximum(small, ws_m / cfg.mo.vonkarm / h_inner_nom)
        svp = tbot[..., 0] * (
            1.0 + cfg.parcel_buoy * u_star * b_star / (C.grav * ws)
        )
        above_u = svcp > svp[..., None]
        rev_u = above_u[..., ::-1]
        found_u = jnp.any(rev_u[..., 1:], axis=-1)
        idx_u = jnp.argmax(rev_u[..., 1:], axis=-1) + 1
        k_hit_u = L - 1 - idx_u
        z2u = jnp.take_along_axis(z_full_ag, k_hit_u[..., None], axis=-1)[..., 0]
        t2u = jnp.take_along_axis(svcp, k_hit_u[..., None], axis=-1)[..., 0]
        z1u = jnp.take_along_axis(z_full_ag, jnp.minimum(k_hit_u + 1, L - 1)[..., None], axis=-1)[..., 0]
        t1u = jnp.take_along_axis(svcp, jnp.minimum(k_hit_u + 1, L - 1)[..., None], axis=-1)[..., 0]
        h_unstable = z2u + (z1u - z2u) * (t2u - svp) / jnp.where(t2u != t1u, t2u - t1u, 1.0)
        h_unstable = jnp.where(found_u, h_unstable, z_full_ag[..., 0])

        use_stable = (b_star <= 0.0) | cfg.do_simple
        h = jnp.where(use_stable, h_stable, h_unstable)

    h_inner = cfg.frac_inner * h
    zm = z_half_ag[..., :-1]   # interfaces 0..L-1 (interface L = surface, K unused)
    k_m_ref, k_t_ref = _mo_diff(cfg.mo, h_inner, u_star, b_star)
    k_m_in, k_t_in = _mo_diff(cfg.mo, zm, u_star[..., None], b_star[..., None])

    hx = h[..., None]
    hi = h_inner[..., None]
    factor = (zm / hi) * (1.0 - (zm - hi) / jnp.where(hx > hi, hx - hi, 1.0)) ** 2
    outer = (zm >= hi) & (zm < hx)
    k_m = jnp.where(outer, k_m_ref[..., None] * factor, k_m_in)
    k_t = jnp.where(outer, k_t_ref[..., None] * factor, k_t_in)
    k_m = jnp.where(zm >= hx, 0.0, k_m)
    k_t = jnp.where(zm >= hx, 0.0, k_t)
    k_m = jnp.maximum(k_m, 0.0) + cfg.background_m
    k_t = jnp.maximum(k_t, 0.0) + cfg.background_t
    return DiffusivityResult(k_m=k_m, k_t=k_t, h_pbl=h)
