"""Hybrid-coordinate pressure variables and hydrostatic geopotential.

Reference: src/atmos_spectral/model/press_and_geopot.F90:87-467. Written against a
generic array module `xp` (numpy or jax.numpy) so the identical discretization is
used both at init time (float64 host, e.g. for the semi-implicit reference-state
linearization) and inside jitted step functions.

Level convention: arrays are (..., lev) with index 0 = model top. Half-level
arrays have num_levels+1 entries. Fields are stored level-first in the dycore
((lev, lat, lon)); these functions operate on the *trailing* axis, so callers
move the level axis last (or pass (lev,)-shaped reference columns directly).

Simmons & Burridge (1981) full-level definition:
    alpha_k     = 1 - p_half(k) * (ln p_half(k+1) - ln p_half(k)) / dp_k
    ln p_full_k = ln p_half(k+1) - alpha_k
with the special case of a p=0 model top: ln p_full(0) = ln p_half(1) - 1.
"""

from __future__ import annotations

import numpy as np


def pressure_variables(xp, pk, bk, surface_p, top_is_zero: bool,
                       option: str = "simmons_and_burridge"):
    """(p_half, ln_p_half, p_full, ln_p_full) from surface pressure.

    pk, bk: (L+1,) coefficient arrays; surface_p: any shape S.
    Returns arrays of shape S + (L+1,) and S + (L,).

    `option` is vert_difference_option (press_and_geopot.F90:167-221):
    'simmons_and_burridge' (log-pressure alpha weighting) or 'mcm'
    (Manabe Climate Model: full level = arithmetic mean of half pressures).
    """
    ps = xp.asarray(surface_p)[..., None]
    p_half = pk + bk * ps
    if top_is_zero:
        # avoid log(0) at the top half level; value unused (set to 0)
        safe = xp.concatenate([xp.ones_like(p_half[..., :1]), p_half[..., 1:]], axis=-1)
        ln_p_half = xp.log(safe)
        ln_p_half = xp.concatenate(
            [xp.zeros_like(ln_p_half[..., :1]), ln_p_half[..., 1:]], axis=-1
        )
    else:
        ln_p_half = xp.log(p_half)
    if option == "mcm":
        # press_and_geopot.F90:196-210
        p_full = 0.5 * (p_half[..., 1:] + p_half[..., :-1])
        ln_p_full = xp.log(p_full)
        return p_half, ln_p_half, p_full, ln_p_full
    if option != "simmons_and_burridge":
        raise ValueError(f"invalid vert_difference_option {option!r}")
    dp = p_half[..., 1:] - p_half[..., :-1]
    # ln p(k+1) - ln p(k) computed as log1p(dp/p(k)): the difference of two
    # O(10) logs cancels to O(dp/p), and on TPU the log approximation's
    # ~1e-5 absolute error would be amplified ~p/dp times through alpha
    # (negative layer thicknesses for thin layers; observed with the
    # Frierson ladder).  log1p keeps the error at the ulp of the difference.
    safe_lower = xp.where(p_half[..., :-1] > 0.0, p_half[..., :-1], 1.0)
    dlnp = xp.log1p(dp / safe_lower)
    alpha = 1.0 - p_half[..., :-1] * dlnp / dp
    ln_p_full = ln_p_half[..., 1:] - alpha
    if top_is_zero:
        # ln_top_level_factor = -1 (press_and_geopot.F90): ln p_full(top) = ln p_half(1) - 1
        top = ln_p_half[..., 1:2] - 1.0
        ln_p_full = xp.concatenate([top, ln_p_full[..., 1:]], axis=-1)
    p_full = xp.exp(ln_p_full)
    return p_half, ln_p_half, p_full, ln_p_full


def compute_geopotential(xp, rdgas, virtual_t, ln_p_half, ln_p_full, surf_geopotential,
                         top_is_zero: bool, p_half=None):
    """Hydrostatic integration (press_and_geopot.F90:314-359).

    virtual_t: (..., L); ln_p_half: (..., L+1); ln_p_full: (..., L);
    surf_geopotential: (...). Returns (geopot_full (..., L), geopot_half (..., L+1)).
    geopot_half[..., 0] is 0 for a p=0 top (infinite height, unused).

    Pass p_half to compute the half-level log-pressure increments
    cancellation-free via log1p (see pressure_variables) — required for
    accurate layer thicknesses on TPU, where the log approximation's
    absolute error is comparable to the increment for thin layers.
    """
    if p_half is not None:
        dp = p_half[..., 1:] - p_half[..., :-1]
        safe_lower = xp.where(p_half[..., :-1] > 0.0, p_half[..., :-1], 1.0)
        dlnp = xp.log1p(dp / safe_lower)
    else:
        dlnp = ln_p_half[..., 1:] - ln_p_half[..., :-1]      # (..., L)
    incr = rdgas * virtual_t * dlnp
    if top_is_zero:
        incr = xp.concatenate([xp.zeros_like(incr[..., :1]), incr[..., 1:]], axis=-1)
    # geopot_half(k) = surf + sum_{j>k} incr_j  (cumulative from the bottom up)
    rev_csum = xp.cumsum(incr[..., ::-1], axis=-1)[..., ::-1]
    geopot_half = xp.concatenate(
        [rev_csum, xp.zeros_like(rev_csum[..., :1])], axis=-1
    ) + surf_geopotential[..., None]
    geopot_full = geopot_half[..., 1:] + rdgas * virtual_t * (ln_p_half[..., 1:] - ln_p_full)
    return geopot_full, geopot_half


def virtual_temperature(t, q, zvir):
    """T_v = T (1 + (rvgas/rdgas - 1) q)."""
    return t * (1.0 + zvir * q)
