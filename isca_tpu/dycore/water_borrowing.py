"""Hole filling for negative spectral moisture (water borrowing).

Reference: src/atmos_spectral/model/water_borrowing.F90 — negative points
borrow mass-weighted water from their 4 neighbors (E/W/up/down), rescaling the
neighbors so column water is conserved. The reference sweeps each latitude
row sequentially with alternating direction; here a fixed number of parallel
Jacobi-style passes is used instead (each pass fills holes simultaneously
from the *pre-pass* neighbor values) — same conservation property, order-free
and TPU-parallel; trajectories differ from the sequential sweep at the level
of the hole-filling correction itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def water_borrowing(dt_qg, qg, p_half, delta_t, passes: int = 2):
    """Add hole-filling corrections to dt_qg (level-first (L, lat, lon)).

    qg: the grid moisture being checked (reference passes `previous`).
    """
    dp = p_half[1:] - p_half[:-1]

    def one_pass(q, _):
        w = q * dp  # mass-weighted water
        w_e = jnp.roll(w, -1, axis=-1)
        w_w = jnp.roll(w, 1, axis=-1)
        w_up = jnp.concatenate([jnp.zeros_like(w[:1]), w[:-1]], axis=0)
        w_dn = jnp.concatenate([w[1:], jnp.zeros_like(w[:1])], axis=0)
        neigh = w_e + w_w + w_up + w_dn
        total = neigh + w
        fill = (w < 0.0) & (total > 0.0)
        ratio = jnp.where(fill, total / jnp.where(neigh != 0, neigh, 1.0), 1.0)
        # zero the hole; rescale this cell's contribution as a neighbor donor
        q_new = jnp.where(fill, 0.0, q)
        # each donor is scaled by the product of ratios of adjacent holes
        scale = jnp.ones_like(q)
        for shifted in (
            jnp.roll(ratio, 1, axis=-1), jnp.roll(ratio, -1, axis=-1),
            jnp.concatenate([ratio[1:], jnp.ones_like(ratio[:1])], axis=0),
            jnp.concatenate([jnp.ones_like(ratio[:1]), ratio[:-1]], axis=0),
        ):
            scale = scale * shifted
        q_new = jnp.where(~fill, q_new * scale, q_new)
        return q_new, None

    q_filled, _ = jax.lax.scan(one_pass, qg, None, length=passes)
    return dt_qg + (q_filled - qg) / delta_t
