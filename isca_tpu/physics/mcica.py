"""McICA: Monte-Carlo Independent Column Approximation subcolumn generator.

Reference: src/atmos_param/rrtm_radiation/rrtmg_lw/gcm_model/src/
mcica_subcol_gen_lw.f90 (generate_stochastic_clouds, :196-523) and the SW
twin.  Each g-point gets one stochastic binary subcolumn: a uniform random
CDF per (subcolumn, column, layer) is transformed by the overlap assumption,
a subcolumn layer is cloudy where CDF >= 1 - cldfrac, and cloudy subcolumn
layers carry the full in-cloud condensate (cloud fraction 1), clear ones
zero.  The radiative transfer then runs per g-point with binary clouds —
cloud overlap becomes a sampling property instead of an overlap calculation.

Overlap options (icld): 1 = random, 2 = maximum-random (default), 3 = maximum
(mcica_subcol_gen_lw.f90:352-460).

Deviation: random numbers come from `jax.random` (threefry) with an explicit
key instead of the reference's KISSVEC/Mersenne-Twister seeded from the
bottom-layer pressure decimals (:332-341) — a deliberately platform-portable
choice; the reference's two RNG options don't reproduce each other either.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mcica_subcol(key, cldfrac, clwp, ciwp, nsubcol, overlap=2):
    """Generate stochastic binary subcolumns.

    cldfrac/clwp/ciwp: (..., L) grid-mean cloud fraction and IN-CLOUD water
    paths, layers TOP-DOWN (overlap walks top->bottom, matching the
    reference's ilev=2..nlay recursion on bottom-up arrays read in reverse —
    the max-random rule is symmetric in direction: adjacent cloudy layers
    share their random draw).

    Returns (cldf_mc, clwp_mc, ciwp_mc), each (..., L, nsubcol); cldf_mc is
    binary {0,1}.
    """
    cldf = jnp.where(cldfrac < 1.0e-20, 0.0, cldfrac)
    shape = cldf.shape + (nsubcol,)
    cdf = jax.random.uniform(key, shape, dtype=cldf.dtype)

    if overlap == 2:
        # maximum-random: reuse the neighbour's draw where it was cloudy,
        # else rescale this layer's draw into the clear part
        # (mcica_subcol_gen_lw.f90:404-414)
        def step(prev, x):
            cdf_i, cldf_prev = x
            new = jnp.where(prev > 1.0 - cldf_prev[..., None],
                            prev, cdf_i * (1.0 - cldf_prev[..., None]))
            return new, new

        mv = lambda a: jnp.moveaxis(a, -2, 0)
        cdf_l = mv(cdf)
        cldf_l = jnp.moveaxis(cldf, -1, 0)
        first = cdf_l[0]
        _, rest = jax.lax.scan(step, first, (cdf_l[1:], cldf_l[:-1]))
        cdf = jnp.moveaxis(jnp.concatenate([first[None], rest], axis=0),
                           0, -2)
    elif overlap == 3:
        # maximum: one draw per subcolumn for the whole column
        cdf = jnp.broadcast_to(cdf[..., :1, :], shape)
    # overlap == 1 (random): independent draws, nothing to do

    iscloudy = cdf >= 1.0 - cldf[..., None]
    cldf_mc = iscloudy.astype(cldf.dtype)
    clwp_mc = jnp.where(iscloudy, clwp[..., None], 0.0)
    ciwp_mc = jnp.where(iscloudy, ciwp[..., None], 0.0)
    return cldf_mc, clwp_mc, ciwp_mc
