"""Stochastic vorticity stirring (Vallis et al. 2004, JAS 61, 264).

Reference: src/atmos_spectral_barotropic/stirring.F90. A red-noise (AR(1)) forcing
in a spectral annulus, optionally localized in physical space by a grid-space
round trip:

    a = sqrt(1 - exp(-2 dt/tau)),  b = exp(-dt/tau)
    eta_mn ~ amplitude * a * Uniform(-1,1) + i Uniform(-1,1)   on masked modes
    eta   <- analyze( localize(lat,lon) * synthesize(eta) ),  eta_00 = 0
    s     <- b * s + eta            (carried state; Vallis et al. eq. A.6)
    dt_vors += s

Differences from the reference: jax.random (threaded key) instead of Fortran
random_number with a saved seed.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from isca_tpu.spectral import transforms as tr


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["mask", "localize"],
    meta_fields=["amplitude", "a", "b", "do_localize"],
)
@dataclasses.dataclass(frozen=True)
class Stirring:
    mask: jax.Array        # (M+1, N+2) 1.0 on forced modes
    localize: jax.Array    # (nlat, nlon) spatial envelope
    amplitude: float
    a: float               # sqrt(1 - exp(-2 dt / decay_time))
    b: float               # exp(-dt / decay_time)
    do_localize: bool


def make_stirring(
    T: tr.SphericalTransforms,
    dt: float,
    amplitude: float = 0.0,
    decay_time: float = 2 * 86400.0,
    lat0: float = 45.0,
    lon0: float = 180.0,
    widthy: float = 12.0,
    widthx: float = 45.0,
    B: float = 0.0,
    do_localize: bool = True,
    n_total_forcing_max: int = 15,
    n_total_forcing_min: int = 9,
    zonal_forcing_min: int = 3,
) -> Stirring:
    M, N2 = T.num_fourier, T.num_spherical + 1
    m = np.arange(M + 1)[:, None]
    n = np.arange(N2)[None, :]
    mask = (m > zonal_forcing_min) & (n > n_total_forcing_min) & (n < n_total_forcing_max)
    mask &= n >= m
    # never force outside the prognostic triangle (keeps padded m rows zero)
    mask &= np.asarray(T.triangle) > 0.0

    lat_deg = np.degrees(np.asarray(T.lats))
    lon_deg = np.degrees(np.asarray(T.lons))
    xx = lon_deg - lon0
    xx = xx - 360.0 * np.rint(xx / 360.0)
    ampx = 1.0 + B * np.exp(-0.5 * (xx / widthx) ** 2)
    ampy = np.exp(-0.5 * ((lat_deg - lat0) / widthy) ** 2)
    localize = ampy[:, None] * ampx[None, :] if do_localize else np.ones((T.nlat, T.nlon))

    dtype = T.P.dtype
    return Stirring(
        mask=jnp.asarray(mask.astype(np.float64), dtype),
        localize=jnp.asarray(localize, dtype),
        amplitude=float(amplitude),
        a=float(np.sqrt(1.0 - np.exp(-2.0 * dt / decay_time))),
        b=float(np.exp(-dt / decay_time)),
        do_localize=bool(do_localize),
    )


def stir(
    S: Stirring,
    T: tr.SphericalTransforms,
    s_stir: jax.Array,
    key: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """One stirring update: returns (new s_stir, new key). Add s_stir to dt_vors."""
    if S.amplitude == 0.0:
        return s_stir, key
    key, sub = jax.random.split(key)
    shape = s_stir.shape
    ran = jax.random.uniform(sub, shape + (2,), dtype=T.P.dtype, minval=-1.0, maxval=1.0)
    new = S.amplitude * S.a * (ran[..., 0] + 1j * ran[..., 1]) * S.mask
    if S.do_localize:
        g = tr.spec_to_grid(T, new.astype(jnp.complex64 if T.P.dtype == jnp.float32 else jnp.complex128))
        new = tr.grid_to_spec(T, S.localize * g)
        new = new.at[0, 0].set(0.0)
    return S.b * s_stir + new, key
