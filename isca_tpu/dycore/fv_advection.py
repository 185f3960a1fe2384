"""Finite-volume (van Leer) horizontal advection for grid tracers on the A-grid.

Reference: src/atmos_spectral/model/fv_advection.F90 — a Lin-Rood-style
dimension-split scheme: half-step semi-Lagrangian cross-terms, C-grid
interpolated winds, monotone-limited van Leer fluxes, semi-Lagrangian
integer-CFL extension in longitude near the poles, antipodal polar halos.

TPU-native: the reference's yhalo=2 `mpp_update_domains` exchanges become
jnp.roll / slicing (XLA inserts ppermute when the latitude axis is sharded);
the per-point integer-flux loops become prefix-sum + gather.

Arrays are (..., lat, lon), latitude south->north (index 0 = southernmost).
Everything here is in the `advective` form used by update_tracers
(dq_dt from a_grid_horiz_advection includes +q*div so the tendency is -V.grad q).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from isca_tpu.spectral.transforms import SphericalTransforms


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["c", "cc", "dy", "dyy", "dy_plus", "dy_minus"],
    meta_fields=["nx", "ny", "dx", "monotone"],
)
@dataclasses.dataclass(frozen=True)
class FVGeometry:
    c: jax.Array         # (ny,) cos(lat) at box centers (midpoints of boundaries)
    cc: jax.Array        # (ny+1,) cos(lat) at box boundaries
    dy: jax.Array        # (ny+4,) box widths [m], indexed j-2..ny+1 (halo-extended)
    dyy: jax.Array       # (ny+1,) distance between full points [m]
    dy_plus: jax.Array   # (ny+2,) dy(j)/(dy(j)+dy(j+1)), rows j-1..ny
    dy_minus: jax.Array  # (ny+2,) dy(j)/(dy(j-1)+dy(j)), rows j-1..ny
    nx: int
    ny: int
    dx: float            # lon grid spacing at the equator [m]
    monotone: bool


def make_fv_geometry(T: SphericalTransforms, monotone: bool = True) -> FVGeometry:
    """Gaussian-box boundaries: sin(yy_j) partitions [-1,1] by the weights."""
    ny, nx = T.nlat, T.nlon
    w = np.asarray(T.wts, np.float64)
    mu_b = -1.0 + np.concatenate([[0.0], np.cumsum(w)])
    mu_b = np.clip(mu_b, -1.0, 1.0)
    yy = np.arcsin(mu_b)                      # (ny+1,) boundary latitudes
    y = 0.5 * (yy[1:] + yy[:-1])              # box centers (reference convention)
    c = np.cos(y)
    cc = np.cos(yy)
    a = T.radius
    dy_core = (yy[1:] - yy[:-1]) * a          # (ny,)
    # halo-extended dy, reference: dy(-1)=dy(2), dy(0)=dy(1), dy(ny+1)=dy(ny), dy(ny+2)=dy(ny-1)
    dy = np.concatenate([[dy_core[1], dy_core[0]], dy_core, [dy_core[-1], dy_core[-2]]])
    dyy = np.empty(ny + 1)
    dyy[1:ny] = (y[1:] - y[:-1]) * a
    dyy[0] = 2 * (y[0] - yy[0]) * a
    dyy[ny] = 2 * (yy[ny] - y[ny - 1]) * a
    # dy_plus/minus over rows j-1..ny (ny+2 values); dy index offset: dy[k+2] = dy_core[k]
    jj = np.arange(-1, ny + 1)
    dy_plus = dy[jj + 2] / (dy[jj + 2] + dy[jj + 3])
    dy_minus = dy[jj + 2] / (dy[jj + 1] + dy[jj + 2])
    dtype = T.P.dtype
    f = lambda x: jnp.asarray(x, dtype)
    return FVGeometry(
        c=f(c), cc=f(cc), dy=f(dy), dyy=f(dyy),
        dy_plus=f(dy_plus), dy_minus=f(dy_minus),
        nx=nx, ny=ny, dx=float(2.0 * np.pi * a / nx), monotone=bool(monotone),
    )


def _antipode(x):
    """Value across the pole: shift longitude by 180 degrees."""
    return jnp.roll(x, x.shape[-1] // 2, axis=-1)


def _halo_y(q, sign=1.0):
    """Append 2 antipodal halo rows on each side of the lat axis (axis -2)."""
    south = sign * _antipode(q[..., 1::-1, :])     # rows 1,0 reversed -> j=-2,-1
    north = sign * _antipode(q[..., :-3:-1, :])    # rows ny-1, ny-2 -> j=ny, ny+1
    return jnp.concatenate([south, q, north], axis=-2)


def _limit_slope(slope, q, qm, qp, monotone):
    if monotone:
        q_min = jnp.minimum(jnp.minimum(qm, q), qp)
        q_max = jnp.maximum(jnp.maximum(qm, q), qp)
        lim = jnp.minimum(2.0 * (q - q_min), 2.0 * (q_max - q))
    else:
        lim = 2.0 * q
    return jnp.sign(slope) * jnp.minimum(jnp.abs(slope), lim)


def _slope_x(q, monotone):
    qm = jnp.roll(q, 1, axis=-1)
    qp = jnp.roll(q, -1, axis=-1)
    slope = 0.5 * (qp - qm)
    return _limit_slope(slope, q, qm, qp, monotone)


def _gather_x(q, idx):
    """q[..., idx] with idx of same shape as q along the last axis."""
    return jnp.take_along_axis(q, idx, axis=-1)


_FORCE_NATIVE_GATHER = False    # tests flip this to diff the two paths


def _gather_x_multi(arrs, idx):
    """Gather several (..., nx) arrays at the same per-point indices.

    On TPU a data-dependent gather along the minor axis runs on the scalar
    core (~2.5 ms for a T42L25 field); expressing it as a one-hot matmul
    puts it on the MXU instead (~0.5 ms) and is exact - each one-hot row has
    a single unit entry, so the contraction selects values bit-for-bit.
    float64 (CPU tests) keeps the native gather.
    """
    if _FORCE_NATIVE_GATHER or arrs[0].dtype == jnp.float64:
        return [_gather_x(a, idx) for a in arrs]
    nx = arrs[0].shape[-1]
    onehot = (idx[..., :, None] == jax.lax.broadcasted_iota(
        jnp.int32, idx.shape + (nx,), idx.ndim)).astype(arrs[0].dtype)
    stacked = jnp.stack(arrs, axis=-1)               # (..., nx, C)
    out = jnp.einsum("...xy,...yc->...xc", onehot, stacked,
                     precision=jax.lax.Precision.HIGHEST)
    return [out[..., i] for i in range(len(arrs))]


def a_grid_horiz_advection(G: FVGeometry, ua, va, q, dt, flux_form: bool = False):
    """dq_dt from one horizontal van Leer advection step (reference semantics).

    ua, va, q: (..., lat, lon). Returns the tendency (advective form unless
    flux_form: the reference adds +q*div to convert flux->advective).
    """
    nx, ny = G.nx, G.ny
    c = G.c[:, None]                 # (ny, 1)
    dy_c = G.dy[2:-2][:, None]       # (ny, 1) core box widths

    # ---- C-grid winds ----
    uc = 0.5 * (jnp.roll(ua, 1, axis=-1) + ua)               # at left interfaces
    vx = _halo_y(va, sign=-1.0)[..., 1:-1, :]                # rows -1..ny
    vc = 0.5 * (vx[..., :-1, :] + vx[..., 1:, :])            # (.., ny+1, lon) interfaces

    out = jnp.zeros_like(q)
    if not flux_form:
        ccb = G.cc[:, None]
        div = (vc[..., 1:, :] * ccb[1:] - vc[..., :-1, :] * ccb[:-1]) / (c * dy_c)
        div = div + (jnp.roll(uc, -1, axis=-1) - uc) / (c * G.dx)
        out = out + q * div

    # ---- half-step cross terms ----
    qx = _halo_y(q)                                          # rows -2..ny+1
    q1 = q + _semi_x(G, ua, q, 0.5 * dt)                     # for the y fluxes
    q2 = q + _semi_y(G, va, qx, 0.5 * dt)                    # for the x fluxes
    q1x = _halo_y(q1)

    out = out + _vanleer_x(G, uc, q2, dt)
    out = out + _vanleer_y(G, vc, q1x, dt)
    return out


def _semi_x(G, ua, q, dt):
    """Half-step semi-Lagrangian displacement in longitude (fv_advection semi_x)."""
    b = ua * dt / (G.dx * G.c[:, None])
    fb = jnp.floor(b)
    bb = b - fb
    i = jax.lax.broadcasted_iota(jnp.int32, q.shape, q.ndim - 1)
    left = jnp.mod(i - 1 - fb.astype(jnp.int32), G.nx)
    # q[left+1 mod nx] == roll(q, -1)[left]: one gather pass serves both
    q_left, q_right = _gather_x_multi([q, jnp.roll(q, -1, axis=-1)], left)
    return bb * q_left + (1.0 - bb) * q_right - q


def _semi_y(G, va, qx, dt):
    """Half-step upwind displacement in latitude; qx has 2 halo rows each side."""
    ny = G.ny
    qc = qx[..., 2:-2, :]
    qm = qx[..., 1:-3, :]
    qp = qx[..., 3:-1, :]
    dyy_j = G.dyy[:-1][:, None]     # dyy(j), rows 0..ny-1
    dyy_jp = G.dyy[1:][:, None]     # dyy(j+1)
    pos = va * dt * (qm - qc) / dyy_j
    neg = va * dt * (qc - qp) / dyy_jp
    return jnp.where(va >= 0.0, pos, neg)


def _vanleer_x(G, uc, q, dt):
    """Monotone van Leer flux in longitude with integer-CFL extension."""
    nx = G.nx
    b = uc * dt / (G.dx * G.c[:, None])        # Courant number at interfaces
    ii_int = jnp.trunc(b)
    frac = b - ii_int
    # integer part: flux_int(k) = sum_{j=k-ii}^{k-1} q_j = Pext(k) - Pext(k-ii)
    csum = jnp.cumsum(q, axis=-1)
    total = csum[..., -1:]
    P_excl = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum[..., :-1]], axis=-1)

    k = jax.lax.broadcasted_iota(jnp.int32, q.shape, q.ndim - 1).astype(q.dtype)
    # pext(k) is the identity gather (0 <= k < nx): P_excl itself.
    idx_src = (k - ii_int).astype(jnp.int32)
    wraps = jnp.floor_divide(idx_src, nx)
    idx_mod = idx_src - wraps * nx
    (p_src,) = _gather_x_multi([P_excl], idx_mod)
    flux_int = P_excl - (p_src + wraps.astype(q.dtype) * total)
    # fractional part from the donor cell k - 1 - floor(b)
    donor = jnp.mod(
        (k - 1.0 - jnp.floor(b)).astype(jnp.int32), nx
    )
    s = _slope_x(q, G.monotone)
    qq, ss = _gather_x_multi([q, s], donor)
    sgn = jnp.where(frac >= 0.0, 1.0, -1.0)
    flux = flux_int + frac * (qq + 0.5 * ss * (sgn - frac))
    # dq_dt = -(flux(k+1) - flux(k))/dt  with periodic wrap
    return -(jnp.roll(flux, -1, axis=-1) - flux) / dt


def _vanleer_y(G, vc, qx, dt):
    """Monotone van Leer flux in latitude; qx has 2 antipodal halo rows each side."""
    ny = G.ny
    # slopes on rows -1..ny (ny+2 rows)
    qc = qx[..., 1:-1, :]      # rows -1..ny
    qm = qx[..., :-2, :]       # rows -2..ny-1
    qp = qx[..., 2:, :]        # rows 0..ny+1
    slope = (qp - qc) * G.dy_plus[:, None] + (qc - qm) * G.dy_minus[:, None]
    s = _limit_slope(slope, qc, qm, qp, G.monotone)   # rows -1..ny

    dy_ext = G.dy[1:-1][:, None]        # rows -1..ny (ny+2,)
    dtdy = dt / dy_ext
    # flux at interfaces j = 0..ny: donor row j-1 (vc>=0) or j (vc<0)
    q_dn = qx[..., 1:-2, :]    # rows -1..ny-1 (donor below interface)
    q_up = qx[..., 2:-1, :]    # rows 0..ny
    s_dn = s[..., :-1, :]
    s_up = s[..., 1:, :]
    dtdy_dn = dtdy[:-1]
    dtdy_up = dtdy[1:]
    ccb = G.cc[:, None]
    flux_pos = vc * ccb * (q_dn + 0.5 * s_dn * (1.0 - dtdy_dn * vc))
    flux_neg = vc * ccb * (q_up - 0.5 * s_up * (1.0 + dtdy_up * vc))
    flux = jnp.where(vc >= 0.0, flux_pos, flux_neg)
    # polar boundaries: zero flux
    zero = jnp.zeros_like(flux[..., :1, :])
    flux = jnp.concatenate([zero, flux[..., 1:-1, :], zero], axis=-2)
    dyc = 1.0 / (G.dy[2:-2][:, None] * G.c[:, None])
    return -dyc * (flux[..., 1:, :] - flux[..., :-1, :])
