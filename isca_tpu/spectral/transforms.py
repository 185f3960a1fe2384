"""Spherical-harmonic transforms and spectral operators, TPU-first.

This is the TPU-native replacement for the reference's transform machinery
(`src/atmos_spectral/tools/transforms.F90`, `spherical_fourier.F90`, `spherical.F90`,
`grid_fourier.F90`, `src/shared/fft/`). Design differences from the Fortran:

* The Legendre analysis/synthesis are dense batched einsums over precomputed
  Pbar / Pbar*w tables -> they run on the MXU. The reference's (m,n,j,k) triple loops
  (spherical_fourier.F90:177-339) are the same contractions expressed scalar-wise.
* The longitude Fourier stage defaults to a dense real-DFT einsum (MXU-native,
  layout/sharding-safe; at GCM grid sizes nlon <= 640 the O(n^2) matmul on the
  MXU beats calling out to an FFT and fuses with neighbors). `jnp.fft.rfft`
  remains available via fourier_method="fft".
* There is no explicit domain decomposition or transpose here: the same code runs
  single-device or under jit with sharded inputs, in which case XLA inserts the
  lat<->m all-to-alls that correspond to the reference's `transpose_fourier`
  ring exchanges (transforms.F90:970-1056).  See isca_tpu.parallel.
* Spectral storage is a dense complex array indexed [..., m, n] with m = 0..M
  (num_fourier) and *total* wavenumber n = 0..N+1 (num_spherical). Entries with
  n < m are structurally zero. The extra n = N+1 row exists, as in the reference,
  so that wind synthesis from (vor, div) is exact (the n+-1 recurrence overflows
  one row past the triangular truncation).

Normalization: see isca_tpu.spectral.gauss. Global area mean of a field equals the
real part of its (m=0, n=0) coefficient.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec

from . import gauss

try:  # jax >= 0.4.35 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

# Standard triangular truncations -> (nlon, nlat), as in the reference's RESOLUTIONS
# table (src/extra/python/isca/experiment.py:29-56).
RESOLUTIONS: dict[str, tuple[int, int, int]] = {
    "T21": (21, 64, 32),
    "T42": (42, 128, 64),
    "T85": (85, 256, 128),
    "T170": (170, 512, 256),
    "T213": (213, 640, 320),
}


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "wts",
        "sinlat",
        "coslat",
        "lats",
        "lons",
        "P",
        "Pw",
        "eps",
        "mvec",
        "nn1",
        "inv_nn1",
        "triangle",
        "eigenvalues",
        "uv_im",
        "uv_cm",
        "uv_cp",
        "vd_im",
        "vd_dn",
        "vd_up",
        "cdl_up",
        "cdl_dn",
        "inv_eig",
        "dft_cos_f",
        "dft_sin_f",
        "dft_cos_i",
        "dft_sin_i",
        "dft_ana",
        "dft_syn",
    ],
    meta_fields=["truncation", "num_fourier", "num_fourier_true", "num_spherical",
                 "nlon", "nlat", "radius", "fourier_method", "precision", "mesh",
                 "overlap_chunks"],
)
@dataclasses.dataclass(frozen=True)
class SphericalTransforms:
    """Precomputed transform tables for one resolution, as a pytree of jnp arrays."""

    truncation: int       # T (e.g. 42)
    num_fourier: int      # m rows - 1 (>= true M when the m axis is padded)
    num_fourier_true: int # true M: largest retained zonal-wavenumber index
    num_spherical: int    # N+1 rows of total wavenumber retained for winds
    nlon: int
    nlat: int
    radius: float

    wts: jax.Array        # (nlat,) Gaussian weights, sum = 2
    sinlat: jax.Array     # (nlat,) mu, ascending (south -> north)
    coslat: jax.Array     # (nlat,)
    lats: jax.Array       # (nlat,) radians
    lons: jax.Array       # (nlon,) radians
    P: jax.Array          # (nlat, M+1, N+2) Pbar_n^m(mu_j)
    Pw: jax.Array         # (nlat, M+1, N+2) Pbar * w_j / 2 (analysis table)
    eps: jax.Array        # (M+1, N+3) recurrence coefficients
    mvec: jax.Array       # (M+1,) float m
    nn1: jax.Array        # (N+2,) float n(n+1)
    inv_nn1: jax.Array    # (N+2,) 1/(n(n+1)), 0 at n=0
    triangle: jax.Array   # (M+1, N+2) mask: 1 where m <= n <= T (prognostic triangle)
    eigenvalues: jax.Array  # (N+2,) -n(n+1)/a^2 (Laplacian eigenvalues)
    # precomputed operator coefficient tables (host-built, see make_transforms):
    uv_im: jax.Array      # (M+1, N+2)  m/(n(n+1)) for wind synthesis (times -i)
    uv_cm: jax.Array      # (M+1, N+2) -eps(m,n)/n            (times x_{n-1})
    uv_cp: jax.Array      # (M+1, N+2)  eps(m,n+1)/(n+1)      (times x_{n+1})
    vd_im: jax.Array      # (M+1, N+2)  m                     (times i)
    vd_dn: jax.Array      # (M+1, N+2)  n*eps(m,n+1)          (times x_{n+1})
    vd_up: jax.Array      # (M+1, N+2)  (n+1)*eps(m,n)        (times x_{n-1})
    cdl_up: jax.Array     # (M+1, N+2) -(n-1)*eps(m,n)        (times x_{n-1})
    cdl_dn: jax.Array     # (M+1, N+2)  (n+2)*eps(m,n+1)      (times x_{n+1})
    inv_eig: jax.Array    # (N+2,) -a^2/(n(n+1)), 0 at n=0 (inverse Laplacian)
    # real DFT tables (complex constants cannot be embedded on all backends and
    # real matmuls are what the MXU natively runs):
    dft_cos_f: jax.Array  # (nlon, M+1) cos(m lam)/nlon   (analysis, real part)
    dft_sin_f: jax.Array  # (nlon, M+1) -sin(m lam)/nlon  (analysis, imag part)
    dft_cos_i: jax.Array  # (M+1, nlon) w_m cos(m lam)    (synthesis; w_0=1 else 2)
    dft_sin_i: jax.Array  # (M+1, nlon) -w_m sin(m lam)
    # merged [cos|sin] tables: real+imag parts ride ONE matmul (measured ~10%
    # faster than two half-width matmuls on the MXU)
    dft_ana: jax.Array    # (nlon, 2(M+1)) = [dft_cos_f | dft_sin_f]
    dft_syn: jax.Array    # (2(M+1), nlon) = [dft_cos_i ; dft_sin_i]
    fourier_method: str = "dft"
    # MXU matmul precision for every transform einsum.  TPU matmuls default
    # to bf16 inputs; the spectral transforms carry the full climate state
    # each step, so bf16 noise (~4e-3 relative) corrupts the trajectory and
    # the global fixers.  "highest" = f32 accumulation (6-pass on MXU).
    precision: str = "highest"
    # jax.sharding.Mesh with axis "x": selects the explicit shard_map
    # transpose-method transform path (lat-sharded grid <-> m-sharded
    # spectral via lax.all_to_all), the TPU analogue of the reference's ring
    # mpp_transmit transposes (transforms.F90:970-1056). None = single-device
    # dense path (also correct under GSPMD with sharded inputs).
    mesh: Any = None
    # Comm/compute overlap for the shard_map path (SURVEY hard part #3,
    # mirroring what the reference's per-field ring transposes cannot do,
    # transforms.F90:970-1056): split the leading batched-field axis into
    # this many independent DFT -> all_to_all -> Legendre chains so XLA's
    # async-collective scheduler can run chunk k's all_to_all while chunk
    # k-1's Legendre einsum occupies the MXU. 1 = monolithic (one transpose
    # per transform). Only the mesh path is affected.
    overlap_chunks: int = 1

    @property
    def prec(self):
        return jax.lax.Precision(self.precision.lower())

    @property
    def spec_shape(self) -> tuple[int, int]:
        return (self.num_fourier + 1, self.num_spherical + 1)

    @property
    def grid_shape(self) -> tuple[int, int]:
        return (self.nlat, self.nlon)

    @property
    def cdtype(self):
        return jnp.complex64 if self.P.dtype == jnp.float32 else jnp.complex128


def make_transforms(
    truncation: int | str,
    nlon: int | None = None,
    nlat: int | None = None,
    radius: float = 6371.0e3,
    dtype=jnp.float32,
    fourier_method: str = "dft",
    make_symmetric: bool = False,
    precision: str = "highest",
    truncation_shape: str = "triangular",
    fourier_inc: int = 1,
    pad_m_to: int | None = None,
    mesh: Any = None,
    overlap_chunks: int = 2,
) -> SphericalTransforms:
    """Build transform tables for a triangular or rhomboidal truncation.

    Default grid sizes follow the reference's quadratic-dealiasing table
    (nlon >= 3T+1, nlat = nlon/2).  make_symmetric zeroes all m > 0 modes in
    the prognostic triangle — the reference's zonally-symmetric model option
    (spectral_dynamics_nml make_symmetric, spherical.F90:185).

    truncation_shape='rhomboidal' retains l = n - m = 0..T for every zonal
    wavenumber (reference triang_trunc=.false.: the (m, l) parallelogram is
    kept whole, rhomboidal_truncation only zeroes the overflow row,
    spherical.F90:603-644; num_total_wavenumbers = T + fourier_inc*M,
    spectral_dynamics.F90:430-434).

    fourier_inc keeps only zonal wavenumbers that are multiples of
    fourier_inc (sector/symmetric models, spherical.F90:182
    fourier_wave = m*fourier_inc).  Under triangular truncation the retained
    set is still bounded by total wavenumber n <= T (spherical.F90:184), so
    m rows beyond T are dropped entirely rather than carried fully masked.

    pad_m_to pads the m axis with structurally-zero rows so the m count is a
    multiple of pad_m_to (defaults to mesh size when mesh is given, else 1).
    This makes spectral arrays shardable over any device count at STANDARD
    truncations (M+1 = 43/86/171 at T42/T85/T170 divides nothing) — the
    TPU-native answer to the reference's block-m spec_mpp decomposition
    (spec_mpp.F90:78-80). Because the Legendre/DFT stages are DENSE einsums
    over (m, n), equal m blocks already load-balance exactly (the reference's
    folded-m pairing compensates for its TRIANGLE-aware loops; dense MXU
    tiles have no such imbalance), so padding, not folding, is the right
    packing here. Padded rows carry exact zeros end-to-end: their analysis /
    synthesis table entries, operator coefficients, and triangle mask are all
    zero. FLOP overhead at 8 devices: T42 +11%, T85 +2.3%, T170 +2.9% on the
    transform stages only.

    mesh (jax.sharding.Mesh, axis "x") switches grid_to_spec / spec_to_grid
    to the explicit shard_map transpose path. overlap_chunks (mesh path
    only) splits each transform's batched leading axis into that many
    independent transpose chains so the all_to_all of one chunk overlaps
    the Legendre compute of the previous one (see SphericalTransforms).
    """
    if isinstance(truncation, str):
        truncation, d_nlon, d_nlat = RESOLUTIONS[truncation]
        nlon = nlon or d_nlon
        nlat = nlat or d_nlat

    if fourier_inc != 1 and fourier_method == "fft":
        raise ValueError("fourier_inc > 1 requires the dense 'dft' stage")

    if truncation_shape == "rhomboidal":
        m_values = fourier_inc * np.arange(truncation + 1)
        m_max = int(m_values[-1])
        # one extra row past n = m_max + T for exact wind synthesis
        N = m_max + truncation + 1
    elif truncation_shape == "triangular":
        m_values = fourier_inc * np.arange(truncation // fourier_inc + 1)
        m_max = int(m_values[-1])
        N = truncation + 1
    else:
        raise ValueError(f"invalid truncation_shape {truncation_shape!r}")
    M = len(m_values) - 1

    if nlon is None:
        nlon = int(2 ** np.ceil(np.log2(3 * m_max + 1)))
    if nlat is None:
        nlat = nlon // 2

    mu, w = gauss.gauss_legendre(nlat)
    P = gauss.legendre_table(mu, m_max, N)[:, m_values, :]
    eps = gauss.epsilon_table(m_max, N + 1)[m_values, :]  # (M+1, N+3)

    nvals = np.arange(N + 1, dtype=np.float64)
    nn1 = nvals * (nvals + 1.0)
    inv_nn1 = np.where(nn1 > 0, 1.0 / np.where(nn1 == 0, 1.0, nn1), 0.0)

    mgrid = m_values[:, None]
    ngrid = np.arange(N + 1)[None, :]
    if truncation_shape == "rhomboidal":
        triangle = ((ngrid >= mgrid)
                    & (ngrid - mgrid <= truncation)).astype(np.float64)
    else:
        triangle = ((ngrid >= mgrid) & (ngrid <= truncation)).astype(np.float64)
    if make_symmetric:
        triangle[1:, :] = 0.0   # axisymmetric: zonal-mean modes only

    # operator coefficient tables (all float64 on host, cast once)
    mv = np.asarray(m_values, np.float64)[:, None]
    nf = nvals[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_n = np.where(nf > 0, 1.0 / np.where(nf == 0, 1.0, nf), 0.0)
    inv_np1 = 1.0 / (nf + 1.0)
    eps_n = eps[:, : N + 1]
    eps_np1 = eps[:, 1 : N + 2]
    uv_im = mv * inv_nn1[None, :]
    uv_cm = -eps_n * inv_n
    uv_cp = eps_np1 * inv_np1
    vd_im = np.broadcast_to(mv, (M + 1, N + 1)).copy()
    vd_dn = nf * eps_np1
    vd_up = (nf + 1.0) * eps_n
    cdl_up = -(nf - 1.0) * eps_n
    cdl_dn = (nf + 2.0) * eps_np1
    inv_eig = np.where(nn1 > 0, -(radius * radius) * inv_nn1, 0.0)

    # dense real-DFT matrices for the longitude stage
    lam_lon = 2.0 * np.pi * np.arange(nlon) / nlon
    ang = np.outer(lam_lon, m_values)                           # (nlon, M+1)
    dft_cos_f = np.cos(ang) / nlon
    dft_sin_f = -np.sin(ang) / nlon
    wm = np.full(M + 1, 2.0)
    wm[0] = 1.0
    dft_cos_i = wm[:, None] * np.cos(ang).T
    dft_sin_i = -wm[:, None] * np.sin(ang).T

    # ---- m-axis zero padding for sharding (see docstring) ----
    M_true = M
    if pad_m_to is None:
        pad_m_to = mesh.devices.size if mesh is not None else 1
    n_pad = (-(M + 1)) % pad_m_to
    if n_pad:
        def _pad_m(a, axis):
            width = [(0, 0)] * a.ndim
            width[axis] = (0, n_pad)
            return np.pad(a, width)
        P = _pad_m(P, 1)
        eps = _pad_m(eps, 0)
        triangle = _pad_m(triangle, 0)
        uv_im, uv_cm, uv_cp = (_pad_m(a, 0) for a in (uv_im, uv_cm, uv_cp))
        vd_im, vd_dn, vd_up = (_pad_m(a, 0) for a in (vd_im, vd_dn, vd_up))
        cdl_up, cdl_dn = _pad_m(cdl_up, 0), _pad_m(cdl_dn, 0)
        dft_cos_f, dft_sin_f = _pad_m(dft_cos_f, 1), _pad_m(dft_sin_f, 1)
        dft_cos_i, dft_sin_i = _pad_m(dft_cos_i, 0), _pad_m(dft_sin_i, 0)
        m_values = np.concatenate([m_values, np.zeros(n_pad, m_values.dtype)])
        M = M + n_pad
    if mesh is not None:
        ndev = mesh.devices.size
        if (M + 1) % ndev or nlat % ndev:
            raise ValueError(
                f"mesh of {ndev} devices needs (m rows={M + 1}) % {ndev} == 0 "
                f"(set pad_m_to) and nlat={nlat} % {ndev} == 0")

    f = lambda x: jnp.asarray(x, dtype=dtype)
    return SphericalTransforms(
        truncation=truncation,
        num_fourier=M,
        num_fourier_true=M_true,
        mesh=mesh,
        overlap_chunks=max(int(overlap_chunks), 1),
        num_spherical=N,
        nlon=nlon,
        nlat=nlat,
        radius=float(radius),
        wts=f(w),
        sinlat=f(mu),
        coslat=f(np.sqrt(1.0 - mu * mu)),
        lats=f(np.arcsin(mu)),
        lons=f(2.0 * np.pi * np.arange(nlon) / nlon),
        P=f(P),
        Pw=f(P * (w[:, None, None] / 2.0)),
        eps=f(eps),
        mvec=f(np.asarray(m_values, np.float64)),
        nn1=f(nn1),
        inv_nn1=f(inv_nn1),
        triangle=f(triangle),
        eigenvalues=f(-nn1 / (radius * radius)),
        uv_im=f(uv_im),
        uv_cm=f(uv_cm),
        uv_cp=f(uv_cp),
        vd_im=f(vd_im),
        vd_dn=f(vd_dn),
        vd_up=f(vd_up),
        cdl_up=f(cdl_up),
        cdl_dn=f(cdl_dn),
        inv_eig=f(inv_eig),
        dft_cos_f=f(dft_cos_f),
        dft_sin_f=f(dft_sin_f),
        dft_cos_i=f(dft_cos_i),
        dft_sin_i=f(dft_sin_i),
        dft_ana=f(np.concatenate([dft_cos_f, dft_sin_f], axis=1)),
        dft_syn=f(np.concatenate([dft_cos_i, dft_sin_i], axis=0)),
        fourier_method=fourier_method,
        precision=precision,
    )


# ---------------------------------------------------------------------------
# Fourier (longitude) stage.  Grid arrays are (..., lat, lon); Fourier arrays
# are complex (..., lat, m) with m = 0..M.
# ---------------------------------------------------------------------------

def grid_to_fourier(T: SphericalTransforms, g: jax.Array) -> jax.Array:
    """Longitude Fourier analysis, normalized so F_0 is the zonal mean; m <= M.

    Default: dense DFT einsum on the MXU. 'fft' method uses jnp.fft.rfft.
    """
    if T.fourier_method == "fft":
        F = jnp.fft.rfft(g, axis=-1) / T.nlon
        F = F[..., : T.num_fourier_true + 1].astype(T.cdtype)
        if T.num_fourier != T.num_fourier_true:  # padded m rows are exact zeros
            pad = [(0, 0)] * (F.ndim - 1) + [(0, T.num_fourier - T.num_fourier_true)]
            F = jnp.pad(F, pad)
        return F
    M1 = T.num_fourier + 1
    FF = jnp.einsum("...l,lm->...m", g, T.dft_ana, precision=T.prec)
    return jax.lax.complex(FF[..., :M1], FF[..., M1:])


def fourier_to_grid(T: SphericalTransforms, F: jax.Array) -> jax.Array:
    """Inverse of grid_to_fourier (zero-padding m > M, i.e. spectral interpolation)."""
    if T.fourier_method == "fft":
        nfreq = T.nlon // 2 + 1
        pad = [(0, 0)] * (F.ndim - 1) + [(0, nfreq - F.shape[-1])]
        Ffull = jnp.pad(F, pad)
        return jnp.fft.irfft(Ffull * T.nlon, n=T.nlon, axis=-1).astype(T.P.dtype)
    return jnp.einsum(
        "...m,ml->...l",
        jnp.concatenate([F.real, F.imag], axis=-1),
        T.dft_syn,
        precision=T.prec,
    ).astype(T.P.dtype)


# ---------------------------------------------------------------------------
# Legendre stage (MXU einsums).  Fourier (..., lat, m) <-> spectral (..., m, n).
# ---------------------------------------------------------------------------

def fourier_to_spec(T: SphericalTransforms, F: jax.Array) -> jax.Array:
    """Legendre analysis: s_mn = (1/2) sum_j F(j,m) Pbar_mn(j) w_j.

    The Pbar*w table is real, so the complex contraction is done as two real
    einsums (XLA's complex dot on TPU lowers to four real matmuls; this is the
    two that are actually nonzero).
    """
    FF = jnp.stack([F.real, F.imag], axis=0)
    ss = jnp.einsum("jmn,r...jm->r...mn", T.Pw, FF, precision=T.prec)
    return jax.lax.complex(ss[0], ss[1])


def spec_to_fourier(T: SphericalTransforms, s: jax.Array) -> jax.Array:
    """Legendre synthesis: F(j,m) = sum_n s_mn Pbar_mn(j).

    Split into real/imag einsums against the real Pbar table (measured ~1.6x
    over the complex einsum on TPU: avoids the 4-real-matmul complex dot).
    """
    ss = jnp.stack([s.real, s.imag], axis=0)
    FF = jnp.einsum("jmn,r...mn->r...jm", T.P, ss, precision=T.prec)
    return jax.lax.complex(FF[0], FF[1])


@jax.named_scope("grid_to_spec")
def grid_to_spec(T: SphericalTransforms, g: jax.Array, truncate: bool = True) -> jax.Array:
    """Full forward transform (reference: trans_grid_to_spherical, transforms.F90:462)."""
    if T.mesh is not None:
        s = _grid_to_spec_shmap(T, g)
    else:
        s = fourier_to_spec(T, grid_to_fourier(T, g))
    return triangular_truncate(T, s) if truncate else s

@jax.named_scope("spec_to_grid")
def spec_to_grid(T: SphericalTransforms, s: jax.Array) -> jax.Array:
    """Full inverse transform (reference: trans_spherical_to_grid, transforms.F90:379)."""
    if T.mesh is not None:
        return _spec_to_grid_shmap(T, s)
    return fourier_to_grid(T, spec_to_fourier(T, s))


# ---------------------------------------------------------------------------
# Explicit transpose-method transforms under shard_map (reference: the
# distributed transpose, transforms.F90:970-1056 + spec_mpp.F90).  Grid space
# is lat-sharded (P1), spectral space m-sharded (P2); the re-partition between
# them is ONE lax.all_to_all over ICI per transform (P3) — each element moves
# exactly once, vs. the all-gather/all-reduce GSPMD may pick on its own.  The
# DFT and Legendre stages are purely local MXU matmuls on each device's shard.
# ---------------------------------------------------------------------------

def _axspec(ndim: int, axis: int) -> PartitionSpec:
    spec = [None] * ndim
    spec[axis] = "x"
    return PartitionSpec(*spec)


def _chunk_bounds(n: int, k: int):
    """<=k contiguous chunk boundaries covering n rows (all non-empty)."""
    k = max(1, min(int(k), int(n)))
    bounds = np.linspace(0, n, k + 1).astype(int)
    return [(int(a), int(b)) for a, b in zip(bounds[:-1], bounds[1:]) if b > a]


def _grid_to_spec_shmap(T: SphericalTransforms, g: jax.Array) -> jax.Array:
    """grid (..., lat_shard, lon) -> spectral (..., m_shard, n), untruncated.

    With T.overlap_chunks > 1 the leading batched axis is split into
    independent DFT -> all_to_all -> Legendre chains; XLA's async-collective
    scheduler overlaps chunk k's transpose with chunk k-1's Legendre matmul
    (SURVEY hard part #3 — the reference's ring transposes are strictly
    sequential per field, transforms.F90:970-1056)."""
    M1 = T.num_fourier + 1

    def one(g_loc, dft_ana, Pw_loc):
        # local longitude analysis on the device's latitude band
        FF = jnp.einsum("...l,lm->...m", g_loc, dft_ana, precision=T.prec)
        FF = jnp.stack([FF[..., :M1], FF[..., M1:]], axis=0)   # (2,...,lat_loc,M1)
        # the transpose: (lat_loc, m_all) -> (lat_all, m_loc)
        FF = jax.lax.all_to_all(FF, "x", split_axis=FF.ndim - 1,
                                concat_axis=FF.ndim - 2, tiled=True)
        # local Legendre analysis: full latitudes x the device's m block
        ss = jnp.einsum("jmn,r...jm->r...mn", Pw_loc, FF, precision=T.prec)
        return jax.lax.complex(ss[0], ss[1])

    def body(g_loc, dft_ana, Pw_loc):
        if T.overlap_chunks > 1 and g_loc.ndim >= 3 and g_loc.shape[0] > 1:
            return jnp.concatenate(
                [one(g_loc[a:b], dft_ana, Pw_loc)
                 for a, b in _chunk_bounds(g_loc.shape[0], T.overlap_chunks)],
                axis=0)
        return one(g_loc, dft_ana, Pw_loc)

    nd = g.ndim
    return _shard_map(
        body, mesh=T.mesh,
        in_specs=(_axspec(nd, nd - 2), PartitionSpec(None, None),
                  PartitionSpec(None, "x", None)),
        out_specs=_axspec(nd, nd - 2),
    )(g, T.dft_ana, T.Pw)


def _spec_to_grid_shmap(T: SphericalTransforms, s: jax.Array) -> jax.Array:
    """spectral (..., m_shard, n) -> grid (..., lat_shard, lon).

    overlap_chunks > 1: see _grid_to_spec_shmap (Legendre synthesis of chunk
    k runs while chunk k-1's all_to_all is in flight)."""

    def one(s_loc, P_loc, dft_syn):
        ss = jnp.stack([s_loc.real, s_loc.imag], axis=0)        # (2,...,m_loc,n)
        # local Legendre synthesis: all latitudes x the device's m block
        FF = jnp.einsum("jmn,r...mn->r...jm", P_loc, ss, precision=T.prec)
        # the transpose: (lat_all, m_loc) -> (lat_loc, m_all)
        FF = jax.lax.all_to_all(FF, "x", split_axis=FF.ndim - 2,
                                concat_axis=FF.ndim - 1, tiled=True)
        F2 = jnp.concatenate([FF[0], FF[1]], axis=-1)           # (...,lat_loc,2*M1)
        return jnp.einsum("...m,ml->...l", F2, dft_syn,
                          precision=T.prec).astype(T.P.dtype)

    def body(s_loc, P_loc, dft_syn):
        if T.overlap_chunks > 1 and s_loc.ndim >= 3 and s_loc.shape[0] > 1:
            return jnp.concatenate(
                [one(s_loc[a:b], P_loc, dft_syn)
                 for a, b in _chunk_bounds(s_loc.shape[0], T.overlap_chunks)],
                axis=0)
        return one(s_loc, P_loc, dft_syn)

    nd = s.ndim
    return _shard_map(
        body, mesh=T.mesh,
        in_specs=(_axspec(nd, nd - 2), PartitionSpec(None, "x", None),
                  PartitionSpec(None, None)),
        out_specs=_axspec(nd, nd - 2),
    )(s, T.P, T.dft_syn)


# ---------------------------------------------------------------------------
# Spectral-space operators (reference: spherical.F90).
# ---------------------------------------------------------------------------

def triangular_truncate(T: SphericalTransforms, s: jax.Array) -> jax.Array:
    """Zero modes outside the triangle m <= n <= T (spherical.F90:564-600)."""
    return s * T.triangle.astype(s.dtype)


def laplacian(T: SphericalTransforms, s: jax.Array, power: int = 1) -> jax.Array:
    """(nabla^2)^power: diagonal multiply by (-n(n+1)/a^2)^power."""
    return s * (T.eigenvalues.astype(s.real.dtype) ** power).astype(s.dtype)


def inverse_laplacian(T: SphericalTransforms, s: jax.Array) -> jax.Array:
    """nabla^-2 (zero at n=0): used for streamfunction from vorticity."""
    return s * T.inv_eig.astype(s.dtype)


def ddx_spec(T: SphericalTransforms, s: jax.Array) -> jax.Array:
    """d/dlambda in spectral space: multiply by i*m (spherical.F90 coef_dx)."""
    return s * (T.mvec[:, None].astype(s.dtype) * 1j)


def _shift_down(s: jax.Array) -> jax.Array:
    """result_n = s_{n+1} (zero at top)."""
    return jnp.concatenate([s[..., 1:], jnp.zeros_like(s[..., :1])], axis=-1)


def _shift_up(s: jax.Array) -> jax.Array:
    """result_n = s_{n-1} (zero at bottom)."""
    return jnp.concatenate([jnp.zeros_like(s[..., :1]), s[..., :-1]], axis=-1)


def cos_dlat_coeffs(T: SphericalTransforms, s: jax.Array) -> jax.Array:
    """Spectral coefficients g such that synth(g) = cos(lat) * d(synth(s))/d(lat).

    Uses (1-mu^2) dPbar_n/dmu = -n eps_{m,n+1} Pbar_{n+1} + (n+1) eps_{m,n} Pbar_{n-1}:
      g_n = -(n-1) eps_{m,n} s_{n-1} + (n+2) eps_{m,n+1} s_{n+1}
    """
    return T.cdl_up.astype(s.dtype) * _shift_up(s) + T.cdl_dn.astype(s.dtype) * _shift_down(s)


# ---------------------------------------------------------------------------
# Wind <-> (vorticity, divergence)  (reference: spherical.F90:409-484 +
# transforms.F90:681-783).
# ---------------------------------------------------------------------------

def uv_coeffs_from_vor_div(
    T: SphericalTransforms, vors: jax.Array, divs: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Spectral wind coefficients (U, V) with u = synth(U)/cos, v = synth(V)/cos.

      U_n = a [ -i m D_n /(n(n+1)) - eps_mn zeta_{n-1}/n + eps_{m,n+1} zeta_{n+1}/(n+1) ]
      V_n = a [ -i m zeta_n /(n(n+1)) + eps_mn D_{n-1}/n - eps_{m,n+1} D_{n+1}/(n+1) ]

    Uses the n = T+1 overflow row, making the synthesis exact for
    triangularly-truncated (vor, div). Split out so callers can batch the
    wind synthesis with other fields in ONE spec_to_grid (dycore fast path).
    """
    cd = vors.dtype
    im_inv = T.uv_im.astype(cd) * (-1j)
    cm = T.uv_cm.astype(cd)      # multiplies x_{n-1}
    cp = T.uv_cp.astype(cd)      # multiplies x_{n+1}

    U = T.radius * (im_inv * divs + cm * _shift_up(vors) + cp * _shift_down(vors))
    V = T.radius * (im_inv * vors - cm * _shift_up(divs) - cp * _shift_down(divs))
    return U, V


def uv_grid_from_vor_div(
    T: SphericalTransforms, vors: jax.Array, divs: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Grid winds (u, v) from spectral vorticity/divergence
    (reference: spherical.F90:409-484 + transforms.F90:681-783)."""
    U, V = uv_coeffs_from_vor_div(T, vors, divs)
    coslat = T.coslat[:, None]
    # one batched synthesis for both wind components (bigger MXU matmuls)
    UV = spec_to_grid(T, jnp.stack([U, V], axis=0))
    return UV[0] / coslat, UV[1] / coslat


def vor_div_from_uv_grid(
    T: SphericalTransforms, u: jax.Array, v: jax.Array, truncate: bool = True
) -> tuple[jax.Array, jax.Array]:
    """Spectral (vorticity, divergence) from grid winds.

    With a_n = analysis(u/cos), b_n = analysis(v/cos):
      zeta_n = (1/a)[ i m b_n - n eps_{m,n+1} a_{n+1} + (n+1) eps_mn a_{n-1} ]
      D_n    = (1/a)[ i m a_n + n eps_{m,n+1} b_{n+1} - (n+1) eps_mn b_{n-1} ]

    (reference divides the grid fields by cos^2 and transforms u*cos: identical.)
    """
    coslat = T.coslat[:, None]
    AB = grid_to_spec(T, jnp.stack([u / coslat, v / coslat], axis=0), truncate=False)
    return vor_div_from_analysis(T, AB[0], AB[1], truncate=truncate)


def vor_div_from_analysis(
    T: SphericalTransforms, A: jax.Array, B: jax.Array, truncate: bool = True
) -> tuple[jax.Array, jax.Array]:
    """Apply the (vor, div) recurrences to already-analyzed A = spec(u/cos),
    B = spec(v/cos) — the operator half of vor_div_from_uv_grid, split out so
    the dycore can batch the u/cos, v/cos analysis with other fields."""
    im = T.vd_im.astype(A.dtype) * 1j
    c_dn = T.vd_dn.astype(A.dtype)        # multiplies x_{n+1}
    c_up = T.vd_up.astype(A.dtype)  # multiplies x_{n-1}

    vor = (im * B - c_dn * _shift_down(A) + c_up * _shift_up(A)) / T.radius
    div = (im * A + c_dn * _shift_down(B) - c_up * _shift_up(B)) / T.radius
    if truncate:
        vor = triangular_truncate(T, vor)
        div = triangular_truncate(T, div)
    return vor, div


def horizontal_advection(
    T: SphericalTransforms, f_spec: jax.Array, u: jax.Array, v: jax.Array
) -> jax.Array:
    """-(V . grad f) on the grid from spectral f (transforms.F90:786-831).

    Advective form via spectral derivatives:
      dxf = synth(i m f)        ( = cos(lat) * (1/(a cos)) df/dlambda * a )
      dyf = synth(H f)          ( = cos(lat) * df/dlat )
      adv = -(u dxf + v dyf) / (a cos(lat))
    """
    grads = spec_to_grid(
        T, jnp.stack([ddx_spec(T, f_spec), cos_dlat_coeffs(T, f_spec)], axis=0)
    )
    coslat = T.coslat[:, None]
    return -(u * grads[0] + v * grads[1]) / (T.radius * coslat)


def area_weighted_mean(T: SphericalTransforms, g: jax.Array) -> jax.Array:
    """Area-weighted global mean over the trailing (lat, lon) axes."""
    w = (T.wts / 2.0).astype(g.dtype)
    # always full precision: this is the measuring stick for the global
    # mass/water/energy fixers — noise here random-walks the conserved totals
    return jnp.einsum("...jk,j->...", g, w,
                      precision=jax.lax.Precision.HIGHEST) / T.nlon


def coriolis_grid(T: SphericalTransforms, omega: float) -> jax.Array:
    """Planetary vorticity f = 2*Omega*sin(lat) on the grid, shape (nlat, nlon)."""
    return jnp.broadcast_to(2.0 * omega * T.sinlat[:, None], (T.nlat, T.nlon))
