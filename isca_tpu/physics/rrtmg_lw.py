"""RRTMG-LW: correlated-k longwave radiation, TPU-native.

Re-implementation of the AER RRTMG-LW column model vendored in the reference:
  - src/atmos_param/rrtm_radiation/rrtmg_lw/gcm_model/src/rrtmg_lw_setcoef.f90
    (setcoef: pressure/temperature interpolation indices, Planck functions,
    binary-species ratios; lwatmref/lwavplank data extracted to
    isca_tpu/data/rrtmg_lw_static.npz by tools/extract_rrtmg_lw.py)
  - .../rrtmg_lw_taumol.f90 (taugb1..16: per-band optical depths and Planck
    fractions from the correlated-k tables)
  - .../rrtmg_lw_rtrn.f90 (no-scattering radiative transfer with random
    cloud overlap, variable diffusivity angle secant, clear+total streams)
  - .../rrtmg_lw_cldprop.f90 (cloud optical depths: Hu-Stamnes liquid,
    Streamer v3 ice; coefficient data from rrtmg_lw_init.f90 lwcldpr)
  - .../rrtmg_lw_rad.nomcica.f90 (inatm: column amounts, precipitable water)

The k-distribution tables are NOT in the reference repository: its build
loads them at runtime from AER's `rrtmg_lw.nc` (rrtmg_lw_read_nc.f90:34).
This port has the same external dependency — run

    python tools/extract_rrtmg_lw.py /path/to/rrtmg_lw.nc

to produce isca_tpu/data/rrtmg_lw_kg.npz.  Tests exercise the full pipeline
with shape-correct synthetic tables (tools/extract_rrtmg_lw.make_synthetic_kg).

TPU-native design mirrors rrtmg_sw.py: every (column, layer, g-point) is
batched; table lookups are vectorized gathers; the troposphere/stratosphere
split (laytrop) is a per-layer mask selecting between both table regions; the
up/down radiative-transfer recursions are two `lax.scan`s over the level axis
batched over columns x 140 g-points.  Deviations from the reference: exact
`exp` and the exact linear-in-tau transition function instead of the Pade
lookup tables (tau_tbl/exp_tbl/tfn_tbl, rrtmg_lw_init.f90:106-124) — faster
than gathers on TPU and more accurate.

Layer convention inside this module: axis -2 over layers, index 0 = BOTTOM
(surface), matching the reference's lay=1..nlayers; the public wrapper
accepts the framework's top-down arrays and flips.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

DATA = Path(__file__).resolve().parent.parent / "data"
STATIC_NPZ = DATA / "rrtmg_lw_static.npz"
KG_NPZ = DATA / "rrtmg_lw_kg.npz"

NBND = 16
NGPT = 140
NGC = [10, 12, 16, 14, 16, 8, 12, 8, 12, 6, 8, 8, 4, 2, 2, 2]
AMD = 28.9660
AMW = 18.0160
AVOGAD = 6.02214199e23
GRAV_CGS = 9.8066          # m s-2 (lwdatinit, rrtmg_lw_init.f90:232)
FLUXFAC = np.pi * 2.0e4    # radiance -> flux (rrtmg_lw_rad.nomcica.f90:421)
WTDIFF = 0.5
ONEMINUS = 1.0 - 1.0e-6

# diffusivity-angle coefficients (rrtmg_lw_rtrn.f90:252-266)
SECDIFF_A0 = np.array([1.66, 1.55, 1.58, 1.66, 1.54, 1.454, 1.89, 1.33,
                       1.668, 1.66, 1.66, 1.66, 1.66, 1.66, 1.66, 1.66])
SECDIFF_A1 = np.array([0.00, 0.25, 0.22, 0.00, 0.13, 0.446, -0.10, 0.40,
                       -0.006, 0.00, 0.00, 0.00, 0.00, 0.00, 0.00, 0.00])
SECDIFF_A2 = np.array([0.00, -12.0, -11.7, 0.00, -0.72, -0.243, 0.19, -0.062,
                       0.414, 0.00, 0.00, 0.00, 0.00, 0.00, 0.00, 0.00])
SECDIFF_FIXED = np.array([b + 1 in (1, 4) or b + 1 >= 10 for b in range(16)])


def kg_available() -> bool:
    return KG_NPZ.exists()


class _Static:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
            cls._inst.d = {k: np.asarray(v)
                           for k, v in np.load(STATIC_NPZ).items()}
        return cls._inst

    def __getitem__(self, k):
        return self.d[k]


class LwSetcoef(NamedTuple):
    tropo: jax.Array           # bool (..., L)
    jp: jax.Array              # 0-based (1..58)-1
    jt: jax.Array
    jt1: jax.Array
    fac00: jax.Array
    fac01: jax.Array
    fac10: jax.Array
    fac11: jax.Array
    col: dict                  # colh2o..colbrd (scaled 1e-20)
    coldry: jax.Array
    selffac: jax.Array
    selffrac: jax.Array
    indself: jax.Array
    forfac: jax.Array
    forfrac: jax.Array
    indfor: jax.Array
    indminor: jax.Array
    minorfrac: jax.Array
    scaleminor: jax.Array
    scaleminorn2: jax.Array
    rat: dict                  # rat_h2oco2 .. rat_o3co2 and _1 variants
    planklay: jax.Array        # (..., L, 16)
    planklev: jax.Array        # (..., L+1, 16), index 0 = surface level
    plankbnd: jax.Array        # (..., 16) — semiss applied
    wx: dict                   # ccl4, cfc11, cfc12, cfc22 column amounts


def _plnk_interp(totplnk, t):
    """totplnk (181, nb); t (...). Linear interp on T-159 grid (setcoef)."""
    ind = jnp.clip(jnp.asarray(t - 159.0, jnp.int32), 1, 180)
    frac = t - 159.0 - ind
    i0 = ind - 1
    lo = totplnk[i0]                   # (..., nb)
    hi = totplnk[i0 + 1]
    return lo + frac[..., None] * (hi - lo)


def setcoef_lw(pavel, tavel, tz, tbound, wkl, wbrodl, coldry, wx_vmr,
               semiss, static):
    """Reference setcoef (rrtmg_lw_setcoef.f90:44-415), vectorized.

    pavel/tavel (..., L) bottom-up [hPa, K]; tz (..., L+1) level temps with
    index 0 = surface; tbound (...); wkl dict of molecular columns
    [molec/cm2]; wbrodl broadening-gas column; wx_vmr cross-section vmrs.
    """
    dt = pavel.dtype
    preflog = jnp.asarray(static["preflog"], dt)
    tref = jnp.asarray(static["tref"], dt)
    chi = jnp.asarray(static["chi_mls"], dt)      # (7, 59)
    totplnk = jnp.asarray(static["totplnk"], dt)  # (181, 16)

    stpfac = 296.0 / 1013.0
    plog = jnp.log(pavel)
    jp = jnp.clip(jnp.asarray(36.0 - 5.0 * (plog + 0.04), jnp.int32), 1, 58) - 1
    jp1 = jp + 1
    fp = 5.0 * (preflog[jp] - plog)

    tref_jp = tref[jp]
    jt = jnp.clip(jnp.asarray(3.0 + (tavel - tref_jp) / 15.0, jnp.int32),
                  1, 4) - 1
    ft = (tavel - tref_jp) / 15.0 - (jt + 1 - 3)
    tref_jp1 = tref[jp1]
    jt1 = jnp.clip(jnp.asarray(3.0 + (tavel - tref_jp1) / 15.0, jnp.int32),
                   1, 4) - 1
    ft1 = (tavel - tref_jp1) / 15.0 - (jt1 + 1 - 3)

    water = wkl["h2o"] / coldry
    scalefac = pavel * stpfac / tavel
    tropo = plog > 4.56

    forfac = scalefac / (1.0 + water)
    factor_t = (332.0 - tavel) / 36.0
    indfor_lo = jnp.clip(jnp.asarray(factor_t, jnp.int32), 1, 2)
    forfrac_lo = factor_t - indfor_lo
    indfor = jnp.where(tropo, indfor_lo, 3) - 1
    forfrac = jnp.where(tropo, forfrac_lo, (tavel - 188.0) / 36.0 - 1.0)

    selffac = water * forfac
    factor_s = (tavel - 188.0) / 7.2
    indself = jnp.clip(jnp.asarray(factor_s, jnp.int32) - 7, 1, 9) - 1
    selffrac = factor_s - (indself + 1 + 7)

    scaleminor = pavel / tavel
    scaleminorn2 = scaleminor * (wbrodl / (coldry + wkl["h2o"]))
    factor_m = (tavel - 180.8) / 7.2
    indminor = jnp.clip(jnp.asarray(factor_m, jnp.int32), 1, 18) - 1
    minorfrac = factor_m - (indminor + 1)

    # binary species ratios from the MLS reference profile (chi_mls)
    def ratpair(i, j):
        return chi[i - 1, jp] / chi[j - 1, jp], chi[i - 1, jp1] / chi[j - 1, jp1]

    rat = {}
    for name, (i, j) in {"h2oco2": (1, 2), "h2oo3": (1, 3), "h2on2o": (1, 4),
                         "h2och4": (1, 6), "n2oco2": (4, 2),
                         "o3co2": (3, 2)}.items():
        rat[name], rat[name + "_1"] = ratpair(i, j)

    col = {}
    for name in ("h2o", "co2", "o3", "n2o", "co", "ch4", "o2"):
        c = 1.0e-20 * wkl[name]
        if name != "h2o" and name != "o2":
            c = jnp.where(c == 0.0, 1.0e-32 * coldry, c)
        col[name] = c
    col["brd"] = 1.0e-20 * wbrodl

    compfp = 1.0 - fp
    fac00 = compfp * (1.0 - ft)
    fac10 = compfp * ft
    fac01 = fp * (1.0 - ft1)
    fac11 = fp * ft1

    # rescale self/foreign factors by colh2o (setcoef.f90:409-411)
    selffac = col["h2o"] * selffac
    forfac = col["h2o"] * forfac

    planklay = _plnk_interp(totplnk, tavel)             # (..., L, 16)
    planklev = _plnk_interp(totplnk, tz)                # (..., L+1, 16)
    plankbnd = semiss * _plnk_interp(totplnk, tbound)   # (..., 16)

    wx = {k: 1.0e-20 * coldry * v for k, v in wx_vmr.items()}

    return LwSetcoef(
        tropo=tropo, jp=jp, jt=jt, jt1=jt1,
        fac00=fac00, fac01=fac01, fac10=fac10, fac11=fac11,
        col=col, coldry=coldry,
        selffac=selffac, selffrac=selffrac, indself=indself,
        forfac=forfac, forfrac=forfrac, indfor=indfor,
        indminor=indminor, minorfrac=minorfrac,
        scaleminor=scaleminor, scaleminorn2=scaleminorn2,
        rat=rat, planklay=planklay, planklev=planklev, plankbnd=plankbnd,
        wx=wx)


# ---------------------------------------------------------------------------
# taumol helpers — TPU-native table interpolation
#
# The reference's taumol is ~150 per-band table-row gathers.  Row gathers are
# slow on TPU (serialized dynamic-slices); instead every interpolation here is
# a weighted one-hot matrix product on the MXU:
#     out = W @ tab,   W[..., r] = sum_k w_k * [off_k == r]
# The expensive W matrices depend only on setcoef's (jp, jt, jt1, facXX) and
# the continuum/minor indices, which are IDENTICAL across bands, so they are
# built once per taumol call (_Weights) and reused by all 16 bands.
# ---------------------------------------------------------------------------

def _wsum(pairs, nrow, dtype):
    """One-hot weighted scatter: [(idx (...,), w (...,)), ...] -> (..., nrow).

    Out-of-range indices contribute zero rows (the reference clips instead;
    both regions are masked by `tropo` before use, so the values agree where
    they are read)."""
    iota = jnp.arange(nrow, dtype=jnp.int32)
    W = None
    zero = jnp.zeros((), dtype)
    for idx, w in pairs:
        t = jnp.where(idx[..., None] == iota, w[..., None], zero)
        W = t if W is None else W + t
    return W


class _Weights(NamedTuple):
    q_a_lo: jax.Array    # (..., L, 65)  fac00/fac10 at rows jp*5+jt (+1)
    q_b_lo: jax.Array    # (..., L, 65)  fac01/fac11 at rows (jp+1)*5+jt1 (+1)
    q_lo: jax.Array      # sum of the two: the 1-key lower-atmos interpolant
    q_a_up: jax.Array    # (..., L, 235) upper-atmosphere analogues
    q_b_up: jax.Array
    q_up: jax.Array
    minor: jax.Array     # (..., L, 19)  indminor/minorfrac interpolant
    forw: jax.Array      # (..., L, 4)   foreign continuum incl. forfac
    selfw: jax.Array     # (..., L, 10)  self continuum incl. selffac


def _build_weights(c: LwSetcoef, dt) -> _Weights:
    q0 = c.jp * 5 + c.jt
    q1 = (c.jp + 1) * 5 + c.jt1
    q_a_lo = _wsum([(q0, c.fac00), (q0 + 1, c.fac10)], 65, dt)
    q_b_lo = _wsum([(q1, c.fac01), (q1 + 1, c.fac11)], 65, dt)
    u0 = (c.jp - 12) * 5 + c.jt
    u1 = (c.jp - 11) * 5 + c.jt1
    q_a_up = _wsum([(u0, c.fac00), (u0 + 1, c.fac10)], 235, dt)
    q_b_up = _wsum([(u1, c.fac01), (u1 + 1, c.fac11)], 235, dt)
    minor = _wsum([(c.indminor, 1.0 - c.minorfrac),
                   (c.indminor + 1, c.minorfrac)], 19, dt)
    forw = c.forfac[..., None] * _wsum(
        [(c.indfor, 1.0 - c.forfrac), (c.indfor + 1, c.forfrac)], 4, dt)
    selfw = c.selffac[..., None] * _wsum(
        [(c.indself, 1.0 - c.selffrac), (c.indself + 1, c.selffrac)], 10, dt)
    return _Weights(q_a_lo=q_a_lo, q_b_lo=q_b_lo, q_lo=q_a_lo + q_b_lo,
                    q_a_up=q_a_up, q_b_up=q_b_up, q_up=q_a_up + q_b_up,
                    minor=minor, forw=forw, selfw=selfw)


def _continuum(W, selfref, forref, with_self=True):
    """Self + foreign water-vapor continuum (colh2o already inside the
    rescaled selffac/forfac baked into W). Returns (..., L, ng)."""
    tau = W.forw @ forref
    if with_self:
        tau = tau + W.selfw @ selfref
    return tau


def _minor2d(tab, W):
    """tab (19, ng) -> interp over indminor: (..., L, ng)."""
    return W.minor @ tab


def _spec(col1, col2, ratv, nmult):
    """Binary species parameter: returns (speccomb, js 0-based, fs)."""
    speccomb = col1 + ratv * col2
    specparm = jnp.minimum(col1 / speccomb, ONEMINUS)
    specmult = nmult * specparm
    js = jnp.asarray(specmult, jnp.int32)       # 0-based (ref: 1 + int)
    fs = specmult - js
    return speccomb, js, fs, specparm


def _minor3d(tab, jm, fm, W):
    """tab (nkey, 19, ng); jm 0-based key index, fm fraction."""
    nkey = tab.shape[0]
    jm = jnp.minimum(jm, nkey - 2)
    dt = fm.dtype
    wm = _wsum([(jm, 1.0 - fm), (jm + 1, fm)], nkey, dt)
    return jnp.einsum("...m,...k,mkg->...g", wm, W.minor, tab)


def _major_1key(tab, W, nrow_base):
    """4-point (p, T) interpolation for single-key-species bands as one
    MXU matmul with the shared lower/upper one-hot weights.

    tab = absa (65, ng) with nrow_base = lower, or absb (235, ng) upper.
    Returns (..., L, ng)."""
    return (W.q_lo if nrow_base == "lower" else W.q_up) @ tab


def _js_weights(js, fs, specparm, nspa, dt, special_branches=True):
    """Species-dimension interpolation weights (..., nspa) including the
    reference's specparm<0.125 / >0.875 cubic end-point branches."""
    if special_branches:
        m_lo = specparm < 0.125
        m_hi = specparm > 0.875
        p = jnp.where(m_lo, fs - 1.0, -fs)
        p4 = p ** 4
        fk0, fk1, fk2 = p4, 1.0 - p - 2.0 * p4, p + p4
        special = m_lo | m_hi
        j0 = jnp.where(m_hi, js - 1, js)
        w0 = jnp.where(special, jnp.where(m_lo, fk0, fk2), 1.0 - fs)
        w1 = jnp.where(special, fk1, fs)
        w2 = jnp.where(special, jnp.where(m_lo, fk2, fk0),
                       jnp.zeros_like(fs))
        return _wsum([(j0, w0), (j0 + 1, w1), (j0 + 2, w2)], nspa, dt)
    return _wsum([(js, 1.0 - fs), (js + 1, fs)], nspa, dt)


def _major_2key_lower(absa, c, W, js, fs, specparm, js1, fs1, specparm1,
                      speccomb, speccomb1, nspa=9):
    """Two-key-species lower-atmosphere interpolation (taumol.f90 taugb3):
    the (p,T) one-hot is shared (W.q_a_lo/q_b_lo); the species dimension is a
    per-band 3-point weight; the row space factorizes (65, nspa, ng)."""
    dt = fs.dtype
    tab3 = jnp.asarray(absa).reshape(65, nspa, -1)
    wj0 = _js_weights(js, fs, specparm, nspa, dt)
    wj1 = _js_weights(js1, fs1, specparm1, nspa, dt)
    t0 = jnp.einsum("...q,...j,qjg->...g", W.q_a_lo, wj0, tab3)
    t1 = jnp.einsum("...q,...j,qjg->...g", W.q_b_lo, wj1, tab3)
    return speccomb[..., None] * t0 + speccomb1[..., None] * t1


def _major_2key_upper(absb, c, W, js, fs, js1, fs1, speccomb, speccomb1,
                      nspb=5):
    """Two-key upper-atmosphere 4-point interpolation (taugb3 upper)."""
    dt = fs.dtype
    tab3 = jnp.asarray(absb).reshape(235, nspb, -1)
    wj0 = _js_weights(js, fs, None, nspb, dt, special_branches=False)
    wj1 = _js_weights(js1, fs1, None, nspb, dt, special_branches=False)
    t0 = jnp.einsum("...q,...j,qjg->...g", W.q_a_up, wj0, tab3)
    t1 = jnp.einsum("...q,...j,qjg->...g", W.q_b_up, wj1, tab3)
    return speccomb[..., None] * t0 + speccomb1[..., None] * t1


def _fracs_interp(fracref, jpl, fpl):
    """fracref (ng, nk); jpl 0-based; returns (..., L, ng)."""
    t = fracref.T                                   # (nk, ng)
    jpl = jnp.minimum(jpl, t.shape[0] - 2)
    w = _wsum([(jpl, 1.0 - fpl), (jpl + 1, fpl)], t.shape[0], fpl.dtype)
    return w @ t


def _planck_js(col1, col2, refrat, nmult):
    """Planck-fraction species index (jpl, fpl)."""
    _, jpl, fpl, _ = _spec(col1, col2, refrat, nmult)
    return jpl, fpl


def _adj_minor(c, gas_col, chi_ref_row, thresh, base, expo, chi):
    """Empirical column adjustment for over-abundant minor species
    (taugb3: adjcoln2o; taugb6/7/8: adjcolco2)."""
    chi_gas = gas_col / (1.0e-20 * c.coldry)        # col is scaled by 1e-20
    ref = chi[chi_ref_row - 1, c.jp + 1]
    ratio = chi_gas / ref
    adjfac = base + jnp.maximum(ratio - base, 1e-30) ** expo
    adj = adjfac * ref * c.coldry * 1.0e-20
    return jnp.where(ratio > thresh, adj, gas_col)


# ---------------------------------------------------------------------------
# taumol: all 16 bands (rrtmg_lw_taumol.f90)
# ---------------------------------------------------------------------------

def taumol_lw(c: LwSetcoef, kg: dict, static) -> tuple[jax.Array, jax.Array]:
    """Returns (taug, fracs), both (..., L, 140), bottom-up layers."""
    dt = c.col["h2o"].dtype
    chi = jnp.asarray(static["chi_mls"], dt)
    chi_np = np.asarray(static["chi_mls"])
    col = c.col
    tmask = c.tropo[..., None]
    Wt = _build_weights(c, dt)
    taugs, fracss = [], []

    def band(b, name, default=None):
        key = f"b{b}_{name}"
        if key not in kg:
            return default
        return jnp.asarray(kg[key], dt)

    def lower_upper(tl, tu, fl, fu):
        taugs.append(jnp.where(tmask, tl, tu))
        fracss.append(jnp.where(tmask, fl, fu))

    L_shape = col["h2o"].shape

    # ---- band 1: h2o, minor n2 (lower+upper), pressure corradj ----
    b = 1
    absa, absb = band(b, "absa"), band(b, "absb")
    pavel = col["pavel"]          # hPa; needed for band-1/2 pressure corradj
    corr_lo = jnp.where(pavel < 250.0,
                        1.0 - 0.15 * (250.0 - pavel) / 154.4, 1.0)
    corr_up = 1.0 - 0.15 * (pavel / 95.6)
    scalen2 = col["brd"] * c.scaleminorn2
    taun2_lo = scalen2[..., None] * _minor2d(band(b, "ka_mn2"), Wt)
    taun2_up = scalen2[..., None] * _minor2d(band(b, "kb_mn2"), Wt)
    tl = corr_lo[..., None] * (
        col["h2o"][..., None] * _major_1key(absa, Wt, "lower")
        + _continuum(Wt, band(b, "selfref"), band(b, "forref")) + taun2_lo)
    tu = corr_up[..., None] * (
        col["h2o"][..., None] * _major_1key(absb, Wt, "upper")
        + _continuum(Wt, band(b, "selfref"), band(b, "forref"), False)
        + taun2_up)
    fr_a = jnp.broadcast_to(band(b, "fracrefa"), L_shape + (NGC[0],))
    fr_b = jnp.broadcast_to(band(b, "fracrefb"), L_shape + (NGC[0],))
    lower_upper(tl, tu, fr_a, fr_b)

    # ---- band 2: h2o only, pressure corradj in lower ----
    b = 2
    corr_lo = 1.0 - 0.05 * (pavel - 100.0) / 900.0
    tl = corr_lo[..., None] * (
        col["h2o"][..., None] * _major_1key(band(b, "absa"), Wt, "lower")
        + _continuum(Wt, band(b, "selfref"), band(b, "forref")))
    tu = (col["h2o"][..., None] * _major_1key(band(b, "absb"), Wt, "upper")
          + _continuum(Wt, band(b, "selfref"), band(b, "forref"), False))
    lower_upper(tl, tu,
                jnp.broadcast_to(band(b, "fracrefa"), L_shape + (NGC[1],)),
                jnp.broadcast_to(band(b, "fracrefb"), L_shape + (NGC[1],)))

    # ---- generic 2-key lower helper ----
    def two_key_lower(b, col1, col2, ratname, planck_ij, minor=None):
        """Returns (tau_major(+minor terms applied by caller), fracs_lower,
        spec indices for reuse)."""
        sc, js, fs, sp = _spec(col1, col2, c.rat[ratname], 8.0)
        sc1, js1, fs1, sp1 = _spec(col1, col2, c.rat[ratname + "_1"], 8.0)
        tmaj = _major_2key_lower(band(b, "absa"), c, Wt, js, fs, sp,
                                 js1, fs1, sp1, sc, sc1)
        (pi, pj), plev = planck_ij
        refrat_p = float(chi_np[pi - 1, plev - 1] / chi_np[pj - 1, plev - 1])
        jpl, fpl = _planck_js(col1, col2, refrat_p, 8.0)
        fr = _fracs_interp(band(b, "fracrefa"), jpl, fpl)
        return tmaj, fr

    def minor3d_term(b, name, col1, col2, mi, mj, mlev, nmult=8.0):
        refrat_m = float(chi_np[mi - 1, mlev - 1] / chi_np[mj - 1, mlev - 1])
        _, jm, fm, _ = _spec(col1, col2, refrat_m, nmult)
        return _minor3d(band(b, name), jm, fm, Wt)

    # ---- band 3: h2o+co2, minor n2o both regions ----
    b = 3
    tmaj, fr_a = two_key_lower(b, col["h2o"], col["co2"], "h2oco2",
                               ((1, 2), 9))
    absn2o_lo = minor3d_term(b, "ka_mn2o", col["h2o"], col["co2"], 1, 2, 3)
    adjn2o = _adj_minor(c, col["n2o"], 4, 1.5, 0.5, 0.65, chi)
    tl = (tmaj + _continuum(Wt, band(b, "selfref"), band(b, "forref"))
          + adjn2o[..., None] * absn2o_lo)
    # upper
    scu, jsu, fsu, _ = _spec(col["h2o"], col["co2"], c.rat["h2oco2"], 4.0)
    scu1, jsu1, fsu1, _ = _spec(col["h2o"], col["co2"], c.rat["h2oco2_1"], 4.0)
    tmaj_u = _major_2key_upper(band(b, "absb"), c, Wt, jsu, fsu, jsu1, fsu1,
                               scu, scu1)
    refrat_m_b = float(chi_np[0, 12] / chi_np[1, 12])
    _, jmu, fmu, _ = _spec(col["h2o"], col["co2"], refrat_m_b, 4.0)
    absn2o_up = _minor3d(band(b, "kb_mn2o"), jmu, fmu, Wt)
    tu = (tmaj_u + _continuum(Wt, band(b, "selfref"), band(b, "forref"), False)
          + adjn2o[..., None] * absn2o_up)
    refrat_p_b = float(chi_np[0, 12] / chi_np[1, 12])
    jplu, fplu = _planck_js(col["h2o"], col["co2"], refrat_p_b, 4.0)
    fr_b = _fracs_interp(band(b, "fracrefb"), jplu, fplu)
    lower_upper(tl, tu, fr_a, fr_b)

    # ---- band 4: h2o+co2 lower; o3+co2 upper; upper g fudge factors ----
    b = 4
    tmaj, fr_a = two_key_lower(b, col["h2o"], col["co2"], "h2oco2",
                               ((1, 2), 11))
    tl = tmaj + _continuum(Wt, band(b, "selfref"), band(b, "forref"))
    scu, jsu, fsu, _ = _spec(col["o3"], col["co2"], c.rat["o3co2"], 4.0)
    scu1, jsu1, fsu1, _ = _spec(col["o3"], col["co2"], c.rat["o3co2_1"], 4.0)
    tu = _major_2key_upper(band(b, "absb"), c, Wt, jsu, fsu, jsu1, fsu1,
                           scu, scu1)
    fudge = np.ones(NGC[3])
    fudge[7:14] = [0.92, 0.88, 1.07, 1.1, 0.99, 0.88, 0.943]
    tu = tu * jnp.asarray(fudge, dt)
    refrat_p_b = float(chi_np[2, 12] / chi_np[1, 12])
    jplu, fplu = _planck_js(col["o3"], col["co2"], refrat_p_b, 4.0)
    fr_b = _fracs_interp(band(b, "fracrefb"), jplu, fplu)
    lower_upper(tl, tu, fr_a, fr_b)

    # ---- band 5: h2o+co2 lower (minor o3, ccl4); o3+co2 upper (ccl4) ----
    b = 5
    tmaj, fr_a = two_key_lower(b, col["h2o"], col["co2"], "h2oco2",
                               ((1, 2), 5))
    abso3 = minor3d_term(b, "ka_mo3", col["h2o"], col["co2"], 1, 2, 7)
    ccl4_term = c.wx["ccl4"][..., None] * band(b, "ccl4")
    tl = (tmaj + _continuum(Wt, band(b, "selfref"), band(b, "forref"))
          + col["o3"][..., None] * abso3 + ccl4_term)
    scu, jsu, fsu, _ = _spec(col["o3"], col["co2"], c.rat["o3co2"], 4.0)
    scu1, jsu1, fsu1, _ = _spec(col["o3"], col["co2"], c.rat["o3co2_1"], 4.0)
    tu = _major_2key_upper(band(b, "absb"), c, Wt, jsu, fsu, jsu1, fsu1,
                           scu, scu1) + ccl4_term
    refrat_p_b = float(chi_np[2, 42] / chi_np[1, 42])
    jplu, fplu = _planck_js(col["o3"], col["co2"], refrat_p_b, 4.0)
    fr_b = _fracs_interp(band(b, "fracrefb"), jplu, fplu)
    lower_upper(tl, tu, fr_a, fr_b)

    # ---- band 6: h2o lower (minor co2, cfc11, cfc12); upper cfc only ----
    b = 6
    adjco2 = _adj_minor(c, col["co2"], 2, 3.0, 2.0, 0.77, chi)
    absco2 = _minor2d(band(b, "ka_mco2"), Wt)
    cfc_term = (c.wx["cfc11"][..., None] * band(b, "cfc11adj")
                + c.wx["cfc12"][..., None] * band(b, "cfc12"))
    tl = (col["h2o"][..., None] * _major_1key(band(b, "absa"), Wt, "lower")
          + _continuum(Wt, band(b, "selfref"), band(b, "forref"))
          + adjco2[..., None] * absco2 + cfc_term)
    tu = jnp.zeros_like(tl) + cfc_term
    fr = jnp.broadcast_to(band(b, "fracrefa"), L_shape + (NGC[5],))
    lower_upper(tl, tu, fr, fr)

    # ---- band 7: h2o+o3 lower (minor co2); o3 upper (minor co2) ----
    b = 7
    sc, js, fs, sp = _spec(col["h2o"], col["o3"], c.rat["h2oo3"], 8.0)
    sc1, js1, fs1, sp1 = _spec(col["h2o"], col["o3"], c.rat["h2oo3_1"], 8.0)
    tmaj = _major_2key_lower(band(b, "absa"), c, Wt, js, fs, sp, js1, fs1, sp1,
                             sc, sc1)
    absco2_lo = minor3d_term(b, "ka_mco2", col["h2o"], col["o3"], 1, 3, 3)
    adjco2_lo = _adj_minor(c, col["co2"], 2, 3.0, 3.0, 0.79, chi)
    tl = (tmaj + _continuum(Wt, band(b, "selfref"), band(b, "forref"))
          + adjco2_lo[..., None] * absco2_lo)
    refrat_p_a = float(chi_np[0, 2] / chi_np[2, 2])
    jpl, fpl = _planck_js(col["h2o"], col["o3"], refrat_p_a, 8.0)
    fr_a = _fracs_interp(band(b, "fracrefa"), jpl, fpl)
    adjco2_up = _adj_minor(c, col["co2"], 2, 3.0, 2.0, 0.79, chi)
    tu = (col["o3"][..., None] * _major_1key(band(b, "absb"), Wt, "upper")
          + adjco2_up[..., None] * _minor2d(band(b, "kb_mco2"), Wt))
    fudge = np.ones(NGC[6])
    fudge[5:11] = [0.92, 0.88, 1.07, 1.1, 0.99, 0.855]
    tu = tu * jnp.asarray(fudge, dt)
    fr_b = jnp.broadcast_to(band(b, "fracrefb"), L_shape + (NGC[6],))
    lower_upper(tl, tu, fr_a, fr_b)

    # ---- band 8: h2o lower / o3 upper, minors co2+o3+n2o+cfc12+cfc22 ----
    b = 8
    adjco2 = _adj_minor(c, col["co2"], 2, 3.0, 2.0, 0.65, chi)
    cfc_term = (c.wx["cfc12"][..., None] * band(b, "cfc12")
                + c.wx["cfc22"][..., None] * band(b, "cfc22adj"))
    tl = (col["h2o"][..., None] * _major_1key(band(b, "absa"), Wt, "lower")
          + _continuum(Wt, band(b, "selfref"), band(b, "forref"))
          + adjco2[..., None] * _minor2d(band(b, "ka_mco2"), Wt)
          + col["o3"][..., None] * _minor2d(band(b, "ka_mo3"), Wt)
          + col["n2o"][..., None] * _minor2d(band(b, "ka_mn2o"), Wt)
          + cfc_term)
    tu = (col["o3"][..., None] * _major_1key(band(b, "absb"), Wt, "upper")
          + adjco2[..., None] * _minor2d(band(b, "kb_mco2"), Wt)
          + col["n2o"][..., None] * _minor2d(band(b, "kb_mn2o"), Wt)
          + cfc_term)
    lower_upper(tl, tu,
                jnp.broadcast_to(band(b, "fracrefa"), L_shape + (NGC[7],)),
                jnp.broadcast_to(band(b, "fracrefb"), L_shape + (NGC[7],)))

    # ---- band 9: h2o+ch4 lower (minor n2o); ch4 upper (minor n2o) ----
    b = 9
    tmaj, fr_a = two_key_lower(b, col["h2o"], col["ch4"], "h2och4",
                               ((1, 6), 9))
    absn2o_lo = minor3d_term(b, "ka_mn2o", col["h2o"], col["ch4"], 1, 6, 3)
    adjn2o = _adj_minor(c, col["n2o"], 4, 1.5, 0.5, 0.65, chi)
    tl = (tmaj + _continuum(Wt, band(b, "selfref"), band(b, "forref"))
          + adjn2o[..., None] * absn2o_lo)
    tu = (col["ch4"][..., None] * _major_1key(band(b, "absb"), Wt, "upper")
          + adjn2o[..., None] * _minor2d(band(b, "kb_mn2o"), Wt))
    fr_b = jnp.broadcast_to(band(b, "fracrefb"), L_shape + (NGC[8],))
    lower_upper(tl, tu, fr_a, fr_b)

    # ---- band 10: h2o only ----
    b = 10
    tl = (col["h2o"][..., None] * _major_1key(band(b, "absa"), Wt, "lower")
          + _continuum(Wt, band(b, "selfref"), band(b, "forref")))
    tu = (col["h2o"][..., None] * _major_1key(band(b, "absb"), Wt, "upper")
          + _continuum(Wt, band(b, "selfref"), band(b, "forref"), False))
    lower_upper(tl, tu,
                jnp.broadcast_to(band(b, "fracrefa"), L_shape + (NGC[9],)),
                jnp.broadcast_to(band(b, "fracrefb"), L_shape + (NGC[9],)))

    # ---- band 11: h2o, minor o2 both regions ----
    b = 11
    scaleo2 = (col["o2"] * c.scaleminor)[..., None]
    tl = (col["h2o"][..., None] * _major_1key(band(b, "absa"), Wt, "lower")
          + _continuum(Wt, band(b, "selfref"), band(b, "forref"))
          + scaleo2 * _minor2d(band(b, "ka_mo2"), Wt))
    tu = (col["h2o"][..., None] * _major_1key(band(b, "absb"), Wt, "upper")
          + _continuum(Wt, band(b, "selfref"), band(b, "forref"), False)
          + scaleo2 * _minor2d(band(b, "kb_mo2"), Wt))
    lower_upper(tl, tu,
                jnp.broadcast_to(band(b, "fracrefa"), L_shape + (NGC[10],)),
                jnp.broadcast_to(band(b, "fracrefb"), L_shape + (NGC[10],)))

    # ---- band 12: h2o+co2 lower only ----
    b = 12
    tmaj, fr_a = two_key_lower(b, col["h2o"], col["co2"], "h2oco2",
                               ((1, 2), 10))
    tl = tmaj + _continuum(Wt, band(b, "selfref"), band(b, "forref"))
    lower_upper(tl, jnp.zeros_like(tl), fr_a, jnp.zeros_like(fr_a))

    # ---- band 13: h2o+n2o lower (minors co2, co); o3 minor upper ----
    b = 13
    tmaj, fr_a = two_key_lower(b, col["h2o"], col["n2o"], "h2on2o",
                               ((1, 4), 5))
    absco2 = minor3d_term(b, "ka_mco2", col["h2o"], col["n2o"], 1, 4, 1)
    # special co2 adjustment against fixed 3.55e-4 (taugb13)
    chi_co2 = col["co2"] / (1.0e-20 * c.coldry)
    ratco2 = chi_co2 / 3.55e-4
    adjfac = 2.0 + jnp.maximum(ratco2 - 2.0, 1e-30) ** 0.68
    adjco2 = jnp.where(ratco2 > 3.0,
                       adjfac * 3.55e-4 * c.coldry * 1.0e-20, col["co2"])
    absco = minor3d_term(b, "ka_mco", col["h2o"], col["n2o"], 1, 4, 3)
    tl = (tmaj + _continuum(Wt, band(b, "selfref"), band(b, "forref"))
          + adjco2[..., None] * absco2 + col["co"][..., None] * absco)
    tu = col["o3"][..., None] * _minor2d(band(b, "kb_mo3"), Wt)
    fr_b = jnp.broadcast_to(band(b, "fracrefb"), L_shape + (NGC[12],))
    lower_upper(tl, tu, fr_a, fr_b)

    # ---- band 14: co2 only ----
    b = 14
    tl = (col["co2"][..., None] * _major_1key(band(b, "absa"), Wt, "lower")
          + _continuum(Wt, band(b, "selfref"), band(b, "forref")))
    tu = col["co2"][..., None] * _major_1key(band(b, "absb"), Wt, "upper")
    lower_upper(tl, tu,
                jnp.broadcast_to(band(b, "fracrefa"), L_shape + (NGC[13],)),
                jnp.broadcast_to(band(b, "fracrefb"), L_shape + (NGC[13],)))

    # ---- band 15: n2o+co2 lower (minor n2); nothing upper ----
    b = 15
    sc, js, fs, sp = _spec(col["n2o"], col["co2"], c.rat["n2oco2"], 8.0)
    sc1, js1, fs1, sp1 = _spec(col["n2o"], col["co2"], c.rat["n2oco2_1"], 8.0)
    tmaj = _major_2key_lower(band(b, "absa"), c, Wt, js, fs, sp, js1, fs1, sp1,
                             sc, sc1)
    refrat_m_a = float(chi_np[3, 0] / chi_np[1, 0])
    _, jm, fm, _ = _spec(col["n2o"], col["co2"], refrat_m_a, 8.0)
    scalen2 = (col["brd"] * c.scaleminor)[..., None]
    taun2 = scalen2 * _minor3d(band(b, "ka_mn2"), jm, fm, Wt)
    tl = (tmaj + _continuum(Wt, band(b, "selfref"), band(b, "forref"))
          + taun2)
    refrat_p_a = float(chi_np[3, 0] / chi_np[1, 0])
    jpl, fpl = _planck_js(col["n2o"], col["co2"], refrat_p_a, 8.0)
    fr_a = _fracs_interp(band(b, "fracrefa"), jpl, fpl)
    lower_upper(tl, jnp.zeros_like(tl), fr_a, jnp.zeros_like(fr_a))

    # ---- band 16: h2o+ch4 lower; ch4 upper ----
    b = 16
    tmaj, fr_a = two_key_lower(b, col["h2o"], col["ch4"], "h2och4",
                               ((1, 6), 6))
    tl = tmaj + _continuum(Wt, band(b, "selfref"), band(b, "forref"))
    tu = col["ch4"][..., None] * _major_1key(band(b, "absb"), Wt, "upper")
    fr_b = jnp.broadcast_to(band(b, "fracrefb"), L_shape + (NGC[15],))
    lower_upper(tl, tu, fr_a, fr_b)

    return (jnp.concatenate(taugs, axis=-1),
            jnp.concatenate(fracss, axis=-1))


# ---------------------------------------------------------------------------
# radiative transfer (rrtmg_lw_rtrn.f90, random cloud overlap) — exact math
# ---------------------------------------------------------------------------

def _tfn(od):
    """Exact linear-in-tau transition function (rrtmg_lw_init.f90:117-123)."""
    ods = jnp.maximum(od, 1e-12)
    exact = 1.0 - 2.0 * (1.0 / ods - jnp.exp(-ods) / (1.0 - jnp.exp(-ods)))
    return jnp.where(od < 0.06, od / 6.0, exact)


class LwFluxes(NamedTuple):
    uflx: jax.Array       # (..., L+1) upward flux, TOP-DOWN half levels
    dflx: jax.Array
    uflxc: jax.Array      # clear sky
    dflxc: jax.Array
    hr: jax.Array         # (..., L) heating rate [K/s], top-down
    hrc: jax.Array
    olr: jax.Array        # (...)
    lw_dn_surf: jax.Array
    lw_dn_surf_clr: jax.Array


class LwDownState(NamedTuple):
    """t_surf-independent part of rtrn (downward pass + layer coefficients),
    so the adapter can expose surf_lw_down before the surface update and
    finish the upward pass with the new t_surf (the grey scheme's
    down/up split, two_stream_gray_rad.F90:386/:659)."""
    A: jax.Array            # (..., L, ngpt) recursion coefficient
    Su: jax.Array           # upward source
    atrans: jax.Array
    bbu: jax.Array
    anycld: jax.Array       # (..., L) bool
    seen_any: jax.Array     # (...,) bool: cloud anywhere in column
    radld_sfc: jax.Array    # (..., ngpt)
    radclrd_sfc: jax.Array
    drad_bu: jax.Array      # (L+1, ..., ngpt) downward radiance
    dclr_bu: jax.Array
    fracs_sfc: jax.Array    # (..., ngpt)


def rtrn_down(taut, fracs, planklay, planklev, pwvcm, cldfrac, taucloud,
              band_of_g) -> LwDownState:
    """Downward half of rtrn: layer coefficients + top-to-surface scan."""
    nl = taut.shape[-2]

    # diffusivity secant per band -> per g
    dt = taut.dtype
    sec = jnp.where(jnp.asarray(SECDIFF_FIXED), jnp.asarray(1.66, dt),
                    jnp.clip(jnp.asarray(SECDIFF_A0, dt)
                             + jnp.asarray(SECDIFF_A1, dt)
                             * jnp.exp(jnp.asarray(SECDIFF_A2, dt)
                                       * pwvcm[..., None]), 1.5, 1.8))
    secg = jnp.take(sec, band_of_g, axis=-1)[..., None, :]   # (..., 1, ngpt)

    od = jnp.maximum(secg * taut, 0.0)
    atrans = 1.0 - jnp.exp(-od)
    tf = _tfn(od)

    plfrac = fracs
    blay = jnp.take(planklay, band_of_g, axis=-1)            # (..., L, ngpt)
    plev_g = jnp.take(planklev, band_of_g, axis=-1)          # (..., L+1, ngpt)
    dplankup = plev_g[..., 1:, :] - blay
    dplankdn = plev_g[..., :-1, :] - blay

    bbd = plfrac * (blay + tf * dplankdn)
    bbu = plfrac * (blay + tf * dplankup)

    if cldfrac is not None:
        # cldfrac/taucloud may be per-layer (ncbands=16 path, rtrn) or
        # per-g-point binary (McICA path, rtrnmc)
        per_g = cldfrac.ndim == taut.ndim
        cf = cldfrac if per_g else cldfrac[..., None]
        icld = cf >= 1.0e-6
        odcld = secg * (taucloud if per_g
                        else jnp.take(taucloud, band_of_g, axis=-1))
        odcld = jnp.where(icld, odcld, 0.0)
        abscld = 1.0 - jnp.exp(-odcld)
        efclfrac = abscld * cf
        odtot = od + odcld
        atot = 1.0 - jnp.exp(-odtot)
        tftot = _tfn(odtot)
        bbdtot = plfrac * (blay + tftot * dplankdn)
        bbutot = plfrac * (blay + tftot * dplankup)
        # linear recursion coefficients
        A = jnp.where(icld, 1.0 - atrans - efclfrac * (1.0 - atrans),
                      1.0 - atrans)
        gassrc_d = bbd * atrans
        Sd = jnp.where(icld, gassrc_d + cf * (bbdtot * atot - gassrc_d),
                       gassrc_d)
        gassrc_u = bbu * atrans
        Su = jnp.where(icld, gassrc_u + cf * (bbutot * atot - gassrc_u),
                       gassrc_u)
        anycld = jnp.any(icld, axis=-1)
    else:
        A = 1.0 - atrans
        Sd = bbd * atrans
        Su = bbu * atrans
        anycld = jnp.zeros(taut.shape[:-2] + (nl,), bool)

    # ---- downward scan: top layer (index nl-1) to bottom (0) ----
    mv = lambda a: jnp.moveaxis(a, -2, 0)      # layers to scan axis
    A_s, Sd_s, Su_s = mv(A), mv(Sd), mv(Su)
    atrans_s, bbd_s, bbu_s = mv(atrans), mv(bbd), mv(bbu)
    cld_s = jnp.moveaxis(anycld, -1, 0)

    zero = jnp.zeros_like(A[..., 0, :])
    seen0 = jnp.zeros(anycld.shape[:-1], bool)

    def down_step(carry, x):
        radld, radclrd, seen = carry
        a, s, at, bd, ic = x
        radld_n = a * radld + s
        seen_n = seen | ic
        clr = (1.0 - at) * radclrd + bd * at
        radclrd_n = jnp.where(seen_n[..., None], clr, radld_n)
        return (radld_n, radclrd_n, seen_n), (radld_n, radclrd_n)

    (radld_sfc, radclrd_sfc, seen_any), (drad, dclr) = jax.lax.scan(
        down_step, (zero, zero, seen0),
        (A_s[::-1], Sd_s[::-1], atrans_s[::-1], bbd_s[::-1], cld_s[::-1]))
    # drad[i] = downward radiance at the interface BELOW layer nl-1-i
    # → bottom-up interfaces 0..nl-1: drad reversed
    drad_bu = jnp.concatenate(
        [drad[::-1], jnp.zeros_like(drad[:1])], axis=0)     # (L+1, ..., ngpt)
    dclr_bu = jnp.concatenate([dclr[::-1], jnp.zeros_like(dclr[:1])], axis=0)

    return LwDownState(A=A, Su=Su, atrans=atrans, bbu=bbu, anycld=anycld,
                       seen_any=seen_any, radld_sfc=radld_sfc,
                       radclrd_sfc=radclrd_sfc, drad_bu=drad_bu,
                       dclr_bu=dclr_bu, fracs_sfc=fracs[..., 0, :])


def _spectral_integrate(r, band_of_g, delwave):
    dwave_g = jnp.take(jnp.asarray(delwave, r.dtype), band_of_g)
    w = WTDIFF * FLUXFAC * dwave_g
    r = jnp.moveaxis(r, 0, -2)                  # (..., L+1, ngpt)
    return jnp.sum(r * w, axis=-1)


def rtrn_up(st: LwDownState, plankbnd, semiss, band_of_g, delwave):
    """Upward half of rtrn: surface emission/reflection + surface-to-top
    scan + spectral integration. Returns bottom-up level fluxes."""
    mv = lambda a: jnp.moveaxis(a, -2, 0)
    A_s, Su_s = mv(st.A), mv(st.Su)
    atrans_s, bbu_s = mv(st.atrans), mv(st.bbu)
    cld_s = jnp.moveaxis(st.anycld, -1, 0)
    seen_any = st.seen_any

    pbnd_g = jnp.take(plankbnd, band_of_g, axis=-1)          # (..., ngpt)
    rad0 = st.fracs_sfc * pbnd_g
    semiss_g = jnp.take(semiss, band_of_g, axis=-1)
    reflect = 1.0 - semiss_g
    radlu0 = rad0 + reflect * st.radld_sfc
    radclru0 = rad0 + reflect * st.radclrd_sfc

    def up_step(carry, x):
        radlu, radclru = carry
        a, s, at, bu, ic = x
        radlu_n = a * radlu + s
        clr = (1.0 - at) * radclru + bu * at
        radclru_n = jnp.where(seen_any[..., None], clr, radlu_n)
        return (radlu_n, radclru_n), (radlu_n, radclru_n)

    (_, _), (urad, uclr) = jax.lax.scan(
        up_step, (radlu0, radclru0),
        (A_s, Su_s, atrans_s, bbu_s, cld_s))
    urad_bu = jnp.concatenate([radlu0[None], urad], axis=0)  # (L+1, ..., ngpt)
    uclr_bu = jnp.concatenate([radclru0[None], uclr], axis=0)

    return (_spectral_integrate(urad_bu, band_of_g, delwave),
            _spectral_integrate(st.drad_bu, band_of_g, delwave),
            _spectral_integrate(uclr_bu, band_of_g, delwave),
            _spectral_integrate(st.dclr_bu, band_of_g, delwave))


def rtrn_lw(taut, fracs, planklay, planklev, plankbnd, pwvcm, semiss,
            cldfrac, taucloud, band_of_g, delwave):
    """Full rtrn (down + up): all arrays bottom-up, (..., L, ngpt) for
    taut/fracs; planklev (..., L+1, 16) index 0 = surface; returns bottom-up
    level fluxes (..., L+1), surface first."""
    st = rtrn_down(taut, fracs, planklay, planklev, pwvcm, cldfrac,
                   taucloud, band_of_g)
    return rtrn_up(st, plankbnd, semiss, band_of_g, delwave)


# ---------------------------------------------------------------------------
# cloud optical depths (rrtmg_lw_cldprop.f90, inflag=2 iceflag=2 liqflag=1)
# ---------------------------------------------------------------------------

def cldprop_lw(cldfrac, clwp, ciwp, rel, rei, static):
    """Returns taucloud (..., L, 16); water paths g/m2, radii microns."""
    absice2 = jnp.asarray(static["absice2"], rel.dtype)    # (43, 16)
    absliq1 = jnp.asarray(static["absliq1"], rel.dtype)    # (58, 16)
    # ice (Streamer v3, iceflag=2): 5 <= rei <= 131
    radice = jnp.clip(rei, 5.0, 131.0)
    factor = (radice - 2.0) / 3.0
    idx = jnp.minimum(jnp.asarray(factor, jnp.int32), 42) - 1
    idx = jnp.clip(idx, 0, 41)
    fint = factor - (idx + 1)
    absco_ice = (absice2[idx] + fint[..., None]
                 * (absice2[idx + 1] - absice2[idx]))
    # liquid (Hu & Stamnes, liqflag=1): 2.5 <= rel <= 60
    radliq = jnp.clip(rel, 2.5, 60.0)
    lidx = jnp.clip(jnp.asarray(radliq - 1.5, jnp.int32), 1, 57) - 1
    lfint = radliq - 1.5 - (lidx + 1)
    absco_liq = (absliq1[lidx] + lfint[..., None]
                 * (absliq1[lidx + 1] - absliq1[lidx]))
    tau = (ciwp[..., None] * jnp.where(ciwp[..., None] > 0, absco_ice, 0.0)
           + clwp[..., None] * jnp.where(clwp[..., None] > 0, absco_liq, 0.0))
    return jnp.where(cldfrac[..., None] >= 1.0e-20, tau, 0.0)


def cldprop_lw_mcica(clwp_g, ciwp_g, rel, rei, static, band_of_g):
    """Per-g-point cloud optical depths for the McICA path: the absorption
    coefficients are per band (from rel/rei per layer), the binary water
    paths per g-point subcolumn. Returns tau (..., L, ngpt)."""
    absice2 = jnp.asarray(static["absice2"], rel.dtype)
    absliq1 = jnp.asarray(static["absliq1"], rel.dtype)
    radice = jnp.clip(rei, 5.0, 131.0)
    factor = (radice - 2.0) / 3.0
    idx = jnp.clip(jnp.minimum(jnp.asarray(factor, jnp.int32), 42) - 1, 0, 41)
    fint = factor - (idx + 1)
    absco_ice = (absice2[idx] + fint[..., None]
                 * (absice2[idx + 1] - absice2[idx]))
    radliq = jnp.clip(rel, 2.5, 60.0)
    lidx = jnp.clip(jnp.asarray(radliq - 1.5, jnp.int32), 1, 57) - 1
    lfint = radliq - 1.5 - (lidx + 1)
    absco_liq = (absliq1[lidx] + lfint[..., None]
                 * (absliq1[lidx + 1] - absliq1[lidx]))
    ice_g = jnp.take(absco_ice, band_of_g, axis=-1)
    liq_g = jnp.take(absco_liq, band_of_g, axis=-1)
    return ciwp_g * ice_g + clwp_g * liq_g


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RRTMGLwConfig:
    co2vmr: float = 300.0e-6
    n2ovmr: float = 0.0
    ch4vmr: float = 0.0
    o2vmr: float = 0.209488
    covmr: float = 0.0
    ccl4vmr: float = 0.0
    cfc11vmr: float = 0.0
    cfc12vmr: float = 0.0
    cfc22vmr: float = 0.0
    emissivity: float = 1.0   # broadband surface emissivity (Isca: emis=1)
    grav: float = 9.80
    cp_air: float = 1004.64


class RRTMGLw:
    """Longwave radiative transfer driver.

    All inputs level-LAST, TOP-DOWN; internals flip to the reference's
    bottom-up layer order.  kg tables load from isca_tpu/data/rrtmg_lw_kg.npz
    (build with tools/extract_rrtmg_lw.py + AER's rrtmg_lw.nc) or from an
    explicit `kg` dict/npz path (tests use synthetic tables)."""

    def __init__(self, config: RRTMGLwConfig = RRTMGLwConfig(), kg=None):
        self.config = config
        self.static = _Static()
        if kg is None:
            if not KG_NPZ.exists():
                raise FileNotFoundError(
                    f"{KG_NPZ} missing - run tools/extract_rrtmg_lw.py with "
                    "AER's rrtmg_lw.nc (same external data the reference "
                    "loads at runtime, rrtmg_lw_read_nc.f90:34)")
            kg = dict(np.load(KG_NPZ))
        elif isinstance(kg, (str, Path)):
            kg = dict(np.load(kg))
        self.kg = {k: np.asarray(v) for k, v in kg.items()}
        if int(np.asarray(self.kg.get("synthetic", 0))) == 1:
            # loud, every construction: LW fluxes from synthetic k-tables are
            # structurally correct but NOT AER-accurate; flagship claims that
            # depend on LW must stay labeled (VERDICT round 1, missing #7)
            import warnings
            warnings.warn(
                "RRTMG-LW is running on SYNTHETIC k-distribution tables "
                "(isca_tpu/data/rrtmg_lw_kg.npz, synthetic=1). Fluxes are "
                "physically plausible but not AER-accurate. Rebuild the npz "
                "from AER's rrtmg_lw.nc (tools/extract_rrtmg_lw.py) for "
                "production longwave.", RuntimeWarning, stacklevel=2)
        bidx = []
        for i, n in enumerate(NGC):
            bidx += [i] * n
        self.band_of_g = jnp.asarray(np.array(bidx, np.int32))

    def down_phase(self, p_half, p_full, t_full, t_half, q, o3,
                   cldfrac=None, clwp=None, ciwp=None, rel=None, rei=None,
                   co2vmr=None, mcica_key=None):
        """t_surf-independent computation: column amounts, setcoef, taumol,
        cloud optics and the downward rtrn pass.  Returns (lw_down top-down
        (..., L+1), stash) — complete with `up_phase(stash, t_surf)`."""
        cfg = self.config
        flip = lambda a: jnp.flip(a, axis=-1)
        pavel = flip(p_full) * 1e-2
        tavel = flip(t_full)
        pz = flip(p_half) * 1e-2                      # (..., L+1), sfc first
        tz = flip(t_half)
        h2ovmr = flip(q / (1.0 - q)) * (AMD / AMW)
        o3vmr = flip(o3) * (AMD / 47.9982)
        co2 = cfg.co2vmr if co2vmr is None else co2vmr

        amm = (1.0 - h2ovmr) * AMD + h2ovmr * AMW
        coldry = ((pz[..., :-1] - pz[..., 1:]) * 1.0e3 * AVOGAD
                  / (1.0e2 * GRAV_CGS * amm * (1.0 + h2ovmr)))
        one = jnp.ones_like(coldry)
        vmr = {"h2o": h2ovmr, "co2": co2 * one, "o3": o3vmr,
               "n2o": cfg.n2ovmr * one, "co": cfg.covmr * one,
               "ch4": cfg.ch4vmr * one, "o2": cfg.o2vmr * one}
        wkl = {k: v * coldry for k, v in vmr.items()}
        summol = sum(vmr[k] for k in ("co2", "o3", "n2o", "co", "ch4", "o2"))
        wbrodl = coldry * (1.0 - summol)

        # precipitable water (inatm, rrtmg_lw_rad.nomcica.f90:835-845)
        amttl = jnp.sum(coldry + wkl["h2o"], axis=-1)
        wvttl = jnp.sum(wkl["h2o"], axis=-1)
        wvsh = (AMW * wvttl) / (AMD * amttl)
        pwvcm = wvsh * (1.0e3 * pz[..., 0]) / (1.0e2 * GRAV_CGS)

        wx_vmr = {"ccl4": cfg.ccl4vmr * one, "cfc11": cfg.cfc11vmr * one,
                  "cfc12": cfg.cfc12vmr * one, "cfc22": cfg.cfc22vmr * one}

        semiss = cfg.emissivity * jnp.ones(16, pavel.dtype)
        # tbound only affects plankbnd (used in up_phase); pass a dummy here
        c = setcoef_lw(pavel, tavel, tz, tz[..., 0], wkl, wbrodl, coldry,
                       wx_vmr, semiss, self.static)
        # taumol needs pavel for the band-1/2 pressure corrections
        c.col["pavel"] = pavel
        taug, fracs = taumol_lw(c, self.kg, self.static)

        taucloud = None
        cldf_bu = None
        if cldfrac is not None:
            if mcica_key is not None:
                # McICA: one binary stochastic subcolumn per g-point
                # (rrtmg_lw_rad.f90 + mcica_subcol_gen_lw.f90 path)
                from isca_tpu.physics.mcica import mcica_subcol
                cldf_g, clwp_g, ciwp_g = mcica_subcol(
                    mcica_key, cldfrac, clwp, ciwp, NGPT)
                flipl = lambda a: jnp.flip(a, axis=-2)
                cldf_bu = flipl(cldf_g)
                taucloud = cldprop_lw_mcica(
                    flipl(clwp_g), flipl(ciwp_g), flip(rel), flip(rei),
                    self.static, self.band_of_g)
            else:
                cldf_bu = flip(cldfrac)
                taucloud = cldprop_lw(cldf_bu, flip(clwp), flip(ciwp),
                                      flip(rel), flip(rei), self.static)

        st = rtrn_down(taug, fracs, c.planklay, c.planklev, pwvcm,
                       cldf_bu, taucloud, self.band_of_g)
        dflx = _spectral_integrate(st.drad_bu, self.band_of_g,
                                   self.static["delwave"])
        stash = dict(st=st, semiss=semiss, p_half=p_half)
        return flip(dflx), stash

    def up_phase(self, stash, t_surf) -> LwFluxes:
        """Surface emission with the (possibly updated) t_surf + upward pass
        + heating rates."""
        cfg = self.config
        flip = lambda a: jnp.flip(a, axis=-1)
        semiss = stash["semiss"]
        totplnk = jnp.asarray(self.static["totplnk"], t_surf.dtype)
        plankbnd = semiss * _plnk_interp(totplnk, t_surf)
        uflx, dflx, uflxc, dflxc = rtrn_up(
            stash["st"], plankbnd, semiss, self.band_of_g,
            self.static["delwave"])
        p_half = stash["p_half"]
        uflx_td, dflx_td = flip(uflx), flip(dflx)
        uflxc_td, dflxc_td = flip(uflxc), flip(dflxc)

        fnet = uflx_td - dflx_td
        fnetc = uflxc_td - dflxc_td
        dp = p_half[..., 1:] - p_half[..., :-1]
        # heating = flux convergence: +(Fnet below - Fnet above)/dp * g/cp
        hr = (cfg.grav / cfg.cp_air) * (fnet[..., 1:] - fnet[..., :-1]) / dp
        hrc = (cfg.grav / cfg.cp_air) * (fnetc[..., 1:] - fnetc[..., :-1]) / dp
        return LwFluxes(uflx=uflx_td, dflx=dflx_td, uflxc=uflxc_td,
                        dflxc=dflxc_td, hr=hr, hrc=hrc,
                        olr=uflx_td[..., 0],
                        lw_dn_surf=dflx_td[..., -1],
                        lw_dn_surf_clr=dflxc_td[..., -1])

    def __call__(self, p_half, p_full, t_full, t_half, t_surf, q, o3,
                 cldfrac=None, clwp=None, ciwp=None, rel=None, rei=None,
                 co2vmr=None, mcica_key=None) -> LwFluxes:
        """p in Pa; q specific humidity [kg/kg]; o3 mass mixing ratio;
        t_half (..., L+1) level temperatures (top-down); t_surf (...).
        Cloud water paths [g/m2] and effective radii [microns], top-down.
        With `mcica_key`, clouds are sampled stochastically per g-point
        (McICA) instead of the ncbands=16 fractional-overlap path."""
        _, stash = self.down_phase(p_half, p_full, t_full, t_half, q, o3,
                                   cldfrac=cldfrac, clwp=clwp, ciwp=ciwp,
                                   rel=rel, rei=rei, co2vmr=co2vmr,
                                   mcica_key=mcica_key)
        return self.up_phase(stash, t_surf)
