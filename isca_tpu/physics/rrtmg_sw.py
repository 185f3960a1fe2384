"""RRTMG-SW: correlated-k shortwave radiation, TPU-native.

Re-implementation of the AER RRTMG-SW column model vendored in the reference:
  - src/atmos_param/rrtm_radiation/rrtmg_sw/gcm_model/src/rrtmg_sw_setcoef.f90
    (setcoef_sw: pressure/temperature interpolation indices, column amounts)
  - .../rrtmg_sw_taumol.f90 (taumol16..29: per-band optical depths from the
    correlated-k tables; g-point batched here)
  - .../rrtmg_sw_reftra.f90 (two-stream delta-Eddington reflectance/
    transmittance, kmodts=2 PIFM)
  - .../rrtmg_sw_vrtqdr.f90 (vertical adding/doubling of layer properties)
  - .../rrtmg_sw_spcvrt.f90 (spectral loop, delta scaling, direct beam,
    flux assembly)
  - .../rrtmg_sw_rad.nomcica.f90 (column amounts from vmr profiles)

The k-distribution tables are the reference's own vendored data
(rrtmg_sw_k_g.f90), extracted to `isca_tpu/data/rrtmg_sw.npz` by
tools/extract_rrtmg_sw.py with the 224->112 g-point reduction applied at
extraction time (cmbgb16s..29 in rrtmg_sw_init.f90).

TPU-native design: the reference loops over columns, layers and g-points;
here every (column, layer, g-point) is batched: table lookups are vectorized
gathers, the two-stream is closed-form elementwise math, and only the
adding/doubling is sequential (three `lax.scan`s over the small level axis,
batched over columns x 112 g-points). The troposphere/stratosphere split
(laytrop) becomes a per-layer mask with both table regions evaluated and
selected. Deviations: exact `exp` instead of the reference's Pade lookup
table (exp_tbl) — faster than a gather on TPU and more accurate.

Layer index convention inside this module: axis -1 over layers, index 0 =
BOTTOM (surface), matching the reference's lay=1..nlayers; the public wrapper
accepts the framework's top-down arrays and flips.

Compile-time note: the full graph (14 per-band taumol subgraphs + the
g-point-batched adding scans) takes minutes to compile on a TPU backend the
first time; the package enables JAX's persistent compilation cache so this is
a once-per-machine cost. A planned optimization is a uniform padded-band
formulation (scan over bands with ng padded to 12 and shared gather shapes)
that shrinks the HLO ~10x.
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from isca_tpu.physics.rrtmg_lw import _wsum

DATA = Path(__file__).resolve().parent.parent / "data" / "rrtmg_sw.npz"

NBND = 14
NGPT = 112
NGC = [6, 12, 8, 8, 10, 10, 2, 10, 8, 6, 6, 8, 6, 12]
RRSW_SCON = 1.36822e3        # W/m2 (parrrsw.f90:115)
AMD = 28.9660                # g/mol dry air
AMW = 18.0160                # g/mol water vapor
AVOGAD = 6.02214199e23
GRAV_CGS = 9.8066

# per-band recipe entries (verified against rrtmg_sw_taumol.f90):
#   lo: ('2key', sp1, sp2, strrat) | ('1key', sp) | 'none'
#   up: same, or 'zero'
#   layreffr, solfr_region ('lower'|'upper'), sflux interp ('1d'|'lo_js'|'up_js')
#   minor terms handled explicitly in _taumol_band.
BAND_META = {
    16: dict(lo=("2key", "h2o", "ch4", 252.131), up=("1key", "ch4"),
             layreffr=18, solfr="upper", sflux="1d", self_lo=True, for_lo=True,
             for_up=False),
    17: dict(lo=("2key", "h2o", "co2", 0.364641), up=("2key5", "h2o", "co2", 0.364641),
             layreffr=30, solfr="upper", sflux="up_js", self_lo=True, for_lo=True,
             for_up=True),
    18: dict(lo=("2key", "h2o", "ch4", 38.9589), up=("1key", "ch4"),
             layreffr=6, solfr="lower", sflux="lo_js", self_lo=True, for_lo=True,
             for_up=False),
    19: dict(lo=("2key", "h2o", "co2", 5.49281), up=("1key", "co2"),
             layreffr=3, solfr="lower", sflux="lo_js", self_lo=True, for_lo=True,
             for_up=False),
    20: dict(lo=("1key", "h2o"), up=("1key", "h2o"),
             layreffr=3, solfr="lower", sflux="1d", self_lo=True, for_lo=True,
             for_up=True),
    21: dict(lo=("2key", "h2o", "co2", 0.0045321), up=("2key5", "h2o", "co2", 0.0045321),
             layreffr=8, solfr="lower", sflux="lo_js", self_lo=True, for_lo=True,
             for_up=True),
    22: dict(lo=("2key", "h2o", "o2", 0.022708 * 1.6), up=("1key", "o2"),
             layreffr=2, solfr="lower", sflux="lo_js", self_lo=True, for_lo=True,
             for_up=False),
    23: dict(lo=("1key", "h2o"), up="zero",
             layreffr=6, solfr="lower", sflux="1d", self_lo=True, for_lo=True,
             for_up=False),
    24: dict(lo=("2key", "h2o", "o2", 0.124692), up=("1key", "o2"),
             layreffr=1, solfr="lower", sflux="lo_js", self_lo=True, for_lo=True,
             for_up=False),
    25: dict(lo=("1key", "h2o"), up="zero",
             layreffr=2, solfr="lower", sflux="1d", self_lo=False, for_lo=False,
             for_up=False),
    26: dict(lo="zero", up="zero",
             layreffr=0, solfr="laytrop", sflux="1d", self_lo=False,
             for_lo=False, for_up=False),
    27: dict(lo=("1key", "o3"), up=("1key", "o3"),
             layreffr=32, solfr="upper", sflux="1d", self_lo=False,
             for_lo=False, for_up=False),
    28: dict(lo=("2key", "o3", "o2", 6.67029e-7), up=("2key5", "o3", "o2", 6.67029e-7),
             layreffr=58, solfr="upper", sflux="up_js", self_lo=False,
             for_lo=False, for_up=False),
    29: dict(lo=("1key", "h2o"), up=("1key", "co2"),
             layreffr=49, solfr="upper", sflux="1d", self_lo=True, for_lo=True,
             for_up=False),
}


@dataclasses.dataclass(frozen=True)
class RRTMGSwConfig:
    scon: float = 1368.22          # solar constant [W/m2]
    co2vmr: float = 300.0e-6
    ch4vmr: float = 0.0
    n2ovmr: float = 0.0
    o2vmr: float = 0.209488
    cp_air: float = 1004.64
    grav: float = 9.80


class SwFluxes(NamedTuple):
    swdflx: jax.Array      # (..., L+1) downward flux, TOP-DOWN half levels
    swuflx: jax.Array      # (..., L+1) upward flux
    swdflxc: jax.Array     # clear-sky downward
    swuflxc: jax.Array     # clear-sky upward
    swhr: jax.Array        # (..., L) heating rate [K/s], top-down
    dirdflx: jax.Array     # (..., L+1) direct-beam downward


class _Tables:
    """Loads the reduced k-tables once; values as f32 jnp constants."""

    _cache = None

    def __new__(cls):
        if cls._cache is None:
            cls._cache = super().__new__(cls)
            d = np.load(DATA)
            store = {}
            for k in d.files:
                store[k] = jnp.asarray(d[k].astype(np.float32))
            cls._cache.t = store
        return cls._cache

    def band(self, b, name, default=None):
        key = f"b{b}_{name}"
        if key in self.t:
            return self.t[key]
        return default


# ---------------------------------------------------------------------------
# setcoef (rrtmg_sw_setcoef.f90:40-287)
# ---------------------------------------------------------------------------

class SetcoefResult(NamedTuple):
    tropo: jax.Array      # bool (..., L): plog > 4.56 (troposphere)
    laytrop: jax.Array    # int (...,): number of tropospheric layers
    jp: jax.Array         # int 0-based (1..58)-1
    jt: jax.Array
    jt1: jax.Array
    fac00: jax.Array
    fac01: jax.Array
    fac10: jax.Array
    fac11: jax.Array
    fs_cache: dict
    col: dict             # colh2o, colco2, colo3, colch4, colo2, colmol
    selffac: jax.Array
    selffrac: jax.Array
    indself: jax.Array    # 0-based
    forfac: jax.Array
    forfrac: jax.Array
    indfor: jax.Array     # 0-based


def setcoef_sw(pavel, tavel, wkl, coldry, preflog, tref):
    """pavel [hPa], tavel [K], wkl dict of molecular columns, bottom-up."""
    stpfac = 296.0 / 1013.0
    plog = jnp.log(pavel)
    jp = jnp.clip((36.0 - 5.0 * (plog + 0.04)).astype(jnp.int32), 1, 58) - 1
    jp1 = jp + 1
    fp = 5.0 * (preflog[jp] - plog)

    tref_jp = tref[jp]
    jt = jnp.clip((3.0 + (tavel - tref_jp) / 15.0).astype(jnp.int32), 1, 4) - 1
    ft = (tavel - tref_jp) / 15.0 - (jt + 1 - 3)
    tref_jp1 = tref[jp1]
    jt1 = jnp.clip((3.0 + (tavel - tref_jp1) / 15.0).astype(jnp.int32), 1, 4) - 1
    ft1 = (tavel - tref_jp1) / 15.0 - (jt1 + 1 - 3)

    water = wkl["h2o"] / coldry
    scalefac = pavel * stpfac / tavel
    tropo = plog > 4.56
    laytrop = jnp.sum(tropo, axis=-1)

    forfac = scalefac / (1.0 + water)
    factor_t = (332.0 - tavel) / 36.0
    indfor_lo = jnp.clip(factor_t.astype(jnp.int32), 1, 2)
    forfrac_lo = factor_t - indfor_lo
    factor_s = (tavel - 188.0) / 36.0
    indfor = jnp.where(tropo, indfor_lo, 3) - 1
    forfrac = jnp.where(tropo, forfrac_lo, factor_s - 1.0)

    selffac = jnp.where(tropo, water * forfac, 0.0)
    factor2 = (tavel - 188.0) / 7.2
    indself = jnp.where(
        tropo, jnp.clip(factor2.astype(jnp.int32) - 7, 1, 9), 1) - 1
    selffrac = jnp.where(tropo, factor2 - (indself + 1 + 7), 0.0)

    col = {}
    for name in ("h2o", "co2", "o3", "n2o", "ch4", "o2"):
        c = 1.0e-20 * wkl[name]
        if name in ("co2", "n2o", "ch4", "o2"):
            c = jnp.where(c == 0.0, 1.0e-32 * coldry, c)
        col[name] = c
    col["mol"] = 1.0e-20 * coldry + col["h2o"]

    compfp = 1.0 - fp
    return SetcoefResult(
        tropo=tropo, laytrop=laytrop, jp=jp, jt=jt, jt1=jt1,
        fac00=compfp * (1.0 - ft), fac10=compfp * ft,
        fac01=fp * (1.0 - ft1), fac11=fp * ft1,
        fs_cache={}, col=col,
        selffac=selffac, selffrac=selffrac, indself=indself,
        forfac=forfac, forfrac=forfrac, indfor=indfor)


# ---------------------------------------------------------------------------
# taumol (rrtmg_sw_taumol.f90)
# ---------------------------------------------------------------------------

ONEMINUS = 1.0 - 1.0e-6


def _species_frac(c, col1, col2, strrat, nmult):
    """Binary species parameter -> (speccomb, js 0-based, fs)."""
    speccomb = col1 + strrat * col2
    specparm = jnp.minimum(col1 / speccomb, ONEMINUS)
    specmult = nmult * specparm
    js = specmult.astype(jnp.int32)        # 0-based (Fortran js-1)
    fs = specmult - js
    return speccomb, js, fs


# Table interpolation as one-hot weighted matmuls on the MXU (same design as
# rrtmg_lw taumol): the (p,T) 4-point interpolant is identical across all 14
# bands, so its one-hot weight matrix over the flattened (jt,jp) row space is
# built once per taumol call and every band's lookup becomes W @ table.
# Out-of-region rows (lower weights in the stratosphere) follow the clamped
# gather they replace; both regions are masked by `tropo` before use.

class _SwWeights(NamedTuple):
    q_lo: jax.Array    # (..., L, 65)  lower-region (jt*13+jp) interpolant
    q_up: jax.Array    # (..., L, 235) upper-region (jt*47+jp0) interpolant
    selfw: jax.Array   # (..., L, 10)  self continuum incl. selffac
    forw3: jax.Array   # (..., L, 3)   foreign continuum incl. forfac
    forw4: jax.Array   # (..., L, 4)


def _build_sw_weights(c: "SetcoefResult") -> _SwWeights:
    dt = c.fac00.dtype
    jp = jnp.minimum(c.jp, 12)            # clamp like the gathers it replaces
    jpp = jnp.minimum(jp + 1, 12)
    q_lo = _wsum([(c.jt * 13 + jp, c.fac00), ((c.jt + 1) * 13 + jp, c.fac10),
                  (c.jt1 * 13 + jpp, c.fac01),
                  ((c.jt1 + 1) * 13 + jpp, c.fac11)], 65, dt)
    jp0 = jnp.clip(c.jp - 12, 0, 46)      # kb row for ind0 (jp-13 Fortran 1b)
    jp1 = jnp.clip(c.jp - 11, 0, 46)      # kb row for ind1
    q_up = _wsum([(c.jt * 47 + jp0, c.fac00), ((c.jt + 1) * 47 + jp0, c.fac10),
                  (c.jt1 * 47 + jp1, c.fac01),
                  ((c.jt1 + 1) * 47 + jp1, c.fac11)], 235, dt)
    selfw = c.selffac[..., None] * _wsum(
        [(c.indself, 1.0 - c.selffrac), (c.indself + 1, c.selffrac)], 10, dt)
    def forw(n):
        return c.forfac[..., None] * _wsum(
            [(c.indfor, 1.0 - c.forfrac),
             (jnp.minimum(c.indfor + 1, n - 1), c.forfrac)], n, dt)
    return _SwWeights(q_lo=q_lo, q_up=q_up, selfw=selfw,
                      forw3=forw(3), forw4=forw(4))


def _js_weights(js, fs, nspa, dt):
    """Species-dimension 2-point interpolation weights (..., L, nspa)."""
    return _wsum([(js, 1.0 - fs), (js + 1, fs)], nspa, dt)


def _interp_lower_2key(ka, W, wj):
    """8-term interpolation on ka(9,5,13,ng): shared (p,T) one-hot x
    per-band species weights over the factorized (9, 65, ng) row space."""
    tab = jnp.asarray(ka).reshape(9, 65, -1)
    return jnp.einsum("...q,...j,jqg->...g", W.q_lo, wj, tab)


def _interp_lower_1key(ka, W):
    """4-term interpolation on ka(5,13,ng) as one matmul."""
    return W.q_lo @ jnp.asarray(ka).reshape(65, -1)


def _interp_upper_1key(kb, W):
    """kb(5,47,ng) upper-region interpolation as one matmul."""
    return W.q_up @ jnp.asarray(kb).reshape(235, -1)


def _interp_upper_2key5(kb, W, wj):
    """kb(5,5,47,ng) with 5-point species parameter (bands 17,21,28)."""
    tab = jnp.asarray(kb).reshape(5, 235, -1)
    return jnp.einsum("...q,...j,jqg->...g", W.q_up, wj, tab)


def _continuum(W, selfref, forref, with_self):
    """H2O self+foreign continuum terms, x colh2o outside."""
    for_term = (W.forw3 if forref.shape[0] == 3 else W.forw4) @ forref
    if not with_self:
        return for_term
    return W.selfw @ selfref + for_term


def _laysolfr(meta, c):
    """Per-column solar-source layer index (bottom-up, 0-based)."""
    jp_f = c.jp + 1                       # Fortran 1-based
    L = jp_f.shape[-1]
    layreffr = meta["layreffr"]
    laytrop_idx = jnp.maximum(c.laytrop - 1, 0)
    if meta["solfr"] == "laytrop":
        return laytrop_idx
    if meta["solfr"] == "lower":
        cross = (jp_f[..., :-1] < layreffr) & (jp_f[..., 1:] >= layreffr)
        any_cross = jnp.any(cross, axis=-1)
        first = jnp.argmax(cross, axis=-1) + 1
        return jnp.where(any_cross,
                         jnp.minimum(first, laytrop_idx), laytrop_idx)
    # upper: default top layer
    cross = (jp_f[..., :-1] < layreffr) & (jp_f[..., 1:] >= layreffr)
    any_cross = jnp.any(cross, axis=-1)
    first = jnp.argmax(cross, axis=-1) + 1
    return jnp.where(any_cross, first, L - 1)


def taumol_sw(c: SetcoefResult, tables: _Tables):
    """Returns taug, taur (..., L, 112) bottom-up and sfluxzen (..., 112)."""
    col = c.col
    W = _build_sw_weights(c)
    taugs, taurs, sfluxes = [], [], []
    for b in range(16, 30):
        meta = BAND_META[b]
        ka = tables.band(b, "ka")
        kb = tables.band(b, "kb")
        selfref = tables.band(b, "selfref")
        forref = tables.band(b, "forref")
        sfluxref = tables.band(b, "sfluxref")
        rayl = tables.band(b, "rayl")
        ng = NGC[b - 16]
        dtype = col["h2o"].dtype
        shape_g = col["h2o"].shape + (ng,)

        js_lo = fs_lo = js_up = fs_up = wj_lo = None
        # ---- lower (troposphere) optical depth ----
        if meta["lo"] == "zero":
            taug_lo = jnp.zeros(shape_g, dtype)
        elif meta["lo"][0] == "2key":
            _, sp1, sp2, strrat = meta["lo"]
            speccomb, js_lo, fs_lo = _species_frac(c, col[sp1], col[sp2],
                                                   strrat, 8.0)
            wj_lo = _js_weights(js_lo, fs_lo, 9, dtype)
            taug_lo = speccomb[..., None] * _interp_lower_2key(ka, W, wj_lo)
        else:  # 1key
            sp = meta["lo"][1]
            base = _interp_lower_1key(ka, W)
            if b == 23:
                base = 1.029 * base       # givfac (taumol23)
            taug_lo = col[sp][..., None] * base

        if meta["self_lo"] or meta["for_lo"]:
            cont = _continuum(W, selfref, forref, meta["self_lo"])
            taug_lo = taug_lo + col["h2o"][..., None] * cont

        # band-specific minor absorbers, lower
        if b == 20:
            taug_lo = taug_lo + col["ch4"][..., None] * tables.band(20, "absch4")
        if b == 22:
            o2cont = 4.35e-4 * col["o2"] / 700.0
            taug_lo = taug_lo + o2cont[..., None]
        if b == 24:
            taug_lo = taug_lo + col["o3"][..., None] * tables.band(24, "abso3a")
        if b == 25:
            taug_lo = taug_lo + col["o3"][..., None] * tables.band(25, "abso3a")
        if b == 29:
            taug_lo = taug_lo + col["co2"][..., None] * tables.band(29, "absco2")

        # ---- upper (stratosphere) optical depth ----
        if meta["up"] == "zero":
            taug_up = jnp.zeros(shape_g, dtype)
        elif meta["up"][0] == "2key5":
            _, sp1, sp2, strrat = meta["up"]
            speccomb, js_up, fs_up = _species_frac(c, col[sp1], col[sp2],
                                                   strrat, 4.0)
            wj_up = _js_weights(js_up, fs_up, 5, dtype)
            taug_up = speccomb[..., None] * _interp_upper_2key5(kb, W, wj_up)
        else:
            sp = meta["up"][1]
            base = _interp_upper_1key(kb, W)
            if b == 22:
                base = 1.6 * base         # o2adj
            taug_up = col[sp][..., None] * base

        if meta["for_up"]:
            for_term = _continuum(W, selfref, forref, with_self=False)
            taug_up = taug_up + col["h2o"][..., None] * for_term
        if b == 22:
            taug_up = taug_up + (4.35e-4 * col["o2"] / 700.0)[..., None]
        if b == 24:
            taug_up = taug_up + col["o3"][..., None] * tables.band(24, "abso3b")
        if b == 25:
            taug_up = col["o3"][..., None] * tables.band(25, "abso3b")
        if b == 29:
            taug_up = taug_up + col["h2o"][..., None] * tables.band(29, "absh2o")
        if b == 20:
            taug_up = taug_up + col["ch4"][..., None] * tables.band(20, "absch4")

        taug = jnp.where(c.tropo[..., None], taug_lo, taug_up)

        # ---- Rayleigh ----
        if b == 24:
            rayla = tables.band(24, "rayla")     # (ng, 9)
            raylb = tables.band(24, "raylb")
            ra = wj_lo @ rayla.T
            taur = col["mol"][..., None] * jnp.where(
                c.tropo[..., None], ra, raylb)
        elif rayl.ndim == 0:
            taur = col["mol"][..., None] * rayl * jnp.ones((ng,), dtype)
        else:
            taur = col["mol"][..., None] * rayl

        # ---- solar source at laysolfr ----
        lsf = _laysolfr(meta, c)
        take_s = lambda a: jnp.take_along_axis(a, lsf[..., None], axis=-1)[..., 0]
        if meta["sflux"] == "1d":
            sf = jnp.broadcast_to(sfluxref, col["h2o"].shape[:-1] + (ng,))
            if b == 27:
                sf = sf * (50.15 / 48.37)     # scalekur
        else:
            if meta["sflux"] == "lo_js":
                js_l, fs_l = take_s(js_lo), take_s(fs_lo)
            else:
                js_l, fs_l = take_s(js_up), take_s(fs_up)
            sfT = sfluxref.T               # (njs, ng)
            js_l = jnp.minimum(js_l, sfT.shape[0] - 2)
            sf = sfT[js_l] + fs_l[..., None] * (sfT[js_l + 1] - sfT[js_l])
        taugs.append(taug)
        taurs.append(taur)
        sfluxes.append(sf)
    return (jnp.concatenate(taugs, axis=-1), jnp.concatenate(taurs, axis=-1),
            jnp.concatenate(sfluxes, axis=-1))


# ---------------------------------------------------------------------------
# two-stream (rrtmg_sw_reftra.f90, kmodts=2 PIFM) — top-down layer arrays
# ---------------------------------------------------------------------------

def reftra_sw(tau, w0, g, mu0):
    """Returns (ref, refd, tra, trad) for direct/diffuse beams."""
    eps = 1e-8
    w0 = jnp.clip(w0, 0.0, 1.0)
    g = jnp.clip(g, 0.0, 1.0 - 1e-6)
    gamma1 = (8.0 - w0 * (5.0 + 3.0 * g)) * 0.25
    gamma2 = 3.0 * (w0 * (1.0 - g)) * 0.25
    gamma3 = (2.0 - 3.0 * g * mu0) * 0.25
    gamma4 = 1.0 - gamma3

    zwo = w0 / (1.0 - (1.0 - w0) * (g / (1.0 - g)) ** 2)
    conservative = zwo >= 0.9999995

    # --- conservative branch ---
    za = gamma1 * mu0
    za1 = za - gamma3
    zgt = gamma1 * tau
    ze1c = jnp.minimum(tau / mu0, 500.0)
    ze2c = jnp.exp(-ze1c)
    ref_c = jnp.clip((zgt - za1 * (1.0 - ze2c)) / (1.0 + zgt), 0.0, 1.0)
    tra_c = 1.0 - ref_c
    refd_c = zgt / (1.0 + zgt)
    trad_c = 1.0 - refd_c

    # --- non-conservative branch ---
    zrk = jnp.sqrt(jnp.maximum(gamma1**2 - gamma2**2, 1e-12))
    zrp = zrk * mu0
    zrp1, zrm1 = 1.0 + zrp, 1.0 - zrp
    zrk2 = 2.0 * zrk
    zrpp_raw = 1.0 - zrp * zrp
    # secular singularity mu0 ~ 1/k (reference relies on table rounding)
    zrpp = jnp.where(jnp.abs(zrpp_raw) < 1e-12,
                     jnp.sign(zrpp_raw + 1e-30) * 1e-12, zrpp_raw)
    zrkg = zrk + gamma1
    za1n = gamma1 * gamma4 + gamma2 * gamma3
    za2n = gamma1 * gamma3 + gamma2 * gamma4
    zr1 = zrm1 * (za2n + zrk * gamma3)
    zr2 = zrp1 * (za2n - zrk * gamma3)
    zr3 = zrk2 * (gamma3 - za2n * mu0)
    zr4 = zrpp * zrkg
    zr5 = zrpp * (zrk - gamma1)
    zt1 = zrp1 * (za1n + zrk * gamma4)
    zt2 = zrm1 * (za1n - zrk * gamma4)
    zt3 = zrk2 * (gamma4 + za1n * mu0)
    zbeta = (gamma1 - zrk) / zrkg

    # the reference caps the exponent at 500 (f64); cap at 40 so that the
    # zr*zep products stay finite in f32 (exp(40)~2.4e17, transmission
    # exp(-40) is zero to machine precision either way)
    ze1 = jnp.minimum(zrk * tau, 40.0)
    ze2 = jnp.minimum(tau / mu0, 40.0)
    zem1 = jnp.exp(-ze1)
    zep1 = jnp.exp(ze1)
    zem2 = jnp.exp(-ze2)
    zep2 = jnp.exp(ze2)
    zdenr = zr4 * zep1 + zr5 * zem1
    zdent = zr4 * zep1 + zr5 * zem1
    small_den = jnp.abs(zdenr) <= eps
    ref_n = jnp.where(
        small_den, eps,
        w0 * (zr1 * zep1 - zr2 * zem1 - zr3 * zem2)
        / jnp.where(small_den, 1.0, zdenr))
    tra_n = jnp.where(
        small_den, zem2,
        zem2 - zem2 * w0 * (zt1 * zep1 - zt2 * zem1 - zt3 * zep2)
        / jnp.where(small_den, 1.0, zdent))
    zemm = zem1 * zem1
    zdend = 1.0 / ((1.0 - zbeta * zemm) * zrkg)
    refd_n = gamma2 * (1.0 - zemm) * zdend
    trad_n = zrk2 * zem1 * zdend

    ref = jnp.where(conservative, ref_c, ref_n)
    tra = jnp.where(conservative, tra_c, tra_n)
    refd = jnp.where(conservative, refd_c, refd_n)
    trad = jnp.where(conservative, trad_c, trad_n)
    return ref, refd, tra, trad


# ---------------------------------------------------------------------------
# vertical adding (rrtmg_sw_vrtqdr.f90) — top-down, scan over layers
# ---------------------------------------------------------------------------

def vrtqdr_sw(ref, refd, tra, trad, dbt, tdbt, alb_dir, alb_dif):
    """Layer arrays (..., L, g) top-down; tdbt (..., L+1, g); albedos
    (..., g).  Returns fd, fu at (..., L+1, g) levels.

    The layer axis is second-to-last so the g-point axis stays minor-most
    (112 of 128 lanes) throughout; a single moveaxis feeds the scans and no
    (..., g, L) intermediates (25/128 lanes) are ever materialized.
    """
    mv = lambda a: jnp.moveaxis(a, -2, 0)

    # up sweep: rup/rupd from surface upward
    def up_step(carry, x):
        rup, rupd = carry
        rf, rfd, tr, trd, db = x
        reflect = 1.0 / (1.0 - rupd * rfd)
        rup_new = rf + (trd * ((tr - db) * rupd + db * rup)) * reflect
        rupd_new = rfd + trd * trd * rupd * reflect
        return (rup_new, rupd_new), (rup_new, rupd_new)

    xs = (mv(ref), mv(refd), mv(tra), mv(trad), mv(dbt))
    xs_rev = jax.tree_util.tree_map(lambda a: jnp.flip(a, 0), xs)
    (_, _), (rup_rev, rupd_rev) = jax.lax.scan(
        up_step, (alb_dir, alb_dif), xs_rev)
    # levels 0..L: rup[L] = albedo; rup[k] from scan (reversed)
    rup = jnp.concatenate(
        [jnp.flip(rup_rev, 0), alb_dir[None]], axis=0)
    rupd = jnp.concatenate(
        [jnp.flip(rupd_rev, 0), alb_dif[None]], axis=0)

    # down sweep: tdn/rdnd from top downward
    def dn_step(carry, x):
        tdn, rdnd = carry
        rf, rfd, tr, trd, db, tdb = x
        reflect = 1.0 / (1.0 - rfd * rdnd)
        tdn_new = tdb * tr + (trd * ((tdn - tdb) + tdb * rf * rdnd)) * reflect
        rdnd_new = rfd + trd * trd * rdnd * reflect
        return (tdn_new, rdnd_new), (tdn_new, rdnd_new)

    one = jnp.ones_like(alb_dir)
    zero = jnp.zeros_like(alb_dir)
    xs_dn = xs + (mv(tdbt[..., :-1, :]),)
    (_, _), (tdn_scan, rdnd_scan) = jax.lax.scan(dn_step, (one, zero), xs_dn)
    tdn = jnp.concatenate([one[None], tdn_scan], axis=0)
    rdnd = jnp.concatenate([zero[None], rdnd_scan], axis=0)

    tdbt_lvl = mv(tdbt)
    reflect = 1.0 / (1.0 - rdnd * rupd)
    fu = (tdbt_lvl * rup + (tdn - tdbt_lvl) * rupd) * reflect
    fd = tdbt_lvl + (tdn - tdbt_lvl + tdbt_lvl * rup * rdnd) * reflect
    return jnp.moveaxis(fd, 0, -2), jnp.moveaxis(fu, 0, -2)


# ---------------------------------------------------------------------------
# full column solver
# ---------------------------------------------------------------------------

def _delta_scale(tau, w0, g):
    f = g * g
    wf = w0 * f
    tau_s = (1.0 - wf) * tau
    w0_s = (w0 - wf) / (1.0 - wf)
    g_s = (g - f) / (1.0 - f)
    return tau_s, w0_s, g_s


# ---------------------------------------------------------------------------
# fused Pallas solver: delta-scale + reftra + direct-beam transmission +
# both vrtqdr adding sweeps + flux combine in ONE HBM pass.
#
# The jnp path materializes ~15 (B, L, 112) intermediates (ref/refd/tra/
# trad/dbt/tdbt/scan stacks), ~2.3 GB of HBM traffic per call at T42L25;
# the fused kernel reads tau/w0/g (+cloud set) once and writes fd/fu/tdbt
# once with all carries held in VMEM (~0.6 GB).  The L=25 sweeps unroll as
# straight-line VPU code on (TB, 112) tiles.
# ---------------------------------------------------------------------------

def _reftra_level(tau, w0, g, mu0):
    """Delta-scale + reftra + direct transmission for ONE layer slice
    (TB, G); keeps the ~30 reftra temporaries at (TB, G) so VMEM stays
    small regardless of L."""
    tau, w0, g = _delta_scale(tau, w0, g)
    ref, refd, tra, trad = reftra_sw(tau, w0, g, mu0)
    dbt = jnp.exp(-jnp.minimum(tau / mu0, 500.0))
    return ref, refd, tra, trad, dbt


def _sw_flux_kernel_body(cloudy, L):
    """Kernel body: level loops are lax.fori_loop (NOT unrolled - Mosaic
    stack-allocates every unrolled iteration's temporaries, 25x the live
    set).  Scratch is (L, TB, G) so the dynamic level index rides the
    leading axis."""
    def kernel(*refs):
        if cloudy:
            (tauc_ref, w0c_ref, gc_ref, tauo_ref, w0o_ref, go_ref, cf_ref,
             mu0_ref, adir_ref, adif_ref, zinc_ref,
             swd_ref, swu_ref, dird_ref,
             ref_s, refd_s, tra_s, trad_s, dbt_s, rup_s, rupd_s,
             swd_t, swu_t, dird_t) = refs
        else:
            (tauc_ref, w0c_ref, gc_ref, mu0_ref, adir_ref, adif_ref,
             zinc_ref, swd_ref, swu_ref, dird_ref,
             ref_s, refd_s, tra_s, trad_s, dbt_s, rup_s, rupd_s,
             swd_t, swu_t, dird_t) = refs
        mu0 = mu0_ref[:]                               # (TB, 1)
        zinc = zinc_ref[:]                             # (TB, G)
        sl = lambda r, l: r[:, pl.ds(l, 1), :][:, 0, :]

        # stage 1: per-layer two-stream properties into VMEM scratch
        def stage1(l, _):
            ref, refd, tra, trad, dbt = _reftra_level(
                sl(tauc_ref, l), sl(w0c_ref, l), sl(gc_ref, l), mu0)
            if cloudy:
                ref_o, refd_o, tra_o, trad_o, dbt_o = _reftra_level(
                    sl(tauo_ref, l), sl(w0o_ref, l), sl(go_ref, l), mu0)
                cf = sl(cf_ref, l)
                ref = (1.0 - cf) * ref + cf * ref_o
                refd = (1.0 - cf) * refd + cf * refd_o
                tra = (1.0 - cf) * tra + cf * tra_o
                trad = (1.0 - cf) * trad + cf * trad_o
                dbt = (1.0 - cf) * dbt + cf * dbt_o
            ref_s[pl.ds(l, 1)] = ref[None]
            refd_s[pl.ds(l, 1)] = refd[None]
            tra_s[pl.ds(l, 1)] = tra[None]
            trad_s[pl.ds(l, 1)] = trad[None]
            dbt_s[pl.ds(l, 1)] = dbt[None]
            return 0
        jax.lax.fori_loop(0, L, stage1, 0)

        # stage 2: up sweep (surface -> top), rup/rupd per level to scratch
        rup_s[pl.ds(L, 1)] = adir_ref[:][None]
        rupd_s[pl.ds(L, 1)] = adif_ref[:][None]

        def stage2(i, carry):
            rup, rupd = carry
            l = L - 1 - i
            rf, rfd, tr, trd, db = (s[pl.ds(l, 1)][0] for s in
                                    (ref_s, refd_s, tra_s, trad_s, dbt_s))
            reflect = 1.0 / (1.0 - rupd * rfd)
            rup = rf + (trd * ((tr - db) * rupd + db * rup)) * reflect
            rupd = rfd + trd * trd * rupd * reflect
            rup_s[pl.ds(l, 1)] = rup[None]
            rupd_s[pl.ds(l, 1)] = rupd[None]
            return rup, rupd
        jax.lax.fori_loop(0, L, stage2, (adir_ref[:], adif_ref[:]))

        # stage 3: down sweep + per-level flux combine, reduced over g
        wsum = lambda f: jnp.sum(zinc * f, axis=-1, keepdims=True).T

        def combine(l, tdn, rdnd, tdb):
            rup = rup_s[pl.ds(l, 1)][0]
            rupd = rupd_s[pl.ds(l, 1)][0]
            reflect = 1.0 / (1.0 - rdnd * rupd)
            fu = (tdb * rup + (tdn - tdb) * rupd) * reflect
            fd = tdb + (tdn - tdb + tdb * rup * rdnd) * reflect
            swu_t[pl.ds(l, 1)] = wsum(fu)
            swd_t[pl.ds(l, 1)] = wsum(fd)
            dird_t[pl.ds(l, 1)] = wsum(tdb)

        one = jnp.ones_like(zinc)
        zero = jnp.zeros_like(zinc)
        combine(0, one, zero, one)

        def stage3(lm1, carry):
            tdn, rdnd, tdb = carry
            rf, rfd, tr, trd, db = (s[pl.ds(lm1, 1)][0] for s in
                                    (ref_s, refd_s, tra_s, trad_s, dbt_s))
            reflect = 1.0 / (1.0 - rfd * rdnd)
            tdn_new = tdb * tr + (trd * ((tdn - tdb)
                                         + tdb * rf * rdnd)) * reflect
            rdnd = rfd + trd * trd * rdnd * reflect
            tdb = tdb * db
            combine(lm1 + 1, tdn_new, rdnd, tdb)
            return tdn_new, rdnd, tdb
        jax.lax.fori_loop(0, L, stage3, (one, zero, one))

        # write accumulated (levels, TB) scratch as the (TB, L+1) block
        swd_ref[:] = swd_t[:L + 1].T
        swu_ref[:] = swu_t[:L + 1].T
        dird_ref[:] = dird_t[:L + 1].T
    return kernel


def _pallas_ok(dtype):
    """Gate for the experimental fused Pallas solve.

    Default OFF: measured on one v5e chip at T42L25 the XLA path runs the
    solve in ~8.7 ms while the Pallas kernel needs ~19.6 ms - the adding
    sweeps are a serial recurrence over L, and Mosaic either stack-allocates
    every unrolled iteration's temporaries (VMEM OOM above 48 batch rows) or
    pays ~us-scale fori_loop iteration overhead on the (TB, 112) tiles.  A
    streaming-DMA design (levels resident in HBM, wide batch tiles) is the
    known fix; until then XLA's scan is faster.  Set ISCA_SW_PALLAS=1 to
    experiment."""
    import os
    if os.environ.get("ISCA_SW_PALLAS") != "1":
        return False
    if dtype != jnp.float32:
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


def sw_solve(tau, w0, g, mu0, alb_dir_g, alb_dif_g, cloud=None):
    """Two-stream solve (jnp path): delta-scale + reftra_sw + vertical
    adding.  tau/w0/g: (..., L, G) PRE-delta-scaling; mu0 (..., 1, 1);
    albedos (..., G).  cloud = (tau_o, w0_o, g_o, cf) blends a total-sky
    property set by cloud fraction before the sweeps (spcvrt icpr=0).
    Returns (fd, fu, tdbt) at (..., L+1, G).
    """
    tau_s, w0_s, g_s = _delta_scale(tau, w0, g)
    ref, refd, tra, trad = reftra_sw(tau_s, w0_s, g_s, mu0)
    dbt = jnp.exp(-jnp.minimum(tau_s / mu0, 500.0))
    if cloud is not None:
        tau_o, w0_o, g_o, cf = cloud
        tau_os, w0_os, g_os = _delta_scale(tau_o, w0_o, g_o)
        ref_o, refd_o, tra_o, trad_o = reftra_sw(tau_os, w0_os, g_os, mu0)
        dbt_o = jnp.exp(-jnp.minimum(tau_os / mu0, 500.0))
        ref = (1.0 - cf) * ref + cf * ref_o
        refd = (1.0 - cf) * refd + cf * refd_o
        tra = (1.0 - cf) * tra + cf * tra_o
        trad = (1.0 - cf) * trad + cf * trad_o
        dbt = (1.0 - cf) * dbt + cf * dbt_o
    tdbt = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(dbt[..., :1, :]), dbt],
                        axis=-2), axis=-2)
    fd, fu = vrtqdr_sw(ref, refd, tra, trad, dbt, tdbt,
                       alb_dir_g, alb_dif_g)
    return fd, fu, tdbt


def sw_flux_solve(tau, w0, g, mu0, alb_dir_g, alb_dif_g, zincflx,
                  cloud=None, force_jnp=False, interpret=False):
    """Broadband two-stream fluxes: sw_solve + incident-flux-weighted
    g-point reduction, fused into one Pallas pass on TPU.

    Returns (swd, swu, dird), each (..., L+1) = sum_g zincflx * {fd,fu,tdbt}.
    """
    use_pallas = interpret or (not force_jnp and _pallas_ok(tau.dtype))
    if not use_pallas:
        fd, fu, tdbt = sw_solve(tau, w0, g, mu0, alb_dir_g, alb_dif_g,
                                cloud=cloud)
        wsum = lambda f: jnp.sum(zincflx[..., None, :] * f, axis=-1)
        return wsum(fd), wsum(fu), wsum(tdbt)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = tau.shape[:-2]
    L, G = tau.shape[-2], tau.shape[-1]
    B = int(np.prod(batch)) if batch else 1
    cloudy = cloud is not None
    TB = min(24 if cloudy else 48, -(-B // 8) * 8)
    Bp = -(-B // TB) * TB
    dt = tau.dtype

    def prep3(a):
        a = jnp.broadcast_to(a, batch + (L, G)).reshape(B, L, G)
        return jnp.pad(a, ((0, Bp - B), (0, 0), (0, 0)))

    def prep2(a):
        a = jnp.broadcast_to(a, batch + (G,)).reshape(B, G)
        return jnp.pad(a, ((0, Bp - B), (0, 0)))

    mu0_flat = jnp.broadcast_to(mu0, batch + (1, 1)).reshape(B, 1)
    mu0_flat = jnp.pad(mu0_flat, ((0, Bp - B), (0, 0)), constant_values=1.0)

    ins = [prep3(tau), prep3(w0), prep3(g)]
    if cloudy:
        tau_o, w0_o, g_o, cf = cloud
        ins += [prep3(tau_o), prep3(w0_o), prep3(g_o), prep3(cf)]
    ins += [mu0_flat, prep2(alb_dir_g), prep2(alb_dif_g), prep2(zincflx)]

    bs3 = pl.BlockSpec((TB, L, G), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    bs2 = pl.BlockSpec((TB, G), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bs1 = pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [bs3] * (7 if cloudy else 3) + [bs1, bs2, bs2, bs2]
    bso = pl.BlockSpec((TB, L + 1), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    out2 = jax.ShapeDtypeStruct((Bp, L + 1), dt)
    Lpad = -(-(L + 1) // 8) * 8      # per-level store scratch, sublane-tiled

    swd, swu, dird = pl.pallas_call(
        _sw_flux_kernel_body(cloudy, L),
        grid=(Bp // TB,),
        in_specs=in_specs,
        out_specs=(bso, bso, bso),
        out_shape=(out2, out2, out2),
        scratch_shapes=[pltpu.VMEM((L, TB, G), dt) for _ in range(5)]
        + [pltpu.VMEM((L + 1, TB, G), dt) for _ in range(2)]
        + [pltpu.VMEM((Lpad, TB), dt) for _ in range(3)],
        interpret=interpret,
    )(*ins)
    unpad = lambda a: a[:B].reshape(batch + (L + 1,))
    return unpad(swd), unpad(swu), unpad(dird)


class RRTMGSw:
    """Shortwave radiative transfer driver (spcvrt_sw equivalent).

    All inputs level-LAST, TOP-DOWN (framework convention); internals flip to
    the reference's bottom-up layer order for setcoef/taumol.
    """

    def __init__(self, config: RRTMGSwConfig = RRTMGSwConfig()):
        self.config = config
        self.tables = _Tables()
        # band index per g-point for albedo/cloud expansion
        bidx = []
        for i, n in enumerate(NGC):
            bidx += [i] * n
        self.band_of_g = jnp.asarray(np.array(bidx, np.int32))

    def __call__(self, p_half, p_full, t_full, q, o3, coszen,
                 alb_dir, alb_dif, cldfrac=None, taucld=None, ssacld=None,
                 asmcld=None, co2vmr=None) -> SwFluxes:
        """p in Pa (..., L+1)/(..., L); q specific humidity [kg/kg];
        o3 mass mixing ratio; coszen (...); albedos (...) broadband.
        Cloud optical properties per band (..., L, 14) if given, top-down.
        """
        cfg = self.config
        flip = lambda a: jnp.flip(a, axis=-1)
        # bottom-up layers
        pavel = flip(p_full) * 1e-2                 # hPa
        tavel = flip(t_full)
        pz = flip(p_half) * 1e-2                    # level pressures, hPa
        h2ovmr = flip(q / (1.0 - q)) * (AMD / AMW)
        o3vmr = flip(o3) * (AMD / 47.9982)
        co2 = cfg.co2vmr if co2vmr is None else co2vmr

        amm = (1.0 - h2ovmr) * AMD + h2ovmr * AMW
        coldry = ((pz[..., :-1] - pz[..., 1:]) * 1.0e3 * AVOGAD
                  / (1.0e2 * GRAV_CGS * amm * (1.0 + h2ovmr)))
        wkl = {"h2o": h2ovmr * coldry,
               "co2": co2 * coldry * jnp.ones_like(coldry),
               "o3": o3vmr * coldry,
               "n2o": cfg.n2ovmr * coldry,
               "ch4": cfg.ch4vmr * coldry,
               "o2": cfg.o2vmr * coldry}

        t = self.tables.t
        c = setcoef_sw(pavel, tavel, wkl, coldry, t["preflog"], t["tref"])
        taug, taur, sfluxzen = taumol_sw(c, self.tables)

        # flip to top-down for the solver
        taug = jnp.flip(taug, axis=-2)
        taur = jnp.flip(taur, axis=-2)

        mu0 = jnp.maximum(coszen, 1e-4)[..., None, None]
        solvar = cfg.scon / RRSW_SCON
        zincflx = solvar * sfluxzen * jnp.maximum(coszen, 0.0)[..., None]

        # clear-sky combined properties per g-point (aerosol-free),
        # PRE-delta-scaling (sw_solve delta-scales internally)
        ztauc = taur + taug
        zomcc = taur / jnp.maximum(ztauc, 1e-20)
        zgcc = jnp.zeros_like(ztauc)

        gshape = ztauc.shape[:-2] + (NGPT,)
        alb_dir_g = jnp.broadcast_to(alb_dir[..., None], gshape)
        alb_dif_g = jnp.broadcast_to(alb_dif[..., None], gshape)

        swdflxc, swuflxc, dird_c = sw_flux_solve(
            ztauc, zomcc, zgcc, mu0, alb_dir_g, alb_dif_g, zincflx)

        if cldfrac is not None:
            # total-sky: combine cloud properties at original (pre-delta)
            # values then delta-scale (spcvrt icpr=0 path), and blend the
            # clear/cloudy two-streams by cloud fraction per layer.
            tc = jnp.take(taucld, self.band_of_g, axis=-1)
            wc = jnp.take(ssacld, self.band_of_g, axis=-1)
            gc = jnp.take(asmcld, self.band_of_g, axis=-1)
            ztauo = taur + taug + tc
            zomco = taur + tc * wc
            zgco = (tc * wc * gc) / jnp.maximum(zomco, 1e-20)
            zomco = zomco / jnp.maximum(ztauo, 1e-20)
            # per-layer cloud fraction, or per-g-point binary (McICA
            # subcolumns from physics/mcica.py) — the fraction blend
            # covers both (binary cf selects clear/cloudy exactly)
            cf = (cldfrac if cldfrac.ndim == ztauc.ndim
                  else cldfrac[..., None])
            cf = jnp.broadcast_to(cf, ztauc.shape)
            swdflx, swuflx, dirdflx = sw_flux_solve(
                ztauc, zomcc, zgcc, mu0, alb_dir_g, alb_dif_g, zincflx,
                cloud=(ztauo, zomco, zgco, cf))
        else:
            swdflx, swuflx, dirdflx = swdflxc, swuflxc, dird_c

        # heating rate from net-flux convergence [K/s]: layer absorbs
        # Fnet(top) - Fnet(bottom), both half-level arrays top-down
        fnet = swdflx - swuflx
        dp = p_half[..., 1:] - p_half[..., :-1]
        swhr = (cfg.grav / cfg.cp_air) * (fnet[..., :-1] - fnet[..., 1:]) / dp
        return SwFluxes(swdflx=swdflx, swuflx=swuflx, swdflxc=swdflxc,
                        swuflxc=swuflxc, swhr=swhr, dirdflx=dirdflx)


# ---------------------------------------------------------------------------
# cloud optical properties (rrtmg_sw_cldprop.f90 cldprop_sw, inflag=2)
# ---------------------------------------------------------------------------

CLD_DATA = Path(__file__).resolve().parent.parent / "data" / "rrtmg_sw_cld.npz"


class _CldTables:
    _cache = None

    def __new__(cls):
        if cls._cache is None:
            cls._cache = super().__new__(cls)
            d = np.load(CLD_DATA)
            cls._cache.t = {k: jnp.asarray(d[k].astype(np.float32))
                            for k in d.files}
        return cls._cache


def cldprop_sw(cldfrac, clwp, ciwp, rel, rei, iceflag=2, liqflag=1):
    """Per-band cloud optical properties from water paths and particle sizes.

    Re-design of cldprop_sw (rrtmg_sw_cldprop.f90:40-226), inflag=2 path:
      - liquid (liqflag=1): Hu & Stamnes (1993) tables extliq1/ssaliq1/
        asyliq1 indexed by effective radius 2.5-60 um;
      - ice iceflag=2: Streamer v3.0 tables (extice2...) for re 5-131 um;
        iceflag=3: Fu (1996) generalized effective size tables (extice3...).

    Inputs (..., L): cloud fraction, in-cloud liquid/ice water paths [g/m2],
    liquid/ice effective radii [micron]. Returns UNSCALED (tau, ssa, g) per
    band (..., L, 14) for the solver's combine-then-delta-scale cloudy path
    (the reference applies the forward-peak scaling inside cldprop and skips
    it in spcvrt's icpr>=1 branch — same operation, composed differently).
    """
    t = _CldTables().t
    eps = 1e-6

    # liquid: index = int(radliq - 1.5), clamped to 1..57 (1-based)
    radliq = jnp.clip(rel, 2.5, 60.0)
    idxl = jnp.clip((radliq - 1.5).astype(jnp.int32), 1, 57) - 1   # 0-based
    fintl = radliq - 1.5 - (idxl + 1)
    def liq(tab):
        a = tab[idxl]                     # (..., L, 14)
        b = tab[idxl + 1]
        return a + fintl[..., None] * (b - a)
    extliq = liq(t["extliq1"])
    ssaliq = jnp.minimum(liq(t["ssaliq1"]), 1.0)
    gliq = liq(t["asyliq1"])

    if iceflag == 2:
        radice = jnp.clip(rei, 5.0, 131.0)
        factor = (radice - 2.0) / 3.0
        idxi = jnp.minimum(factor.astype(jnp.int32), 42) - 1
        idxi = jnp.clip(idxi, 0, 41)
        finti = factor - (idxi + 1)
        def ice(tab):
            return tab[idxi] + finti[..., None] * (tab[idxi + 1] - tab[idxi])
        extice = ice(t["extice2"])
        ssaice = jnp.minimum(ice(t["ssaice2"]), 1.0)
        gice = ice(t["asyice2"])
    elif iceflag == 3:
        radice = jnp.clip(rei, 5.0, 140.0)
        factor = (radice - 2.0) / 3.0
        idxi = jnp.minimum(factor.astype(jnp.int32), 45) - 1
        idxi = jnp.clip(idxi, 0, 44)
        finti = factor - (idxi + 1)
        def ice(tab):
            return tab[idxi] + finti[..., None] * (tab[idxi + 1] - tab[idxi])
        extice = ice(t["extice3"])
        ssaice = jnp.minimum(ice(t["ssaice3"]), 1.0)
        gice = ice(t["asyice3"])
    else:
        raise ValueError(f"iceflag {iceflag} not supported (2 or 3)")

    has_liq = (clwp > 0.0)[..., None]
    has_ice = (ciwp > 0.0)[..., None]
    tauliq = jnp.where(has_liq, clwp[..., None] * extliq, 0.0)
    tauice = jnp.where(has_ice, ciwp[..., None] * extice, 0.0)
    tauc = tauliq + tauice
    scatliq = jnp.where(has_liq, ssaliq * tauliq, 0.0)
    scatice = jnp.where(has_ice, ssaice * tauice, 0.0)
    scat = scatliq + scatice
    ssac = scat / jnp.maximum(tauc, eps)
    asmc = (scatliq * gliq + scatice * gice) / jnp.maximum(scat, eps)

    cloudy = (cldfrac > 1e-12)[..., None]
    tauc = jnp.where(cloudy, tauc, 0.0)
    ssac = jnp.where(cloudy, ssac, 1.0)
    asmc = jnp.where(cloudy, asmc, 0.0)
    return tauc, ssac, asmc
