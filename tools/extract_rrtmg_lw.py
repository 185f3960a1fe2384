#!/usr/bin/env python
"""Extract RRTMG-LW data for the TPU-native port.

Two kinds of data feed the LW scheme (reference:
src/atmos_param/rrtm_radiation/rrtmg_lw/gcm_model):

1. STATIC data vendored in the reference's Fortran source (extracted here to
   `isca_tpu/data/rrtmg_lw_static.npz`, committed):
     - lwatmref   (rrtmg_lw_setcoef.f90:418-578): pref/preflog/tref MLS
       profile + chi_mls(7,59) reference mixing ratios
     - lwavplank  (rrtmg_lw_setcoef.f90:581-1284): totplnk(181,16) integrated
       Planck function table + totplk16(181)
     - lwdatinit  (rrtmg_lw_init.f90:178-281): band limits, nspa/nspb
     - lwcmbdat   (rrtmg_lw_init.f90:284-363): 256->140 g-point reduction
     - lwcldpr    (rrtmg_lw_init.f90:2018-2656): cloud optics coefficients
       (absice0/1/2/3, absliq0/absliq1, abscld1)

2. The correlated-k tables themselves, which the reference loads AT RUNTIME
   from an external `rrtmg_lw.nc` (rrtmg_lw_read_nc.f90 — the file ships with
   AER's RRTMG distribution, NOT with the reference repo).  `convert_nc()`
   replicates rrtmg_lw_read_nc.f90's variable mapping plus the cmbgb1..16
   g-point reduction (rrtmg_lw_init.f90:366-2015) and writes
   `isca_tpu/data/rrtmg_lw_kg.npz`.  Users with the AER file run:

       python tools/extract_rrtmg_lw.py /path/to/rrtmg_lw.nc

   Without it, `make_synthetic_kg()` builds shape-correct physically-plausible
   tables so the full LW pipeline can run and be tested (fluxes are NOT
   AER-accurate in that mode; the adapter labels it accordingly).
"""

import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

REF = Path("/root/reference/src/atmos_param/rrtm_radiation/rrtmg_lw/gcm_model")
DATA = Path(__file__).resolve().parent.parent / "isca_tpu" / "data"
OUT_STATIC = DATA / "rrtmg_lw_static.npz"
OUT_KG = DATA / "rrtmg_lw_kg.npz"

MG = 16
NBND = 16

# lwcmbdat (rrtmg_lw_init.f90:303-349)
NGC = [10, 12, 16, 14, 16, 8, 12, 8, 12, 6, 8, 8, 4, 2, 2, 2]
NGS = [10, 22, 38, 52, 68, 76, 88, 96, 108, 114, 122, 130, 134, 136, 138, 140]
NGN = ([1, 1, 2, 2, 2, 2, 2, 2, 1, 1] +
       [1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2] +
       [1] * 16 +
       [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 3] +
       [1] * 16 +
       [2, 2, 2, 2, 2, 2, 2, 2] +
       [2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2] +
       [2, 2, 2, 2, 2, 2, 2, 2] +
       [1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2] +
       [2, 2, 2, 2, 4, 4] +
       [1, 1, 2, 2, 2, 2, 3, 3] +
       [1, 1, 1, 1, 2, 2, 4, 4] +
       [3, 3, 4, 6] +
       [8, 8] +
       [8, 8] +
       [4, 12])
WT = np.array([0.1527534276, 0.1491729617, 0.1420961469, 0.1316886544,
               0.1181945205, 0.1019300893, 0.0832767040, 0.0626720116,
               0.0424925000, 0.0046269894, 0.0038279891, 0.0030260086,
               0.0022199750, 0.0014140010, 0.0005330000, 0.0000750000])
# lwdatinit (rrtmg_lw_init.f90:196-210)
WAVENUM1 = np.array([10., 350., 500., 630., 700., 820., 980., 1080., 1180.,
                     1390., 1480., 1800., 2080., 2250., 2380., 2600.])
WAVENUM2 = np.array([350., 500., 630., 700., 820., 980., 1080., 1180., 1390.,
                     1480., 1800., 2080., 2250., 2380., 2600., 3250.])
DELWAVE = WAVENUM2 - WAVENUM1
NSPA = [1, 1, 9, 9, 9, 1, 9, 1, 9, 1, 1, 9, 9, 1, 9, 9]
NSPB = [1, 1, 5, 5, 5, 0, 1, 1, 1, 1, 1, 0, 0, 1, 0, 0]

# minor-gas arrays per band: name -> (nc absorber name, lower?) — from
# rrtmg_lw_read_nc.f90 lw_kgb01..16
MINOR_NC = {
    "kao_mn2": "N2", "kbo_mn2": "N2", "kao_mn2o": "N2O", "kbo_mn2o": "N2O",
    "kao_mco2": "CO2", "kbo_mco2": "CO2", "kao_mo3": "O3", "kbo_mo3": "O3",
    "kao_mo2": "O2", "kbo_mo2": "O2", "kao_mco": "CO",
    "ccl4o": "CCL4", "cfc11adjo": "CFC11", "cfc12o": "CFC12",
    "cfc22adjo": "CFC22",
}
ABSORBER_NAMES = ["N2", "CCL4", "CFC11", "CFC12", "CFC22", "H2O", "CO2",
                  "O3", "N2O", "CO", "CH4", "O2"]   # rrlw_ncpar.f90


def compute_rwgt():
    """rrtmg_lw_ini (rrtmg_lw_init.f90:102-130)."""
    rwgt = np.ones(NBND * MG)
    igcsm = 0
    iprsm_all = 0
    for ibnd in range(NBND):
        if NGC[ibnd] < MG:
            wtsm = np.zeros(NGC[ibnd])
            for igc in range(NGC[ibnd]):
                wtsum = 0.0
                for _ in range(NGN[igcsm]):
                    wtsum += WT[iprsm_all % MG]
                    iprsm_all += 1
                wtsm[igc] = wtsum
                igcsm += 1
            ngm = []
            base = sum(NGC[:ibnd])
            for igc in range(NGC[ibnd]):
                ngm += [igc] * NGN[base + igc]
            for ig in range(MG):
                rwgt[ibnd * MG + ig] = WT[ig] / wtsm[ngm[ig]]
        else:
            igcsm += NGC[ibnd]
            iprsm_all += MG
    return rwgt


# ---------------------------------------------------------------------------
# Fortran source parsing (handles `name(1:50, 2) = (/ ... /)` range slices)
# ---------------------------------------------------------------------------

NUM_RE = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?(?=_rb)")


def _join_continuations(text):
    lines, buf = [], ""
    for raw in text.splitlines():
        line = raw.split("!")[0].rstrip()
        if not line.strip():
            continue
        stripped = line.strip()
        if buf:
            stripped = stripped.lstrip("&").strip()
            buf += " " + stripped
        else:
            buf = stripped
        if buf.endswith("&"):
            buf = buf[:-1].rstrip()
            continue
        lines.append(buf)
        buf = ""
    return lines


def parse_assignments(text, arrays, offsets):
    """Fill numpy arrays from Fortran assignments with full slice support.

    arrays: {lowname: np array (Fortran dim order)}; offsets: {lowname: tuple
    of lower bounds per dim}.
    """
    assign_re = re.compile(r"^(\w+)\s*(?:\(([^)]*)\))?\s*=\s*\(\s*/(.*)/\s*\)\s*$")
    scalar_re = re.compile(r"^(\w+)\s*=\s*([-+0-9.eE]+)_rb\s*$")
    for line in _join_continuations(text):
        sm = scalar_re.match(line)
        if sm and sm.group(1).lower() in arrays:
            arrays[sm.group(1).lower()][...] = float(sm.group(2))
            continue
        m = assign_re.match(line)
        if not m:
            continue
        name, idx, rhs = m.groups()
        key = name.lower()
        if key not in arrays:
            continue
        arr = arrays[key]
        offs = offsets[key]
        vals = np.array([float(x) for x in NUM_RE.findall(rhs)])
        if idx is None:
            arr[...] = vals.reshape(arr.shape[::-1]).T  # Fortran order fill
            continue
        sel = []
        for pos, part in enumerate(idx.split(",")):
            part = part.strip()
            if part == ":":
                sel.append(slice(None))
            elif ":" in part:
                lo, hi = part.split(":")
                sel.append(slice(int(lo) - offs[pos], int(hi) - offs[pos] + 1))
            else:
                sel.append(int(part) - offs[pos])
        # number of slots selected must match len(vals); fill Fortran-order
        view = arr[tuple(sel)]
        arrays[key][tuple(sel)] = vals.reshape(view.shape[::-1]).T \
            if view.ndim > 1 else vals
    return arrays


def _sub(text, name):
    m = re.search(rf"subroutine {name}\b(.*?)end subroutine {name}", text, re.S)
    if m is None:
        raise RuntimeError(f"subroutine {name} not found")
    return m.group(1)


def extract_static():
    setcoef = (REF / "src" / "rrtmg_lw_setcoef.f90").read_text()
    init = (REF / "src" / "rrtmg_lw_init.f90").read_text()
    out = {}

    atm = {"pref": np.full(59, np.nan), "preflog": np.full(59, np.nan),
           "tref": np.full(59, np.nan), "chi_mls": np.full((7, 59), np.nan)}
    offs = {k: (1, 1) for k in atm}
    parse_assignments(_sub(setcoef, "lwatmref"), atm, offs)
    out.update({k: v for k, v in atm.items()})

    plk = {"totplnk": np.full((181, 16), np.nan),
           "totplk16": np.full(181, np.nan)}
    offs = {"totplnk": (1, 1), "totplk16": (1,)}
    parse_assignments(_sub(setcoef, "lwavplank"), plk, offs)
    out.update(plk)

    cld = {"abscld1": np.array(np.nan), "absice0": np.full(2, np.nan),
           "absice1": np.full((2, 5), np.nan),
           "absice2": np.full((43, 16), np.nan),
           "absice3": np.full((46, 16), np.nan),
           "absliq0": np.array(np.nan), "absliq1": np.full((58, 16), np.nan)}
    offs = {k: (1, 1) for k in cld}
    parse_assignments(_sub(init, "lwcldpr"), cld, offs)
    out.update(cld)

    for k, v in out.items():
        if np.any(np.isnan(np.asarray(v))):
            raise RuntimeError(f"static table {k} incompletely parsed")

    out["wavenum1"], out["wavenum2"], out["delwave"] = WAVENUM1, WAVENUM2, DELWAVE
    out["ngc"] = np.array(NGC)
    out["ngs"] = np.array(NGS)
    out["nspa"] = np.array(NSPA)
    out["nspb"] = np.array(NSPB)
    out["rwgt"] = compute_rwgt()
    return out


# ---------------------------------------------------------------------------
# kg tables: original shapes per band (from rrlw_kg01..16 modules)
# ---------------------------------------------------------------------------

def kg_shapes():
    """Parse rrlw_kgNN.f90 'original' (o-suffixed) array declarations."""
    shapes = {}
    for b in range(1, 17):
        mod = (REF / "modules" / f"rrlw_kg{b:02d}.f90").read_text()
        per = {}
        decls = []
        for m in re.finditer(r"real\(kind=rb\)\s*::\s*(.+)", mod):
            decls.append(m.group(1))
        # `real(kind=rb) , dimension(no10) :: fracrefao` attribute form
        for m in re.finditer(
                r"real\(kind=rb\)\s*,\s*dimension\(([^)]*)\)\s*::\s*(.+)", mod):
            dims = m.group(1)
            for nm in m.group(2).split(","):
                decls.append(f"{nm.strip()}({dims})")
        for decl in decls:
            for p in re.split(r",(?![^(]*\))", decl):
                p = p.strip()
                dm = re.match(r"(\w+)\s*(?:\(([^)]*)\))?$", p)
                if not dm:
                    continue
                name = dm.group(1).lower()
                # originals: kao/kbo, kao_mXX/kbo_mXX, *refo, ccl4o, cfc*o
                # (beware reduced ka_mn2o/kb_mn2o, which also end in 'o')
                if name.startswith(("ka_", "kb_")):
                    continue
                if not (name.endswith("o") or name.startswith(("kao_", "kbo_"))):
                    continue
                dims = dm.group(2)
                if dims is None:
                    continue
                shape = []
                for d in dims.split(","):
                    d = d.strip()
                    if ":" in d:
                        lo, hi = d.split(":")
                        shape.append(int(hi) - int(lo) + 1)
                    elif d.startswith("no"):
                        shape.append(MG)
                    else:
                        shape.append(int(d))
                per[name] = tuple(shape)
        shapes[b] = per
    return shapes


def segment_reduce(arr_f, band_idx, rwgt, g_axis, weighted=True):
    """cmbgb reduction along g_axis (arr in Fortran dim order, numpy array)."""
    base = sum(NGC[:band_idx])
    w = (rwgt[band_idx * MG:(band_idx + 1) * MG] if weighted
         else np.ones(MG))
    arr = np.moveaxis(arr_f, g_axis, -1)
    out = np.zeros(arr.shape[:-1] + (NGC[band_idx],))
    ip = 0
    for igc in range(NGC[band_idx]):
        n = NGN[base + igc]
        out[..., igc] = np.sum(arr[..., ip:ip + n] * w[ip:ip + n], axis=-1)
        ip += n
    return np.moveaxis(out, -1, g_axis)


def reduce_band_tables(band, tables, rwgt):
    """Apply cmbgb to a dict of original-name -> Fortran-order arrays.

    Returns reduced arrays keyed by final names, with absa/absb flattened to
    (nspa*5*13, ng)/(nspb*5*47, ng) exactly like the reference's equivalence.
    """
    bi = band - 1
    out = {}
    for name, arr in tables.items():
        g_ax = 0 if name.startswith("fracref") else arr.ndim - 1
        weighted = not name.startswith("fracref")
        red = segment_reduce(arr, bi, rwgt, g_ax, weighted)
        if name.startswith("kao_"):
            new = "ka_" + name[4:]
        elif name.startswith("kbo_"):
            new = "kb_" + name[4:]
        else:
            new = name[:-1] if name.endswith("o") else name
        if name == "kao":
            # flatten leading (js,jt,jp) Fortran-order -> (ind, ng)
            ng = red.shape[-1]
            out["absa"] = red.reshape(-1, ng, order="F")
        elif name == "kbo":
            ng = red.shape[-1]
            out["absb"] = red.reshape(-1, ng, order="F")
        else:
            out[new] = red
    return out


def convert_nc(nc_path):
    """Replicate rrtmg_lw_read_nc.f90 + cmbgb reduction from a real AER file."""
    try:
        from scipy.io import netcdf_file
        nc = netcdf_file(str(nc_path), "r", mmap=False)
        getvar = lambda n: nc.variables[n][:]
    except Exception:
        import h5py
        h5 = h5py.File(str(nc_path), "r")
        getvar = lambda n: np.asarray(h5[n])

    cache = {n: None for n in [
        "PlanckFractionLowerAtmos", "PlanckFractionUpperAtmos",
        "KeySpeciesAbsorptionCoefficientsLowerAtmos",
        "KeySpeciesAbsorptionCoefficientsUpperAtmos",
        "H20SelfAbsorptionCoefficients", "H20ForeignAbsorptionCoefficients",
        "AbsorptionCoefficientsLowerAtmos", "AbsorptionCoefficientsUpperAtmos"]}

    def var(n):
        if cache[n] is None:
            cache[n] = np.asarray(getvar(n), dtype=np.float64)
        return cache[n]

    def fget(vname, start_f, count_f):
        """nf90_get_var semantics: Fortran 1-based start/count; returns array
        of shape count_f in Fortran dim order (numpy C array reversed)."""
        v = var(vname)                       # C order = reversed Fortran dims
        nf = len(count_f)
        assert v.ndim == nf, (vname, v.shape, count_f)
        sel = tuple(slice(s - 1, s - 1 + c)
                    for s, c in zip(start_f[::-1], count_f[::-1]))
        sub = v[sel]                          # C-order shape = reversed count
        # squeeze trailing Fortran dims of size 1, keep Fortran order
        return np.ascontiguousarray(sub).transpose(tuple(range(nf))[::-1])

    rwgt = compute_rwgt()
    shapes = kg_shapes()
    out = {}
    for band in range(1, 17):
        ng = MG
        tabs = {}
        for name, shape in shapes[band].items():
            if name.startswith("fracref"):
                vn = ("PlanckFractionLowerAtmos" if name == "fracrefao"
                      else "PlanckFractionUpperAtmos")
                nkey = shape[1] if len(shape) == 2 else 1
                a = fget(vn, (1, 1, band, 1), (ng, nkey, 1, 1))
                a = a.reshape(shape, order="F") if len(shape) == 2 else a.ravel(order="F")[:ng]
            elif name == "kao":
                nkey = shape[0] if len(shape) == 4 else 1
                a = fget("KeySpeciesAbsorptionCoefficientsLowerAtmos",
                         (1, 1, 1, 1, band, 1), (nkey, 5, 13, ng, 1, 1))
                a = a.reshape(shape, order="F")
            elif name == "kbo":
                nkey = shape[0] if len(shape) == 4 else 1
                a = fget("KeySpeciesAbsorptionCoefficientsUpperAtmos",
                         (1, 1, 1, 1, band, 1), (nkey, 5, 47, ng, 1, 1))
                a = a.reshape(shape, order="F")
            elif name == "selfrefo":
                a = fget("H20SelfAbsorptionCoefficients",
                         (1, 1, band, 1), (10, ng, 1, 1)).reshape(10, ng, order="F")
            elif name == "forrefo":
                a = fget("H20ForeignAbsorptionCoefficients",
                         (1, 1, band, 1), (4, ng, 1, 1)).reshape(4, ng, order="F")
            elif name in MINOR_NC:
                ab = ABSORBER_NAMES.index(MINOR_NC[name]) + 1
                vn = ("AbsorptionCoefficientsUpperAtmos" if name.startswith("kbo")
                      else "AbsorptionCoefficientsLowerAtmos")
                if name in ("ccl4o", "cfc11adjo", "cfc12o", "cfc22adjo"):
                    a = fget(vn, (1, 1, 1, ab, band, 1),
                             (1, 1, ng, 1, 1, 1)).ravel(order="F")[:ng]
                elif len(shape) == 3:   # (key, 19, ng)
                    a = fget(vn, (1, 1, 1, ab, band, 1),
                             (shape[0], 19, ng, 1, 1, 1)).reshape(shape, order="F")
                else:                    # (19, ng)
                    a = fget(vn, (1, 1, 1, ab, band, 1),
                             (1, 19, ng, 1, 1, 1)).reshape(shape, order="F")
            else:
                raise RuntimeError(f"unmapped kg array {name} band {band}")
            tabs[name] = a
        red = reduce_band_tables(band, tabs, rwgt)
        for k, v in red.items():
            out[f"b{band}_{k}"] = v
    return out


def make_synthetic_kg(seed=0, version=4):
    """Shape-correct, physically-plausible k-tables for tests (NOT AER data).

    Absorption coefficients decay smoothly with g-point rank and vary
    smoothly with (T, p, species parameter); Planck fractions are a smooth
    normalized partition of each band.

    `version` selects the calibration vintage (stored as synthetic_version):
      v3 (round 3): window bands + cooling-to-space aloft; measured defect:
         kbo decays 2.5 decades between 95 and 28 hPa, so the lower
         stratosphere under-absorbs upwelling tropospheric flux — MiMA's
         tropical cold point froze at 156 K at 35 hPa (CLIMATE_GATE r3) and
         the single-column RCE harness reproduces it offline (cold point
         43 hPa, lower-strat LW -1.1 K/day; tools/calibrate_lw.py).
      v4 (round 4): gentler kbo pressure decay through the lower/mid
         stratosphere (0.5 -> -0.3 over 95 -> ~9 hPa) so the 30-100 hPa
         layer stays a weak net absorber under a warm troposphere — the
         physical role of the CO2 15um + O3 9.6um bands there. Calibrated
         against tools/calibrate_lw.py targets (JG17 cold point ~190-205 K
         near 100 hPa, stratopause 260-280 K, OLR ~285, tropospheric
         cooling ~ -2 K/day).
    """
    rng = np.random.default_rng(seed)
    shapes = kg_shapes()
    rwgt = compute_rwgt()
    out = {}
    # 8-12 um atmospheric window (bands 6-8, 820-1180 cm-1): water-vapor
    # line+continuum absorption is 1-2 decades weaker there than in the
    # rotation/vibration bands. Without this structure every band closes as
    # humidity rises, OLR hits a ceiling, and a warm moist climate runs away
    # (measured: MiMA t_surf +13 K/120 days, q -> 40 g/kg). The offset keeps
    # the window semi-transparent at high q, as the real tables do.
    WINDOW_OFFSET = {6: -2.0, 7: -2.0, 8: -1.5}
    for band in range(1, 17):
        woff = WINDOW_OFFSET.get(band, 0.0)
        tabs = {}
        for name, shape in shapes[band].items():
            if name.startswith("fracref"):
                g = np.linspace(0.0, 1.0, MG)
                base = np.exp(-2.0 * g)[:, None] * np.ones((1,) + tuple(shape[1:]))
                base /= base.sum(axis=0, keepdims=True)
                tabs[name] = base.reshape(shape)
            elif name in ("kao", "kbo"):
                sh = shape
                smooth = rng.normal(0, 0.15, sh[:-1])[..., None]
                jp_ax = len(sh) - 2
                npz_ = sh[jp_ax]
                # g-rank span and pressure dependence along the reference-
                # pressure axis, calibrated against real clear-sky profiles
                # (docs in tools/README note + tests/test_rrtmg_lw.py golden):
                # * kao (troposphere): k 1e-4.5..1e0.1, mild pressure decay
                #   -> MLS OLR ~250 W/m2, tropospheric cooling -1..-3 K/day
                # * kbo (p < ~100 hPa): a wider span reaching k ~ 1e1.5 so a
                #   few strong-line g-points stay optically active aloft (the
                #   CO2 cooling-to-space mechanism); moderate decay with
                #   height -> -2..-6 K/day at 1-40 hPa and a bounded, stable
                #   stratopause (LW cooling still grows steeply with T)
                if name == "kbo":
                    # v4: NO window offset for the upper-atmosphere tables
                    # of bands 7-8 — in the real RRTMG those bands' upper
                    # key species is O3 (rrtmg_lw taumol07/08, nspb=1, O3
                    # major): the 9.6um ozone band absorbs the warm surface
                    # flux arriving through the semi-transparent window and
                    # is THE longwave heater of the cold tropical lower
                    # stratosphere. v3 weakened these kbo by the window
                    # offset too, so nothing opposed cooling at 30-100 hPa
                    # (measured: -1.1 K/day there, cold point 43 hPa in the
                    # RCE harness; 156 K at 35 hPa in the MiMA gate).
                    woff_b = 0.0 if (version >= 4 and band in (7, 8)) else woff
                    grank = np.linspace(-4.0, 1.5, MG) + woff_b
                    # piecewise in pressure: the strong-line / CO2 15um
                    # cooling-to-space regime toward the lowest pressures
                    # keeps the model-top temperature bounded (real
                    # atmospheres cool -5..-20 K/day there; without it the
                    # ozone SW heating has no LW opponent above ~0.5 hPa)
                    k1 = int(0.15 * npz_)
                    k2 = int(0.55 * npz_)
                    # v4: the cooling-to-space burden above ~10 hPa moves
                    # from the (physically wrong, removed) N2 continuum to
                    # the CO2 15um bands, where it belongs: their dip is
                    # shallow (CO2 absorption never vanishes), full band
                    # strength arrives by ~5 hPa (k2 = 15 reference-pressure
                    # indices above the 95.6 hPa boundary), and the plateau
                    # rises a decade (real band-center k is 1e3-1e4 cm2/g).
                    co2band = version >= 4 and band in (3, 4, 5)
                    plateau = 1.5 if co2band else 1.3
                    if version >= 4 and band in (1, 2):
                        # v4: the H2O rotation/continuum bands must go
                        # optically quiet IMMEDIATELY above the 95.6 hPa
                        # lower/upper boundary — v3 held them at 10^0.5
                        # down to ~30 hPa, and the resulting rotation-band
                        # emission cooled 30-100 hPa at -1.26 K/day (band
                        # decomposition, tools/calibrate_lw.py), freezing
                        # the MiMA cold point at 156 K / 35 hPa. Published
                        # decompositions put net lower-strat LW near zero:
                        # weak H2O cooling offset by CO2 15um + O3 9.6um
                        # heating (bands 3-5, 7-8).
                        pvar = np.concatenate([
                            np.linspace(-0.5, -2.5, k1),
                            np.linspace(-2.5, plateau, k2 - k1),
                            np.full(npz_ - k2, plateau)])
                    elif co2band:
                        # full band strength by ~3 hPa (stratopause cooling),
                        # then an NLTE-motivated taper above ~0.3 hPa: LTE
                        # breaks down above ~70 km and real 15um cooling is
                        # -5..-15 K/day there, NOT the -30..-95 K/day an
                        # un-tapered LTE plateau produces (measured on the
                        # deep fixed-profile column; the un-tapered v4
                        # tables NaN'd the MiMA GCM, whose model top at
                        # scale_heights=11 is ~0.002 hPa)
                        k2 = int(0.45 * npz_)
                        k3 = int(0.55 * npz_)
                        pvar = np.concatenate([
                            np.linspace(0.5, -1.0, k1),
                            np.linspace(-1.0, plateau, k2 - k1),
                            np.full(k3 - k2, plateau),
                            np.linspace(plateau, -1.0, npz_ - k3)])
                    else:
                        pvar = np.concatenate([
                            np.linspace(0.5, -2.0, k1),
                            np.linspace(-2.0, plateau, k2 - k1),
                            np.full(npz_ - k2, plateau)])
                else:
                    grank = np.linspace(-4.5, 0.1, MG) + woff
                    pvar = np.linspace(0.5, -0.5, npz_)
                pshape = [1] * len(sh)
                pshape[jp_ax] = npz_
                tabs[name] = 10.0 ** (grank + smooth + pvar.reshape(pshape))
            elif name in ("selfrefo", "forrefo"):
                grank = np.linspace(-3.2, -0.5, MG) + 0.75 * woff
                tvar = np.linspace(0.3, -0.3, shape[0])[:, None]
                tabs[name] = 10.0 ** (grank[None, :] + tvar)
            elif name in ("ccl4o", "cfc11adjo", "cfc12o", "cfc22adjo"):
                tabs[name] = np.full(MG, 10.0 ** rng.uniform(1.0, 2.0))
            else:  # minor gas tables
                grank = np.linspace(-4.1, -1.1, MG)
                if version >= 4 and name == "kbo_mn2":
                    # v4: N2 collision-induced far-IR absorption is a
                    # DENSITY-squared continuum — real kb_mn2 is ~negligible
                    # above the 95.6 hPa boundary. v3 gave the upper table
                    # tropospheric strength, and that single term emitted
                    # -1.23 K/day at 30-100 hPa (term isolation,
                    # tools/calibrate_lw.py), overwhelming the CO2/O3
                    # heating and freezing the MiMA cold point at 156 K.
                    grank = grank - 2.0
                lead = np.zeros(shape[:-1])[..., None]
                tabs[name] = 10.0 ** (grank + lead + rng.normal(0, 0.1))
        red = reduce_band_tables(band, tabs, rwgt)
        for k, v in red.items():
            out[f"b{band}_{k}"] = v
    out["synthetic"] = np.array(1)
    out["synthetic_version"] = np.array(version)
    return out


def main(argv):
    DATA.mkdir(parents=True, exist_ok=True)
    static = extract_static()
    np.savez_compressed(OUT_STATIC, **static)
    print(f"wrote {OUT_STATIC} ({len(static)} arrays, "
          f"{OUT_STATIC.stat().st_size/1e6:.2f} MB)")
    if len(argv) > 1 and argv[1] == "--synthetic":
        # regenerate the labeled synthetic tables (calibrated against
        # tools/calibrate_lw.py; remember to refresh the frozen golden:
        # python tests/test_rrtmg_lw.py --update)
        kg = make_synthetic_kg()
        np.savez_compressed(OUT_KG, **kg)
        print(f"wrote {OUT_KG} SYNTHETIC v{int(kg['synthetic_version'])} "
              f"({len(kg)} arrays, {OUT_KG.stat().st_size/1e6:.2f} MB)")
    elif len(argv) > 1:
        kg = convert_nc(argv[1])
        np.savez_compressed(OUT_KG, **kg)
        print(f"wrote {OUT_KG} ({len(kg)} arrays, "
              f"{OUT_KG.stat().st_size/1e6:.2f} MB) from {argv[1]}")
    else:
        print("no rrtmg_lw.nc supplied; run with the AER data file to build "
              "isca_tpu/data/rrtmg_lw_kg.npz, or --synthetic to regenerate "
              "the calibrated synthetic tables (tests use synthetic tables)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
