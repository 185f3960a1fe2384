#!/usr/bin/env python
"""Extract the RRTMG-SW correlated-k tables from the reference's Fortran data
statements into a single npz, applying the 224 -> 112 g-point reduction.

Sources (numeric data only, AER's redistributable k-distribution tables):
  - rrtmg_sw/gcm_model/src/rrtmg_sw_k_g.f90       (absorption coefficients)
  - rrtmg_sw/gcm_model/modules/rrsw_kg16..29.f90  (array shapes)
  - rrtmg_sw/gcm_model/src/rrtmg_sw_setcoef.f90   (swatmref MLS profile)
  - rrtmg_sw/gcm_model/src/rrtmg_sw_init.f90      (swcmbdat reduction data,
    re-typed below; cmbgb reduction re-implemented in numpy)

Output: isca_tpu/data/rrtmg_sw.npz with keys b{16..29}_{ka,kb,selfref,
forref,sfluxref,...}, plus pref/preflog/tref and band metadata.
"""

import re
import sys
from pathlib import Path

import numpy as np

REF = Path("/root/reference/src/atmos_param/rrtm_radiation/rrtmg_sw/gcm_model")
OUT = Path(__file__).resolve().parent.parent / "isca_tpu" / "data" / "rrtmg_sw.npz"

MG = 16
NBND = 14

# swcmbdat (rrtmg_sw_init.f90:244-367) — g-point reduction mapping
NGC = [6, 12, 8, 8, 10, 10, 2, 10, 8, 6, 6, 8, 6, 12]
NGS = [6, 18, 26, 34, 44, 54, 56, 66, 74, 80, 86, 94, 100, 112]
NGN = ([2, 2, 2, 2, 4, 4] +
       [1, 1, 1, 1, 1, 2, 1, 2, 1, 2, 1, 2] +
       [1, 1, 1, 1, 2, 2, 4, 4] +
       [1, 1, 1, 1, 2, 2, 4, 4] +
       [1, 1, 1, 1, 1, 1, 1, 1, 2, 6] +
       [1, 1, 1, 1, 1, 1, 1, 1, 2, 6] +
       [8, 8] +
       [2, 2, 1, 1, 1, 1, 1, 1, 2, 4] +
       [2, 2, 2, 2, 2, 2, 2, 2] +
       [1, 1, 2, 2, 4, 6] +
       [1, 1, 2, 2, 4, 6] +
       [1, 1, 1, 1, 1, 1, 4, 6] +
       [1, 1, 2, 2, 4, 6] +
       [1, 1, 1, 1, 2, 2, 2, 2, 1, 1, 1, 1])
WT = np.array([0.1527534276, 0.1491729617, 0.1420961469, 0.1316886544,
               0.1181945205, 0.1019300893, 0.0832767040, 0.0626720116,
               0.0424925000, 0.0046269894, 0.0038279891, 0.0030260086,
               0.0022199750, 0.0014140010, 0.0005330000, 0.0000750000])
WAVENUM1 = np.array([2600., 3250., 4000., 4650., 5150., 6150., 7700.,
                     8050., 12850., 16000., 22650., 29000., 38000., 820.])
WAVENUM2 = np.array([3250., 4000., 4650., 5150., 6150., 7700., 8050.,
                     12850., 16000., 22650., 29000., 38000., 50000., 2600.])


def compute_rwgt():
    """rrtmg_sw_ini (rrtmg_sw_init.f90:108-135)."""
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
            # ngm for this band: group index per original g-point
            ngm = []
            for igc in range(NGC[ibnd]):
                base = sum(NGC[:ibnd])
                ngm += [igc] * NGN[base + igc]
            for ig in range(MG):
                rwgt[ibnd * MG + ig] = WT[ig] / wtsm[ngm[ig]]
        else:
            igcsm += NGC[ibnd]
            iprsm_all += MG
    return rwgt


NUM_RE = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?(?=_rb)")
ASSIGN_RE = re.compile(
    r"^\s*(\w+)\s*(\(([^)]*)\))?\s*=\s*(.*)$")


def parse_shapes(module_path):
    """Parse `real(kind=rb) :: name(dims)` declarations -> {name: (shape, offsets)}."""
    text = module_path.read_text()
    out = {}
    for m in re.finditer(r"real\(kind=rb\)\s*::\s*(.+)", text):
        decl = m.group(1)
        # split on commas not inside parens
        parts = re.split(r",(?![^(]*\))", decl)
        for p in parts:
            p = p.strip()
            dm = re.match(r"(\w+)\s*\(([^)]*)\)", p)
            if dm:
                name, dims = dm.group(1), dm.group(2)
                shape, offs = [], []
                reduced = False
                for d in dims.split(","):
                    d = d.strip()
                    if ":" in d:
                        lo, hi = d.split(":")
                        lo, hi = int(lo), int(hi)
                        shape.append(hi - lo + 1)
                        offs.append(lo)
                    elif d.startswith("no"):
                        shape.append(16)
                        offs.append(1)
                    elif d.startswith("ng"):
                        reduced = True   # post-reduction array; skip
                        break
                    else:
                        shape.append(int(d))
                        offs.append(1)
                if reduced:
                    out.pop(name, None)
                    continue
                out[name] = (tuple(shape), tuple(offs))
            elif re.match(r"^\w+$", p):
                out[p] = ((), ())
    return out


def parse_subroutine(text, arrays):
    """Fill `arrays` (dict name -> np array) from Fortran assignments."""
    # join continuation lines
    lines = []
    buf = ""
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

    for line in lines:
        m = ASSIGN_RE.match(line)
        if not m:
            continue
        name, _, idx, rhs = m.groups()
        key = name.lower()
        if key not in arrays:
            continue
        arr, offs = arrays[key]
        vals = np.array([float(x) for x in NUM_RE.findall(rhs)])
        if arr.ndim == 0:
            if len(vals) == 1:
                arrays[key] = (np.array(vals[0]), offs)
            continue
        if idx is None or all(i.strip() == ":" for i in idx.split(",")):
            arrays[key] = (vals.reshape(arr.shape, order="F"), offs)
            continue
        # partial index like (:, 2, 1, 3): exactly one ':' expected first
        sel = []
        for pos, part in enumerate(idx.split(",")):
            part = part.strip()
            if part == ":":
                sel.append(slice(None))
            else:
                sel.append(int(part) - offs[pos])
        arr[tuple(sel)] = vals
    return arrays


def segment_reduce(arr, band_idx, rwgt, axis, weighted=True):
    """cmbgb: combine 16 original g-points into NGC[band] groups along axis."""
    base = sum(NGC[:band_idx])
    w = rwgt[band_idx * MG:(band_idx + 1) * MG] if weighted else np.ones(MG)
    arr = np.moveaxis(arr, axis, -1)
    out_shape = arr.shape[:-1] + (NGC[band_idx],)
    out = np.zeros(out_shape)
    ip = 0
    for igc in range(NGC[band_idx]):
        n = NGN[base + igc]
        out[..., igc] = np.sum(arr[..., ip:ip + n] * w[ip:ip + n], axis=-1)
        ip += n
    return np.moveaxis(out, -1, axis)


def g_axis(name, shape):
    """Which axis of the original array is the 16-g-point axis."""
    for i, s in enumerate(shape):
        if s == 16 and not (name == "kbo" and i != len(shape) - 1):
            if name in ("kao", "kbo", "selfrefo", "forrefo"):
                return len(shape) - 1
            return i if name != "sfluxrefo" else 0
    return len(shape) - 1


def main():
    kg_text = (REF / "src" / "rrtmg_sw_k_g.f90").read_text()
    subs = re.split(r"end subroutine sw_kgb\d+", kg_text)
    sub_map = {}
    for s in subs:
        m = re.search(r"subroutine sw_kgb(\d+)", s)
        if m:
            sub_map[int(m.group(1))] = s[m.end():]

    rwgt = compute_rwgt()
    out = {}
    for band in range(16, 30):
        shapes = parse_shapes(REF / "modules" / f"rrsw_kg{band}.f90")
        # keep only the original (o-suffixed + rayl scalars/arrays) tables
        orig = {}
        for name, (shape, offs) in shapes.items():
            if name.endswith("o") or name == "rayl":
                if name == "rayl" and shape == ():
                    orig[name] = (np.zeros(()), offs)
                elif name.startswith(("ka", "kb", "self", "for", "sflux",
                                      "abs", "rayl")):
                    orig[name] = (np.full(shape, np.nan), offs)
        # rayl may be declared for both orig and reduced; scalar rayl is orig
        orig = parse_subroutine(sub_map[band], orig)

        bi = band - 16
        for name, (arr, offs) in orig.items():
            if np.any(np.isnan(arr)):
                raise RuntimeError(f"band {band} table {name} incompletely parsed")
            if arr.ndim == 0:
                out[f"b{band}_{name}"] = arr
                continue
            gx = g_axis(name, arr.shape)
            if arr.shape[gx] != 16:
                raise RuntimeError(f"band {band} {name}: bad g axis {arr.shape}")
            weighted = not name.startswith("sfluxref")
            red = segment_reduce(arr, bi, rwgt, gx, weighted)
            new = name[:-1] if name.endswith("o") else name
            out[f"b{band}_{new}"] = red

    # reference MLS atmosphere (swatmref, rrtmg_sw_setcoef.f90:289-352)
    setcoef = (REF / "src" / "rrtmg_sw_setcoef.f90").read_text()
    atm = {"pref": (np.full(59, np.nan), (1,)),
           "preflog": (np.full(59, np.nan), (1,)),
           "tref": (np.full(59, np.nan), (1,))}
    m = re.search(r"subroutine swatmref(.*?)end subroutine", setcoef, re.S)
    atm = parse_subroutine(m.group(1), atm)
    for k, (v, _) in atm.items():
        assert not np.any(np.isnan(v)), k
        out[k] = v

    out["ngc"] = np.array(NGC)
    out["ngs"] = np.array(NGS)
    out["wavenum1"] = WAVENUM1
    out["wavenum2"] = WAVENUM2
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **out)
    total = sum(v.size for v in out.values())
    print(f"wrote {OUT} ({len(out)} arrays, {total} values, "
          f"{OUT.stat().st_size/1e6:.2f} MB)")
    for band in range(16, 30):
        keys = sorted(k for k in out if k.startswith(f"b{band}_"))
        print(band, {k.split('_', 1)[1]: getattr(out[k], 'shape', ()) for k in keys})


if __name__ == "__main__":
    sys.exit(main())
