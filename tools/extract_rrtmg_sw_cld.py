#!/usr/bin/env python
"""Extract the RRTMG-SW cloud optical-property tables (swcldpr data
statements in rrtmg_sw_init.f90: Hu & Stamnes liquid, Streamer/Fu ice) into
isca_tpu/data/rrtmg_sw_cld.npz. Reuses the Fortran data-statement parser
from extract_rrtmg_sw.py."""

import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
from extract_rrtmg_sw import REF, parse_subroutine  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "isca_tpu" / "data" / "rrtmg_sw_cld.npz"

SHAPES = {
    # rrsw_cld.f90:40-46 (second dim is band 16..29 -> offset 16)
    "extliq1": ((58, 14), (1, 16)),
    "ssaliq1": ((58, 14), (1, 16)),
    "asyliq1": ((58, 14), (1, 16)),
    "extice2": ((43, 14), (1, 16)),
    "ssaice2": ((43, 14), (1, 16)),
    "asyice2": ((43, 14), (1, 16)),
    "extice3": ((46, 14), (1, 16)),
    "ssaice3": ((46, 14), (1, 16)),
    "asyice3": ((46, 14), (1, 16)),
    "fdlice3": ((46, 14), (1, 16)),
    # Ebert & Curry 1992 coefficients (rrsw_cld abari..fbari)
    "abari": ((5,), (1,)),
    "bbari": ((5,), (1,)),
    "cbari": ((5,), (1,)),
    "dbari": ((5,), (1,)),
    "ebari": ((5,), (1,)),
    "fbari": ((5,), (1,)),
}


def main():
    text = (REF / "src" / "rrtmg_sw_init.f90").read_text()
    m = re.search(r"subroutine swcldpr(.*?)end subroutine swcldpr", text, re.S)
    arrays = {k: (np.full(s, np.nan), off) for k, (s, off) in SHAPES.items()}
    arrays = parse_subroutine(m.group(1), arrays)
    out = {}
    for k, (v, _) in arrays.items():
        if np.any(np.isnan(v)):
            raise RuntimeError(f"{k} incompletely parsed")
        out[k] = v
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({sum(v.size for v in out.values())} values, "
          f"{OUT.stat().st_size/1e3:.0f} kB)")


if __name__ == "__main__":
    sys.exit(main())
