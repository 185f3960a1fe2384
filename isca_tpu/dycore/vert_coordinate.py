"""Hybrid sigma-pressure vertical coordinate definition.

Reference: src/atmos_spectral/init/vert_coordinate.F90:89-310. Produces the
half-level coefficients (pk, bk) with p_half(k) = pk(k) + bk(k) * ps,
k = 0..num_levels (index 0 = model top), as plain numpy arrays (init-time only).

Options (same names/semantics as vert_coord_option):
  'even_sigma'    : bk = k/N
  'uneven_sigma'  : smooth stretch bk = exp(-z * scale_heights),
                    z = surf_res*zeta + (1-surf_res)*zeta^exponent, zeta = 1-k/N
  'hybrid'        : pure pressure above p_press blending to sigma below p_sigma
  'input'         : user-provided pk/bk arrays
"""

from __future__ import annotations

import numpy as np


def even_sigma(num_levels: int) -> tuple[np.ndarray, np.ndarray]:
    b = np.arange(num_levels + 1, dtype=np.float64) / num_levels
    return np.zeros(num_levels + 1), b


def uneven_sigma(
    num_levels: int,
    scale_heights: float = 4.0,
    surf_res: float = 1.0,
    exponent: float = 2.0,
    zero_top: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    k = np.arange(num_levels + 1, dtype=np.float64)
    zeta = 1.0 - k / num_levels
    z = surf_res * zeta + (1.0 - surf_res) * zeta**exponent
    b = np.exp(-z * scale_heights)
    b[-1] = 1.0
    if zero_top:
        b[0] = 0.0
    return np.zeros(num_levels + 1), b


def hybrid(
    num_levels: int,
    p_press: float = 10000.0,
    p_sigma: float = 30000.0,
    p_ref: float = 101325.0,
    scale_heights: float = 4.0,
    surf_res: float = 1.0,
    exponent: float = 2.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Pure pressure above p_press, pure sigma below p_sigma, smooth blend between.

    (vert_coordinate.F90:124-186: sigma levels from the uneven stretch, converted
    to a pressure profile at p_ref, then partitioned between pk and bk.)
    """
    _, b_sig = uneven_sigma(num_levels, scale_heights, surf_res, exponent, zero_top=False)
    p = b_sig * p_ref
    # weight: 1 = pure sigma, 0 = pure pressure
    w = (p - p_press) / (p_sigma - p_press)
    w = np.clip(w, 0.0, 1.0) ** 2  # smooth quadratic blend
    bk = b_sig * w
    pk = p - bk * p_ref
    pk[0] = max(pk[0], 0.0)
    pk[-1] = 0.0
    bk[-1] = 1.0
    return pk, bk


def compute_vert_coord(option: str = "even_sigma", num_levels: int = 18, **kw):
    if option == "even_sigma":
        return even_sigma(num_levels)
    if option == "uneven_sigma":
        return uneven_sigma(num_levels, **kw)
    if option == "hybrid":
        return hybrid(num_levels, **kw)
    if option == "input":
        return np.asarray(kw["pk"], np.float64), np.asarray(kw["bk"], np.float64)
    raise ValueError(f"invalid vert_coord_option: {option}")
