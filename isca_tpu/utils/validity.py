"""Prognostic-field validity guard + graceful shutdown.

Reference: spectral_dynamics.F90:940-1005 — every step the Fortran model
checks the new grid temperature against `valid_range_t`; on violation it
prints the located extremum (PE, lon/lat/level indices and coordinates) and
runs the `graceful_shutdown` consensus protocol: root gathers per-PE validity
flags, broadcasts the verdict, and all PEs flush the diag_manager before
FATALing together so partial output survives (:976-1005, P8 in SURVEY §2.9).

TPU-native translation: the check is a pair of global reductions inside the
jitted step/chunk — on a sharded mesh `jnp.min/max` over a distributed array
IS the consensus all-reduce (XLA inserts it), so no explicit protocol is
needed.  The host reads one scalar per diagnostic chunk; `Experiment.run`
flushes diagnostics first (already per-chunk) and then raises
`FailedRunError` with the located extremum, exactly the reference's
"flush-then-abort-together" contract.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ValidityReport(NamedTuple):
    """Result of a range check; all fields are (possibly sharded) scalars
    except the index vectors, so the host transfer is tiny."""
    ok: jax.Array        # () bool — field entirely inside [lo, hi]
    vmin: jax.Array      # () extrema
    vmax: jax.Array
    min_idx: jax.Array   # (ndim,) int32 multi-index of the minimum
    max_idx: jax.Array


def check_range(field: jax.Array, lo: float, hi: float) -> ValidityReport:
    """Range-check a field; jit/scan-safe (all outputs are arrays).

    The argmin/argmax are computed on the flattened array then unravelled —
    one pass, no data-dependent control flow (graceful on TPU)."""
    flat = field.reshape(-1)
    imin = jnp.argmin(flat)
    imax = jnp.argmax(flat)
    vmin = flat[imin]
    vmax = flat[imax]
    unravel = lambda i: jnp.stack(jnp.unravel_index(i, field.shape)).astype(jnp.int32)
    return ValidityReport(
        ok=(vmin >= lo) & (vmax <= hi),
        vmin=vmin, vmax=vmax,
        min_idx=unravel(imin), max_idx=unravel(imax),
    )


def describe_violation(name: str, report: ValidityReport, lo: float, hi: float,
                       lats=None, lons=None, level_axis: int | None = 0) -> str:
    """Render the reference's located-extremum printout
    (spectral_dynamics.F90:949-963: 'temperatures out of valid range' with
    lon/lat/level indices and degrees).  lats/lons in radians if given."""
    vmin, vmax = float(report.vmin), float(report.vmax)
    lines = [f"{name} out of valid range [{lo}, {hi}]: "
             f"min={vmin:.3f}, max={vmax:.3f}"]
    for label, val, idx, bad in (("minimum", vmin, report.min_idx, vmin < lo),
                                 ("maximum", vmax, report.max_idx, vmax > hi)):
        if not bad:
            continue
        idx = np.asarray(idx)
        loc = f"index {tuple(int(i) for i in idx)}"
        if lats is not None and lons is not None and idx.size >= 2:
            off = 1 if (level_axis == 0 and idx.size >= 3) else 0
            j, k = int(idx[off]), int(idx[off + 1])
            loc += (f" = (lat {np.degrees(float(lats[j])):.2f}deg, "
                    f"lon {np.degrees(float(lons[k])):.2f}deg")
            if off:
                loc += f", level {int(idx[0])}"
            loc += ")"
        lines.append(f"  {label} {val:.3f} at {loc}")
    return "\n".join(lines)
