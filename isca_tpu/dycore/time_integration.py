"""Leapfrog time stepping with the Robert-Asselin-(Williams) filter, functional style.

Reference: src/atmos_spectral/model/leapfrog.F90. The Fortran mutates a
(..., num_time_levels) array in place via rotating (previous, current, future)
indices; here state is an immutable (prev, curr) pair and each function returns new
values. Semantics reproduced exactly (verified against leapfrog.F90:58-247):

Plain leapfrog (used by barotropic/shallow models, leapfrog.F90:217-247):
    P      = prev - 2*curr
    future = prev + delta_t * tend
    curr'  = curr + nu*kappa*(P + future)
    fut'   = future + nu*(kappa-1)*(P + future)
  (nu = robert_coeff, kappa = raw_filter_coeff; kappa=1 -> classic Robert-Asselin.)

Two-part split (primitive-equation core): part A applies the (P)-portion and the
forward step; part B adds the (+future)-portion *after* the global fixers and next
step's physics have seen/modified the fields (spectral_dynamics.F90:1456-1490) —
so B takes the corrected future. The first step is forward Euler: prev == curr,
delta_t = dt; thereafter delta_t = 2*dt (atmosphere.F90:292-296).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TwoLevel(NamedTuple):
    """A prognostic variable at two time levels (any pytree leaves)."""

    prev: jax.Array
    curr: jax.Array


def leapfrog(
    x: TwoLevel,
    tend: jax.Array,
    delta_t: jax.Array | float,
    robert_coeff: float = 0.04,
    raw_coeff: float = 1.0,
) -> TwoLevel:
    """Filtered leapfrog step: returns (filtered current, future) as the new pair."""
    P = x.prev - 2.0 * x.curr
    future = x.prev + delta_t * tend
    curr = x.curr + robert_coeff * raw_coeff * (P + future)
    future = future + robert_coeff * (raw_coeff - 1.0) * (P + future)
    return TwoLevel(prev=curr, curr=future)


def leapfrog_part_a(
    x: TwoLevel,
    tend: jax.Array,
    delta_t: jax.Array | float,
    robert_coeff: float = 0.04,
    raw_coeff: float = 1.0,
) -> tuple[TwoLevel, jax.Array]:
    """Part A: forward step + (prev - 2 curr) filter portion.

    Returns the new (partially-filtered current, future) pair plus the saved
    P = prev - 2*curr needed by part B.
    """
    P = x.prev - 2.0 * x.curr
    future = x.prev + delta_t * tend
    curr = x.curr + robert_coeff * raw_coeff * P
    return TwoLevel(prev=curr, curr=future), P


def leapfrog_part_b(
    x: TwoLevel,
    P: jax.Array,
    robert_coeff: float = 0.04,
    raw_coeff: float = 1.0,
) -> TwoLevel:
    """Part B (deferred): completes the filter with the (possibly corrected) future.

    Here x.prev is the partially-filtered 'current' from part A and x.curr the
    future field after global fixers / physics updates.
    """
    curr = x.prev + robert_coeff * raw_coeff * x.curr
    future = x.curr + robert_coeff * (raw_coeff - 1.0) * (P + x.curr)
    return TwoLevel(prev=curr, curr=future)
