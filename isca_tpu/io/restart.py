"""Checkpoint / restart: full model state pytrees to a single compressed file.

Replaces the reference's per-PE netCDF restarts + mppnccombine + tar.gz
archiving (atmosphere.res.nc / spectral_dynamics.res.nc etc., combined per
segment — experiment.py:304-359). Here the complete state (BOTH leapfrog time
levels, exactly as the reference requires for bitwise continuation) is one
host-side .npz with a JSON treedef, so `run(i)` chains from `res{i-1}`.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

# The TPU tunnel backend only supports plain host<->device transfers for
# REAL dtypes; complex leaves are split to (re, im) on device under jit and
# recombined host-side (and vice versa on load).
_split_c = jax.jit(lambda v: (jnp.real(v), jnp.imag(v)))
_join_c = jax.jit(lambda r, i: jax.lax.complex(r, i))


def _to_host(v):
    if hasattr(v, "dtype") and jnp.iscomplexobj(v):
        re, im = _split_c(v)
        return np.asarray(re) + 1j * np.asarray(im)
    return np.asarray(v)


def _to_device(arr, dtype):
    if np.iscomplexobj(arr):
        real_dt = np.zeros((), dtype).real.dtype
        return _join_c(jnp.asarray(np.ascontiguousarray(arr.real), real_dt),
                       jnp.asarray(np.ascontiguousarray(arr.imag), real_dt))
    return jnp.asarray(arr, dtype=dtype)


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = [jax.tree_util.keystr(p) for p, _ in flat]
    leaves = [_to_host(v) for _, v in flat]
    return paths, leaves, treedef


def save_restart(path: str, state) -> None:
    paths, leaves, _ = _flatten_with_paths(state)
    arrays = {f"leaf_{i}": leaf for i, leaf in enumerate(leaves)}
    # complex arrays: npz handles complex fine
    np.savez_compressed(path, _paths=json.dumps(paths), **arrays)


def load_restart(path: str, like):
    """Load into the structure of `like` (a template state pytree)."""
    data = np.load(path, allow_pickle=False)
    paths_saved = json.loads(str(data["_paths"]))
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    paths_like = [jax.tree_util.keystr(p) for p, _ in flat]
    if paths_saved != paths_like:
        raise ValueError(
            "restart structure mismatch:\n saved: %s\n model: %s"
            % (paths_saved[:5], paths_like[:5])
        )
    leaves = []
    for i, (_, tmpl) in enumerate(flat):
        arr = data[f"leaf_{i}"]
        if tuple(arr.shape) != tuple(np.shape(tmpl)):
            raise ValueError(
                f"restart resolution mismatch for leaf {paths_like[i]}: "
                f"{arr.shape} vs {np.shape(tmpl)}"
            )
        leaves.append(_to_device(arr, tmpl.dtype))
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(like), leaves)
