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


def change_resolution(state_old, T_old, T_new, state_new_template):
    """Map a restart state to a new horizontal resolution.

    The reference ships scripts/change_horizontal_resolution_of_restart_file
    to re-run a case at a different truncation from an existing restart.
    Here: complex spectral fields are zero-padded / truncated in (m, n)
    (exact); real grid fields are bilinearly regridded; shape-preserved
    leaves (scalars, level-profile arrays, RNG keys) pass through.

    Vertical level counts must match between the two templates.
    """
    from isca_tpu.utils.input_files import regrid_bilinear

    lats_o = np.degrees(np.asarray(T_old.lats))
    lons_o = np.degrees(np.asarray(T_old.lons))
    lats_n = np.degrees(np.asarray(T_new.lats))
    lons_n = np.degrees(np.asarray(T_new.lons))
    go = (len(lats_o), len(lons_o))
    gn = (len(lats_n), len(lons_n))

    def regrid_stack(a, lat_axis):
        """Regrid with the (lat, lon) pair starting at `lat_axis`."""
        a = np.moveaxis(a, (lat_axis, lat_axis + 1), (-2, -1))
        lead = a.shape[:-2]
        out = np.stack([
            regrid_bilinear(lats_o, lons_o, f, lats_n, lons_n)
            for f in a.reshape((-1,) + a.shape[-2:])
        ])
        out = out.reshape(lead + gn)
        return np.moveaxis(out, (-2, -1), (lat_axis, lat_axis + 1))

    flat_old, treedef = jax.tree_util.tree_flatten_with_path(state_old)
    flat_new = jax.tree_util.tree_flatten_with_path(state_new_template)[0]
    leaves = []
    for (path, old), (_, new) in zip(flat_old, flat_new):
        a = _to_host(old)
        tgt_shape = np.shape(new)
        if a.shape == tgt_shape:
            leaves.append(_to_device(a, new.dtype if hasattr(new, "dtype")
                                     else a.dtype))
            continue
        if np.iscomplexobj(a):
            # spectral (..., m, n): pad/truncate exactly
            out = np.zeros(tgt_shape, a.dtype)
            m = min(a.shape[-2], tgt_shape[-2])
            n = min(a.shape[-1], tgt_shape[-1])
            out[..., :m, :n] = a[..., :m, :n]
            leaves.append(_to_device(out, new.dtype))
            continue
        # find the (lat, lon) axis pair
        lat_axis = None
        for ax in range(a.ndim - 1):
            if (a.shape[ax], a.shape[ax + 1]) == go and \
               (tgt_shape[ax], tgt_shape[ax + 1]) == gn:
                lat_axis = ax
                break
        if lat_axis is None:
            raise ValueError(
                f"cannot convert leaf {jax.tree_util.keystr(path)}: "
                f"{a.shape} -> {tgt_shape}")
        leaves.append(_to_device(regrid_stack(a, lat_axis), new.dtype))
    return jax.tree_util.tree_unflatten(treedef, [l for l in leaves])
