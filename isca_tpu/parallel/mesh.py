"""Device-mesh sharding for the spectral GCM.

TPU-native counterpart of the reference's MPI domain decomposition
(src/atmos_spectral/tools/spec_mpp.F90): grid space is sharded over latitude
bands (physics is column-local -> embarrassingly parallel, no halos) and
spectral space over zonal wavenumber m; the grid<->spectral transforms
re-partition between the two layouts, which under jit becomes the XLA
all-to-all / all-gather that corresponds to the reference's ring
`mpp_transmit` transposes (transforms.F90:970-1056, P1-P5 in SURVEY.md §2.9).

Round-1 strategy: one mesh axis ("x"). Grid arrays shard on their latitude
axis; spectral arrays shard on m when divisible (else replicate — they are
small). XLA/GSPMD inserts the collectives; shard_map pipelining is a later
optimization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), axis_names=("x",))


def _spec_for(mesh: Mesh, x: jax.Array) -> NamedSharding:
    """Choose a sharding for one array by shape heuristics.

    grid (..., lat, lon): shard lat (axis -2) if divisible.
    spectral (..., m, n) complex: shard m (axis -2) if divisible.
    1D/scalar: replicate.
    """
    n = mesh.devices.size
    if x.ndim >= 2 and x.shape[-2] % n == 0:
        spec = [None] * x.ndim
        spec[-2] = "x"
        return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def shard_pytree(mesh: Mesh, tree):
    """device_put a pytree with per-leaf shardings chosen by _spec_for."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, _spec_for(mesh, x)), tree
    )


def sharding_pytree(mesh: Mesh, tree):
    """The sharding pytree (for in_shardings/out_shardings of jit)."""
    return jax.tree_util.tree_map(lambda x: _spec_for(mesh, x), tree)
