"""isca_tpu: a TPU-native idealized GCM framework (JAX/XLA/pjit/Pallas).

A from-scratch reimplementation of the capabilities of ExeClim/Isca — the hierarchy of
idealized global circulation models from barotropic vorticity through moist aquaplanets
to realistic-Earth configurations — designed for TPU: spectral transforms as batched
MXU einsums, vmapped column physics, `jax.sharding` meshes in place of MPI domain
decomposition, and functional (pytree state) semi-implicit leapfrog time stepping.
"""

__version__ = "0.1.0"

from isca_tpu.constants import Constants, EARTH  # noqa: F401
from isca_tpu.spectral.transforms import (  # noqa: F401
    SphericalTransforms,
    make_transforms,
)
