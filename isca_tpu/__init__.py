"""isca_tpu: a TPU-native idealized GCM framework (JAX/XLA/pjit/Pallas).

A from-scratch reimplementation of the capabilities of ExeClim/Isca — the hierarchy of
idealized global circulation models from barotropic vorticity through moist aquaplanets
to realistic-Earth configurations — designed for TPU: spectral transforms as batched
MXU einsums, vmapped column physics, `jax.sharding` meshes in place of MPI domain
decomposition, and functional (pytree state) semi-implicit leapfrog time stepping.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: large radiation graphs (RRTMG-SW is a
# 14-band, 112-g-point program) take minutes to compile on a TPU backend the
# first time; the disk cache makes that a once-per-machine cost. Opt out with
# ISCA_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("ISCA_TPU_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        # Default location: a source checkout keeps the cache INSIDE the repo
        # (exp/xla_cache) so it can be committed and survive ephemeral build
        # machines — a cold T213L30 compile is >7 min, a warm one ~40 s.
        # Installed-package (no exp/ sibling) falls back to ~/.cache.
        _repo_cache = _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "exp", "xla_cache")
        _default = (_repo_cache
                    if _os.path.isdir(_os.path.dirname(_repo_cache))
                    else _os.path.join(_os.path.expanduser("~"), ".cache",
                                       "isca_tpu_xla"))
        _cache_dir = _os.environ.get("ISCA_TPU_COMPILE_CACHE", _default)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from isca_tpu.constants import Constants, EARTH  # noqa: F401
from isca_tpu.spectral.transforms import (  # noqa: F401
    SphericalTransforms,
    make_transforms,
)
