"""Test configuration: run on a virtual 8-device CPU mesh with float64 available.

Multi-chip sharding is validated on host CPU devices
(--xla_force_host_platform_device_count), mirroring how the driver dry-runs the
multichip path. Numerical-equivalence tests use float64 (available on CPU).

The ambient environment may carry an `axon` TPU-tunnel sitecustomize that force-
registers a remote TPU backend (and wins over JAX_PLATFORMS env). Overriding via
jax.config *after* import reliably selects the local in-process CPU backend.
"""

import os
import tempfile

# CPU-compiled cache entries are machine-specific and must not litter the
# git-tracked exp/xla_cache (reserved for curated TPU program entries);
# redirect the persistent compile cache for every test run.
os.environ.setdefault("ISCA_TPU_COMPILE_CACHE",
                      tempfile.mkdtemp(prefix="isca_test_xla_"))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
