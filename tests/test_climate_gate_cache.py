"""Climate-gate state cache: checkpoint/resume must be bit-transparent.

The giant-planet gate (tools/climate_gate.py gate_giant) chains its
multi-thousand-day spinup across sessions through an npz state cache —
mirroring the reference's own restart-file chaining of long test-case
integrations (run segments + restarts, exp/test_cases/*). A resumed
integration must be bit-identical to an uninterrupted one.
"""

import jax
import numpy as np

from tools.climate_gate import _load_state_cache, _save_state_cache
from isca_tpu.models.giant import giant_planet_model


def test_gate_cache_roundtrip_and_bit_identical_resume(tmp_path):
    m = giant_planet_model(resolution="T21", num_levels=6)
    path = str(tmp_path / "giant_T21.npz")

    s0 = m.initial_state()
    s1 = jax.jit(lambda x: m.run(x, 4, first=True))(s0)
    _save_state_cache(path, s1, 7)
    s1r, days = _load_state_cache(path, m.initial_state())
    assert days == 7

    leaves = jax.tree_util.tree_leaves(s1)
    leaves_r = jax.tree_util.tree_leaves(s1r)
    assert len(leaves) == len(leaves_r)
    for a, b in zip(leaves, leaves_r):
        assert a.dtype == b.dtype
        assert np.array_equal(np.asarray(a), np.asarray(b))

    run4 = jax.jit(lambda x: m.run(x, 4, first=False))
    for a, b in zip(jax.tree_util.tree_leaves(run4(s1)),
                    jax.tree_util.tree_leaves(run4(s1r))):
        assert np.array_equal(np.asarray(a), np.asarray(b))
