"""Climate-gate state cache: checkpoint/resume must be step-exact.

The giant-planet and MiMA gates (tools/climate_gate.py) chain their
multi-thousand-day spinups across sessions through an npz state cache —
mirroring the reference's own restart-file chaining of long test-case
integrations (run segments + restarts, exp/test_cases/*). A resumed
integration must reproduce an uninterrupted one step-for-step: raw step
counters (never floor-divided days), float64 averaging accumulators carried
in the checkpoint, and a config fingerprint so a cache can never be resumed
under a different model configuration.
"""

import time

import jax
import numpy as np
import pytest

from tools.climate_gate import (WallBudget, _chained_spin_and_average,
                                _load_state_cache, _save_state_cache)
from isca_tpu.models.giant import giant_planet_model

FP = {"config": "test", "resolution": "T21", "num_levels": 6, "dt": 1800.0}


def test_gate_cache_roundtrip_and_bit_identical_resume(tmp_path):
    m = giant_planet_model(resolution="T21", num_levels=6)
    path = str(tmp_path / "giant_T21.npz")

    s0 = m.initial_state()
    s1 = jax.jit(lambda x: m.run(x, 4, first=True))(s0)
    _save_state_cache(path, s1, 7 * 48 + 3, FP)
    s1r, steps, avg_steps, accum = _load_state_cache(
        path, m.initial_state(), FP)
    assert steps == 7 * 48 + 3          # raw steps, not floor-divided days
    assert avg_steps == 0 and accum is None

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


def test_gate_cache_accumulator_roundtrip(tmp_path):
    m = giant_planet_model(resolution="T21", num_levels=6)
    path = str(tmp_path / "acc.npz")
    s = m.initial_state()
    acc = {"u": np.arange(12, dtype=np.float64).reshape(3, 4) * 1.7,
           "t": np.ones((2, 5), np.float64) * 300.25}
    _save_state_cache(path, s, 512, FP, avg_steps=256, accum=acc)
    _, steps, avg_steps, acc_r = _load_state_cache(path, m.initial_state(), FP)
    assert steps == 512 and avg_steps == 256
    assert set(acc_r) == {"u", "t"}
    for k in acc:
        assert acc_r[k].dtype == np.float64
        assert np.array_equal(acc_r[k], acc[k])


def test_gate_cache_fingerprint_mismatch(tmp_path):
    m = giant_planet_model(resolution="T21", num_levels=6)
    path = str(tmp_path / "fp.npz")
    _save_state_cache(path, m.initial_state(), 10, FP)
    wrong = dict(FP, resolution="T42")
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        _load_state_cache(path, m.initial_state(), wrong)
    # leaf-count mismatch is also a clear error, not a deep-jit KeyError
    small = jax.tree_util.tree_leaves(m.initial_state())[:2]
    with pytest.raises(ValueError, match="leaves"):
        _load_state_cache(path, small, FP)


def test_gate_cache_compressed_resume(tmp_path):
    """End-of-session recompression (docs/testing.md): a cache re-saved with
    np.savez_compressed for git must load bit-identically and keep the
    precision-pinned fingerprint. This is the cross-session survival path —
    only committed (hence compressed) caches outlive a build machine."""
    m = giant_planet_model(resolution="T21", num_levels=6,
                           transform_precision="high")
    fp = dict(FP, transform_precision="high")
    raw = str(tmp_path / "giant.npz")
    comp = str(tmp_path / "giant_comp.npz")
    s1 = jax.jit(lambda x: m.run(x, 2, first=True))(m.initial_state())
    _save_state_cache(raw, s1, 123, fp)
    with np.load(raw, allow_pickle=False) as d:
        np.savez_compressed(comp, **{k: d[k] for k in d.files})
    s1r, steps, _, _ = _load_state_cache(comp, m.initial_state(), fp)
    assert steps == 123
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s1r)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # a chain started at "high" must refuse to resume at "highest" (and
    # vice versa: the no-key legacy form != the pinned form)
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        _load_state_cache(comp, m.initial_state(), FP)


def test_chained_run_matches_uninterrupted(tmp_path):
    """A wall-budget kill mid-chain + resume == one uninterrupted run."""
    m = giant_planet_model(resolution="T21", num_levels=6)
    path = str(tmp_path / "chain.npz")
    fp = {"config": "giant", "resolution": "T21", "num_levels": 6,
          "dt": float(m.core.config.dt)}

    def fields(st):
        return {"u": st.dyn.ug.curr.mean(axis=-1)}

    spin, avg = 256, 256  # one CH chunk each

    # session 1: budget expires right after the first spinup chunk
    with pytest.raises(WallBudget):
        _chained_spin_and_average(
            m, m.initial_state(), fields, spin, avg, cache=path,
            fingerprint=fp, deadline=time.time() - 1.0)
    # session 2: resume and finish
    s_chained, zm_chained, steps_chained = _chained_spin_and_average(
        m, m.initial_state(), fields, spin, avg, cache=path, fingerprint=fp)
    # uninterrupted control
    s_once, zm_once, steps_once = _chained_spin_and_average(
        m, m.initial_state(), fields, spin, avg)

    assert steps_chained == steps_once == spin + avg
    for a, b in zip(jax.tree_util.tree_leaves(s_chained),
                    jax.tree_util.tree_leaves(s_once)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.array_equal(zm_chained["u"], zm_once["u"])
