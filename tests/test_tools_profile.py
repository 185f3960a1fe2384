"""tools/profile_step.py must produce a sane roofline record on any backend
(CPU here; the chip adds the %-of-peak fields)."""

import jax.numpy as jnp

from isca_tpu.dycore.primitive import PrimitiveConfig
from isca_tpu.models.dry import HeldSuarezConfig, HeldSuarezModel


def test_profile_model_record(tmp_path):
    from tools.profile_step import phase_breakdown, profile_model

    core = PrimitiveConfig(resolution="T21", num_levels=8, dt=1800.0,
                           dtype=jnp.float32)
    model = HeldSuarezModel(HeldSuarezConfig(core=core))
    rec, state = profile_model("hs_t21_test", model, model.initial_state(),
                               1800.0, chunk=10)
    assert rec["xla_flops_per_step"] > 1e6       # a real step does real FLOPs
    assert rec["xla_bytes_per_step"] > 1e5
    assert rec["step_ms"] > 0
    assert rec["achieved_gflops"] > 0
    assert rec["arithmetic_intensity_flop_per_byte"] > 0
    ph = phase_breakdown(model, state, chunk=10)
    assert ph["full_step_ms"] > 0
    assert ph["dynamics_only_ms"] > 0
    assert ph["transform_roundtrip_4L1_ms"] > 0
