"""Multi-device sharding tests on the virtual 8-device CPU mesh (SURVEY stage 5).

Checks that the sharded step (latitude-band grid sharding + m-sharded spectral,
XLA-inserted collectives) is numerically identical to the single-device step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isca_tpu.dycore.primitive import PrimitiveConfig
from isca_tpu.models.dry import HeldSuarezConfig, HeldSuarezModel
from isca_tpu.parallel.mesh import make_mesh, shard_pytree, sharding_pytree


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestSharding:
    def test_sharded_step_matches_single_device(self):
        core = PrimitiveConfig(resolution=31, num_levels=8, dt=600.0, dtype=jnp.float64)
        model = HeldSuarezModel(HeldSuarezConfig(core=core))
        s0 = model.initial_state()

        ref = jax.jit(lambda s: model.run(s, 6))(s0)

        mesh = make_mesh(8)
        s_sh = shard_pytree(mesh, s0)
        out_sh = sharding_pytree(mesh, s_sh)
        stepped = jax.jit(lambda s: model.run(s, 6), out_shardings=out_sh)(s_sh)

        np.testing.assert_allclose(
            np.asarray(stepped.tg.curr), np.asarray(ref.tg.curr), atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(stepped.psg.curr), np.asarray(ref.psg.curr), atol=1e-8
        )
        # output really is sharded over latitude
        assert len(stepped.tg.curr.sharding.device_set) == 8

    def test_barotropic_sharded(self):
        from isca_tpu.models.barotropic import BarotropicConfig, BarotropicModel

        cfg = BarotropicConfig(resolution=31, dt=1200.0, dtype=jnp.float64)
        model = BarotropicModel(cfg)
        s0 = model.initial_state()
        ref = jax.jit(lambda s: model.run(s, 12))(s0)

        mesh = make_mesh(8)
        s_sh = shard_pytree(mesh, s0)
        out = jax.jit(lambda s: model.run(s, 12),
                      out_shardings=sharding_pytree(mesh, s_sh))(s_sh)
        np.testing.assert_allclose(
            np.asarray(out.vorg.curr), np.asarray(ref.vorg.curr), atol=1e-13
        )
