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

    def test_padded_transforms_match_unpadded(self):
        """m-axis zero padding (22 -> 24 rows at T21) changes nothing."""
        from isca_tpu.spectral import transforms as tr

        T0 = tr.make_transforms("T21", dtype=jnp.float64)
        Tp = tr.make_transforms("T21", dtype=jnp.float64, pad_m_to=8)
        M1 = T0.num_fourier + 1
        assert Tp.num_fourier + 1 == 24 and Tp.num_fourier_true == 21

        rng = np.random.default_rng(0)
        g = jnp.asarray(rng.standard_normal((5, T0.nlat, T0.nlon)))
        s0, sp = tr.grid_to_spec(T0, g), tr.grid_to_spec(Tp, g)
        np.testing.assert_allclose(np.asarray(sp[..., :M1, :]), np.asarray(s0),
                                   atol=1e-12)
        assert float(jnp.abs(sp[..., M1:, :]).max()) == 0.0
        np.testing.assert_allclose(np.asarray(tr.spec_to_grid(Tp, sp)),
                                   np.asarray(tr.spec_to_grid(T0, s0)), atol=1e-12)

        u = jnp.asarray(rng.standard_normal((3, T0.nlat, T0.nlon)))
        v = jnp.asarray(rng.standard_normal((3, T0.nlat, T0.nlon)))
        vor0, div0 = tr.vor_div_from_uv_grid(T0, u, v)
        vorp, divp = tr.vor_div_from_uv_grid(Tp, u, v)
        np.testing.assert_allclose(np.asarray(vorp[..., :M1, :]),
                                   np.asarray(vor0), atol=1e-12)
        u0, v0 = tr.uv_grid_from_vor_div(T0, vor0, div0)
        up, vp = tr.uv_grid_from_vor_div(Tp, vorp, divp)
        np.testing.assert_allclose(np.asarray(up), np.asarray(u0), atol=1e-12)
        np.testing.assert_allclose(np.asarray(vp), np.asarray(v0), atol=1e-12)

    def test_moist_sharded_matches_single_standard_truncation(self):
        """Flagship moist model (grid tracer incl.) at a STANDARD truncation:
        8-device shard_map transpose path vs single device, f64 equality.

        The m axis (22 rows at T21) does not divide 8 — this exercises the
        zero-padding + all_to_all transpose machinery end to end (VERDICT
        round-1 item 1)."""
        from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel

        def build(mesh):
            core = PrimitiveConfig(
                resolution="T21", num_levels=8, dt=720.0, dtype=jnp.float64,
                do_water_correction=True, robert_coeff=0.03, mesh=mesh,
            )
            return GreyMoistModel(GreyMoistConfig(core=core))

        ref_model = build(None)
        s0 = ref_model.initial_state()
        ref = jax.jit(lambda s: ref_model.run(s, 6))(s0)

        mesh = make_mesh(8)
        model = build(mesh)
        nlat = model.core.T.nlat
        s_sh = shard_pytree(mesh, model.initial_state(), nlat=nlat)
        out_sh = sharding_pytree(mesh, s_sh, nlat=nlat)
        out = jax.jit(lambda s: model.run(s, 6), out_shardings=out_sh)(s_sh)

        np.testing.assert_allclose(np.asarray(out.dyn.tg.curr),
                                   np.asarray(ref.dyn.tg.curr), atol=1e-9)
        np.testing.assert_allclose(np.asarray(out.dyn.psg.curr),
                                   np.asarray(ref.dyn.psg.curr), atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(out.dyn.tracers["sphum"].curr),
            np.asarray(ref.dyn.tracers["sphum"].curr), atol=1e-12)
        np.testing.assert_allclose(np.asarray(out.t_surf),
                                   np.asarray(ref.t_surf), atol=1e-9)
        # spectral state really m-sharded: distinct m blocks per device
        rows = {s.index[-2] for s in out.dyn.ts.curr.addressable_shards}
        assert len(rows) == 8, f"spectral m axis replicated: {rows}"

    def test_overlap_chunks_pipeline(self):
        """Comm/compute overlap (SURVEY hard part #3): overlap_chunks=k
        splits each sharded transform into k independent
        DFT->all_to_all->Legendre chains (k all-to-alls in HLO, overlappable
        by XLA's async-collective scheduler) and is bit-identical to the
        monolithic transpose."""
        from isca_tpu.spectral import transforms as tr

        mesh = make_mesh(8)
        T1 = tr.make_transforms("T42", dtype=jnp.float64, mesh=mesh,
                                overlap_chunks=1)
        T3 = tr.make_transforms("T42", dtype=jnp.float64, mesh=mesh,
                                overlap_chunks=3)
        rng = np.random.default_rng(0)
        g = jnp.asarray(rng.standard_normal((7, T1.nlat, T1.nlon)))
        s1, s3 = tr.grid_to_spec(T1, g), tr.grid_to_spec(T3, g)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s3))
        np.testing.assert_array_equal(np.asarray(tr.spec_to_grid(T1, s1)),
                                      np.asarray(tr.spec_to_grid(T3, s3)))

        h1 = jax.jit(lambda x: tr.grid_to_spec(T1, x)).lower(g).compile().as_text()
        h3 = jax.jit(lambda x: tr.grid_to_spec(T3, x)).lower(g).compile().as_text()
        assert h1.count("all-to-all(") == 1
        assert h3.count("all-to-all(") == 3, "chunked transposes not independent"
        hs3 = jax.jit(lambda s: tr.spec_to_grid(T3, s)).lower(s3).compile().as_text()
        assert hs3.count("all-to-all(") == 3

    def test_sharded_exotic_truncations(self):
        """mesh + rhomboidal truncation and mesh + fourier_inc>1 must agree
        with the single-device path (VERDICT r2 item 7)."""
        from isca_tpu.spectral import transforms as tr

        mesh = make_mesh(8)
        rng = np.random.default_rng(1)
        for kw in (dict(truncation_shape="rhomboidal"), dict(fourier_inc=2)):
            T0 = tr.make_transforms(21, dtype=jnp.float64, **kw)
            Tm = tr.make_transforms(21, dtype=jnp.float64, mesh=mesh, **kw)
            M1 = T0.num_fourier + 1
            g = jnp.asarray(rng.standard_normal((5, T0.nlat, T0.nlon)))
            s0, sm = tr.grid_to_spec(T0, g), tr.grid_to_spec(Tm, g)
            np.testing.assert_allclose(np.asarray(sm[..., :M1, :]),
                                       np.asarray(s0), atol=1e-12)
            np.testing.assert_allclose(np.asarray(tr.spec_to_grid(Tm, sm)),
                                       np.asarray(tr.spec_to_grid(T0, s0)),
                                       atol=1e-12)
            u = jnp.asarray(rng.standard_normal((3, T0.nlat, T0.nlon)))
            v = jnp.asarray(rng.standard_normal((3, T0.nlat, T0.nlon)))
            vor0, div0 = tr.vor_div_from_uv_grid(T0, u, v)
            vorm, divm = tr.vor_div_from_uv_grid(Tm, u, v)
            np.testing.assert_allclose(np.asarray(vorm[..., :M1, :]),
                                       np.asarray(vor0), atol=1e-12)
            um, vm = tr.uv_grid_from_vor_div(Tm, vorm, divm)
            u0, v0 = tr.uv_grid_from_vor_div(T0, vor0, div0)
            np.testing.assert_allclose(np.asarray(um), np.asarray(u0), atol=1e-12)
            np.testing.assert_allclose(np.asarray(vm), np.asarray(v0), atol=1e-12)

    def test_sharded_t85_flagship_resolution(self):
        """Sharded-vs-single equality at the BENCH resolution, dry HS T85L25
        (VERDICT r2 item 4a): 2 steps on the 8-device f64 mesh."""
        core = PrimitiveConfig(resolution="T85", num_levels=25, dt=600.0,
                               dtype=jnp.float64)
        model = HeldSuarezModel(HeldSuarezConfig(core=core))
        s0 = model.initial_state()
        ref = jax.jit(lambda s: model.run(s, 2))(s0)

        mesh = make_mesh(8)
        core_m = PrimitiveConfig(resolution="T85", num_levels=25, dt=600.0,
                                 dtype=jnp.float64, mesh=mesh)
        model_m = HeldSuarezModel(HeldSuarezConfig(core=core_m))
        nlat = model_m.core.T.nlat
        s_sh = shard_pytree(mesh, model_m.initial_state(), nlat=nlat)
        out_sh = sharding_pytree(mesh, s_sh, nlat=nlat)
        out = jax.jit(lambda s: model_m.run(s, 2), out_shardings=out_sh)(s_sh)

        np.testing.assert_allclose(np.asarray(out.tg.curr),
                                   np.asarray(ref.tg.curr), atol=1e-9)
        np.testing.assert_allclose(np.asarray(out.psg.curr),
                                   np.asarray(ref.psg.curr), atol=1e-7)
        np.testing.assert_allclose(np.asarray(out.ug.curr),
                                   np.asarray(ref.ug.curr), atol=1e-8)
        rows = {s.index[-2] for s in out.ts.curr.addressable_shards}
        assert len(rows) == 8, f"spectral m axis replicated: {rows}"

    def test_transform_repartition_is_all_to_all(self):
        """The grid<->spec re-partition must lower to all-to-all — never to an
        all-gather of grid/spectral-sized arrays (VERDICT round-1 item 1)."""
        import re

        from isca_tpu.spectral import transforms as tr

        mesh = make_mesh(8)
        T = tr.make_transforms("T42", dtype=jnp.float64, mesh=mesh)
        g_sh = jax.device_put(
            jnp.zeros((8, T.nlat, T.nlon)),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "x", None)),
        )

        fwd = jax.jit(lambda g: tr.spec_to_grid(T, tr.grid_to_spec(T, g)))
        hlo = fwd.lower(g_sh).compile().as_text()
        assert hlo.count("all-to-all") >= 2, "transpose path not all-to-all"
        big = T.nlat * T.nlon  # anything >= one grid level is "big"
        for line in hlo.splitlines():
            if "all-gather(" not in line:
                continue
            sz = 1
            for grp in re.findall(r"\[([\d,]*)\]", line.split("=")[0]):
                if grp:
                    for d in grp.split(","):
                        sz *= int(d)
            assert sz < big, f"grid-sized all-gather in transform HLO: {line[:120]}"
