"""Namelist migration tool (tools/from_namelist.py): the reference's
input.nml + diag_table configuration surface must build equivalent models
(VERDICT round-1 item 5).  The three namelists under exp/namelists/ are
faithful transcriptions of the reference test cases
(exp/test_cases/{held_suarez,frierson,MiMA}/*_test_case.py namelist dicts).
"""

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tools.from_namelist import (
    model_from_namelist,
    parse_diag_table,
    parse_namelist,
)

NML_DIR = os.path.join(os.path.dirname(__file__), "..", "exp", "namelists")


def load(name):
    with open(os.path.join(NML_DIR, name)) as fh:
        return parse_namelist(fh.read())


class TestParser:
    def test_grammar(self):
        nml = parse_namelist("""
! comment
&grp_a
    x = 1, y = 2.5e-3
    s = 'hello ! not comment'
    flag = .true., other = F
    arr = 1., 2.,
          3., 4.
    rep = 3*0.5
    dexp = 1.5d2
/
&grp_b
   lst = 'a', 'b'
/
""")
        a = nml["grp_a"]
        assert a["x"] == 1 and a["y"] == 2.5e-3
        assert a["s"] == "hello ! not comment"
        assert a["flag"] is True and a["other"] is False
        assert a["arr"] == [1.0, 2.0, 3.0, 4.0]
        assert a["rep"] == [0.5, 0.5, 0.5]
        assert a["dexp"] == 150.0
        assert nml["grp_b"]["lst"] == ["a", "b"]

    def test_diag_table(self):
        dt = parse_diag_table("""
experiment name
2000 1 1 0 0 0
"atmos_monthly", 30, "days", 1, "days", "time",
"dynamics", "ps", "ps", "atmos_monthly", "all", .true., "none", 2,
"dynamics", "bk", "bk", "atmos_monthly", "all", .false., "none", 2,
""")
        assert "atmos_monthly" in dt.files
        spec = dt.files["atmos_monthly"]
        assert spec.output_freq_seconds == 30 * 86400
        names = [f.name for f in spec.fields]
        assert names == ["ps", "bk"]
        assert spec.fields[0].reduction == "average"
        assert spec.fields[1].reduction == "instantaneous"


class TestReferenceCases:
    """Every reference namelist key maps (or is explicitly obsolete) — no
    silent drops, and the built configs carry the reference values."""

    def test_held_suarez(self):
        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)
            model = model_from_namelist(load("held_suarez.nml"))
        c = model.config
        assert type(model).__name__ == "HeldSuarezModel"
        core = c.core
        assert core.resolution == "T42" and core.num_levels == 25
        assert core.dt == 600.0
        assert core.damping_order == 4
        assert core.vert_coord_option == "uneven_sigma"
        assert dict(core.vert_coord_kwargs) == {
            "scale_heights": 6.0, "surf_res": 0.5, "exponent": 7.5}
        assert core.valid_range_t == (100.0, 800.0)
        assert core.reference_sea_level_press == 1.0e5
        f = c.forcing
        assert f.t_zero == 315.0 and f.sigma_b == 0.7 and f.kf == -1.0

    def test_frierson(self):
        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)
            model = model_from_namelist(load("frierson.nml"))
        c = model.config
        assert type(model).__name__ == "GreyMoistModel"
        p = c.physics
        assert p.radiation_scheme == "two_stream"
        assert p.radiation.rad_scheme == "frierson"
        assert p.radiation.atm_abs == 0.2 and not p.radiation.do_seasonal
        assert p.convection_scheme == "SIMPLE_BETTS_MILLER"
        assert p.do_damping and p.turb and p.mixed_layer_bc
        assert p.roughness_mom == 3.21e-5
        assert p.do_simple_sat and p.bl_scheme == "diffusivity"
        assert p.gust_const == 0.0
        assert p.bl.do_simple and not p.surface.use_virtual_temp
        assert p.mixed_layer.depth == 2.5 and p.mixed_layer.albedo_value == 0.31
        assert p.mixed_layer.tconst == 285.0
        assert p.convection.rhbm == 0.7 and p.convection.Tmin == 160.0
        assert p.condensation.do_simple and p.condensation.do_evap
        assert p.damping.do_rayleigh and p.damping.trayfric == -0.25
        assert p.damping.sponge_pbottom == 5000.0
        assert c.core.dt == 720.0 and c.initial_sphum == 2e-6
        assert c.core.robert_coeff == 0.03
        assert c.core.do_water_correction

    def test_mima(self):
        model = model_from_namelist(load("mima.nml"))
        c = model.config
        p = c.physics
        assert p.radiation_scheme == "rrtm"
        assert p.rrtm.solr_cnst == 1360
        assert p.dt_rad == 7200.0
        assert p.mixed_layer.depth == 100 and p.mixed_layer.albedo_value == 0.205
        assert p.mixed_layer.do_qflux and p.mixed_layer.qflux_amp == 30.0
        assert c.core.num_levels == 40
        assert dict(c.core.vert_coord_kwargs) == {
            "scale_heights": 11.0, "surf_res": 0.5, "exponent": 7.0}

    def test_trajectory_identity_vs_handbuilt(self):
        """A namelist-built Frierson model must step identically to the same
        configuration built by hand (reduced to T21L8 for speed; identical
        overrides applied to both sides)."""
        from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel
        from isca_tpu.physics.moist_driver import MoistPhysicsConfig
        from isca_tpu.physics.two_stream_gray import TwoStreamConfig
        from isca_tpu.physics.mixed_layer import MixedLayerConfig
        from isca_tpu.physics.damping_driver import DampingDriverConfig
        from isca_tpu.dycore.primitive import PrimitiveConfig

        overrides = dict(resolution="T21", num_levels=8, dt=1200.0,
                         dtype=jnp.float64)
        nml_model = model_from_namelist(load("frierson.nml"), **overrides)

        hand_core = PrimitiveConfig(
            damping_order=4, water_correction_limit=200.0e2,
            reference_sea_level_press=1.0e5, valid_range_t=(100.0, 800.0),
            vert_coord_option="uneven_sigma",
            vert_coord_kwargs=(("scale_heights", 6.0), ("surf_res", 0.5),
                               ("exponent", 7.5)),
            robert_coeff=0.03, do_water_correction=True,
            use_virtual_temperature=False, **overrides)
        hand = GreyMoistModel(GreyMoistConfig(
            core=hand_core,
            physics=nml_model.config.physics,   # physics equality checked above
            initial_sphum=2e-6))
        assert hand.config.core == nml_model.config.core

        s_nml = jax.jit(lambda s: nml_model.run(s, 6))(nml_model.initial_state())
        s_hand = jax.jit(lambda s: hand.run(s, 6))(hand.initial_state())
        np.testing.assert_array_equal(np.asarray(s_nml.dyn.tg.curr),
                                      np.asarray(s_hand.dyn.tg.curr))
        np.testing.assert_array_equal(np.asarray(s_nml.t_surf),
                                      np.asarray(s_hand.t_surf))
