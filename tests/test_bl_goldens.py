"""Frozen numerical goldens + scheme-discriminating checks for the
simplified boundary-layer / convection schemes (VERDICT r2 item 5).

The repo's edt / entrain / my25 / ras implementations compress the
reference's per-column iterative Fortran (edt.F90 4,800 LoC zisocl
layer-merging :2409-3027, entrain.F90, my25_turb.F90, ras.f90 5,207 LoC)
into closed-form vectorized kernels. Their documented deviations are
collected in docs/physics_deviations.md; these tests pin the actual numbers
on canonical columns (stable / dry-convective / cloud-topped) so any drift
in the simplified formulations is caught, and assert the behaviors that
DISCRIMINATE each scheme from a generic K-profile:

* EDT: cloud-top radiative TKE production -> entrainment K peak at the
  stratocumulus top exceeding the free-troposphere K (edt.F90 radf terms).
* entrain: positive radiatively-driven entrainment rate only in the
  cloud-topped column (entrain.F90 wentr_rad).
* MY2.5: neutral log-layer equilibrium TKE == the surface boundary value
  0.5*B1^(2/3)*u*^2 (production = dissipation balance, my25_turb.F90).
* RAS: strict column moisture closure and heating/drying consistency.

Regenerate after an intentional change:
    python tests/test_bl_goldens.py --update
"""

import json
import os
import sys

import numpy as np

if __name__ == "__main__":  # standalone golden regeneration
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "bl_goldens.json")
RTOL = 1e-7


def _fixture_dir():
    sys.path.insert(0, os.path.dirname(__file__))


def _entrain_edt_inputs():
    _fixture_dir()
    from test_entrain_edt import make_columns

    c = make_columns()
    kcld = c.pop("kcld")
    return c, kcld


def compute_entrain():
    from isca_tpu.physics.entrain import EntrainConfig, entrain

    c, kcld = _entrain_edt_inputs()
    res = entrain(EntrainConfig(), c["tdtlw"], jnp.zeros(3, bool),
                  c["u_star"], c["b_star"], c["t"], c["qv"], c["ql"],
                  c["qi"], c["qa"], c["u"], c["v"], c["z_full"],
                  c["p_full"], c["z_half"], c["p_half"],
                  jnp.zeros_like(c["t"]), jnp.zeros_like(c["t"]))
    return {
        "k_t": np.asarray(res.k_t).tolist(),
        "k_m": np.asarray(res.k_m).tolist(),
        "zsml": np.asarray(res.zsml).tolist(),
        "zradtop": np.asarray(res.zradtop).tolist(),
        "wentr_rad": np.asarray(res.wentr_rad).tolist(),
        "wentr_pbl": np.asarray(res.wentr_pbl).tolist(),
    }, res, kcld


def compute_edt():
    from isca_tpu.physics.edt import EDTConfig, edt

    c, kcld = _entrain_edt_inputs()
    res = edt(EDTConfig(), c["tdtlw"], c["u_star"], c["b_star"],
              c["t"], c["qv"], c["ql"], c["qi"], c["qa"],
              c["u"], c["v"], c["z_full"], c["p_full"],
              c["z_half"], c["p_half"])
    return {
        "k_t": np.asarray(res.k_t).tolist(),
        "k_m": np.asarray(res.k_m).tolist(),
        "tke": np.asarray(res.tke).tolist(),
        "pblh": np.asarray(res.pblh).tolist(),
    }, res, kcld, c


def compute_my25(iters=60):
    _fixture_dir()
    from test_my25_turb import make_bl

    from isca_tpu.physics.my25_turb import MY25Config, my25_turb, tke_surf

    ph, pf, theta, u, v, zh, zf = make_bl()
    cfg = MY25Config()
    L = u.shape[-1]
    tke = jnp.zeros(u.shape[:-1] + (L + 1,), u.dtype)
    u_star = jnp.full(u.shape[:-1], 0.3)
    tke = tke_surf(cfg, tke, u_star)
    z0 = jnp.full(u.shape[:-1], 0.1)
    res = None
    for _ in range(iters):
        res = my25_turb(cfg, 300.0, jnp.zeros(u.shape[:-1]), ph, pf, theta,
                        u, v, zh, zf, z0, tke, u_star=u_star)
        tke = res.tke
    return {
        "akm": np.asarray(res.akm).tolist(),
        "akh": np.asarray(res.akh).tolist(),
        "tke": np.asarray(res.tke).tolist(),
    }, res, u_star


def compute_ras():
    _fixture_dir()
    from test_ras import make_sounding

    from isca_tpu.physics.ras import RAS, RASConfig

    t, q, u, v, pf, ph, zh, svp = make_sounding()
    res = RAS(RASConfig(), svp)(1200.0, t, q, u, v, pf, ph, zh)
    return {
        "dt_t": np.asarray(res.dt_t).tolist(),
        "dt_q": np.asarray(res.dt_q).tolist(),
        "rain": np.asarray(res.rain).tolist(),
    }, res, (t, q, pf, ph)


COMPUTE = {
    "entrain": lambda: compute_entrain()[0],
    "edt": lambda: compute_edt()[0],
    "my25": lambda: compute_my25()[0],
    "ras": lambda: compute_ras()[0],
}


def _check(name):
    with open(GOLDEN_PATH) as f:
        goldens = json.load(f)
    assert name in goldens, f"no golden for {name}; run --update"
    got = COMPUTE[name]()
    for key, want in goldens[name].items():
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(want), rtol=RTOL,
            atol=RTOL * max(1.0, float(np.abs(np.asarray(want)).max())),
            err_msg=f"{name}.{key} drifted from golden")


class TestGoldens:
    def test_entrain_golden(self):
        _check("entrain")

    def test_edt_golden(self):
        _check("edt")

    def test_my25_golden(self):
        _check("my25")

    def test_ras_golden(self):
        _check("ras")


class TestDiscriminating:
    def test_edt_cloudtop_entrainment_peak(self):
        """EDT's radiative TKE production must put the K_t maximum of the
        cloud-topped column at/near the stratocumulus top, exceeding the
        free-troposphere K above it (edt.F90 radf production; a plain
        K-profile would have no cloud-top K at all)."""
        _, res, kcld, c = compute_edt()
        kt = np.asarray(res.k_t)
        near_top = kt[1, max(kcld - 1, 0): kcld + 2].max()
        # free troposphere: everything at least 3 levels above cloud top
        interior = kt[1, : max(kcld - 3, 1)].max()
        assert near_top > 10.0 * max(interior, 1e-12), (near_top, interior)
        # and the dry-convective column's K peaks BELOW the cloud level
        k0 = np.asarray(res.k_t)[0]
        assert k0[kcld + 1:].max() > k0[: kcld - 2].max()

    def test_entrain_radiative_entrainment_only_cloudtopped(self):
        _, res, kcld = compute_entrain()
        w = np.asarray(res.wentr_rad)
        assert w[1] > 0.0
        assert w[0] == 0.0 and w[2] == 0.0

    def test_my25_neutral_log_layer_equilibrium(self):
        """Analytic anchors for the prognostic-TKE closure in a neutral
        constant-stress log layer, iterated to its fixed point:

        * surface BC is exactly 0.5*B1^(2/3)*u*^2 (TKE_SURF);
        * at neutral stratification (Gh = 0) the diffusivity ratio
          akm/akh must sit at the level-2 Prandtl number
          Sm/Sh = A1(1-3C1-6A1/B1) / (A2(1-6A1/B1)) = 0.788 (constants
          set my25_turb.F90:41-52) — a pure constants identity no
          K-profile scheme reproduces;
        * interior TKE stays O(surface value) in the surface layer and
          decreases with height (production/dissipation balance; the
          el0 length-scale blending legitimately lowers it below the
          pure-log-layer limit above kz ~ el0)."""
        from isca_tpu.physics.my25_turb import MY25Config, my25_turb, tke_surf

        _fixture_dir()
        cfg = MY25Config(akmin_land=0.0, akmin_sea=0.0)
        L, ncol = 20, 1
        z_half = jnp.linspace(2000.0, 0.0, L + 1)
        z_full = 0.5 * (z_half[:-1] + z_half[1:])
        ps = 1.0e5
        p_half = ps * jnp.exp(-z_half / 7500.0)
        p_full = ps * jnp.exp(-z_full / 7500.0)
        u_star_v = 0.3
        z0v = 0.1
        # log-layer wind profile: dU/dz = u*/(k z)
        u = (u_star_v / cfg.vonkarm) * jnp.log(z_full / z0v)
        theta = jnp.full((L,), 300.0)
        tile = lambda a, n=L: jnp.broadcast_to(a, (ncol, n))
        ph, pf = tile(p_half, L + 1), tile(p_full)
        th, uu = tile(theta), tile(u)
        zh, zf = tile(z_half, L + 1), tile(z_full)
        u_star = jnp.full((ncol,), u_star_v)
        z0 = jnp.full((ncol,), z0v)
        tke = tke_surf(cfg, jnp.zeros((ncol, L + 1)), u_star)
        step = lambda tk: my25_turb(cfg, 300.0, jnp.zeros((ncol,)), ph, pf,
                                    th, uu, jnp.zeros_like(uu), zh, zf, z0,
                                    tk, u_star=u_star)
        for _ in range(300):
            res = step(tke)
            tke = res.tke
        # converged to a fixed point
        delta = float(jnp.abs(step(tke).tke - tke).max())
        assert delta < 1e-2 * float(tke.max()), delta

        bcq_tke = float(tke[0, -1])
        # analytic surface BC: 0.5 * B1^(2/3) * u*^2 with B1 = 16
        assert abs(bcq_tke - 0.5 * 16.0 ** (2.0 / 3.0) * u_star_v**2) < 1e-10
        # neutral Prandtl number from the closure constants
        aa1, aa2, bb1, cc1 = 0.92, 0.74, 16.0, 0.08
        pr_neutral = (aa1 * (1 - 3 * cc1 - 6 * aa1 / bb1)
                      / (aa2 * (1 - 6 * aa1 / bb1)))     # = 0.7877
        ratio = (np.asarray(res.akm) / np.maximum(np.asarray(res.akh),
                                                  1e-30))[0, -6:]
        assert np.all(np.abs(ratio / pr_neutral - 1.0) < 0.2), (
            ratio, pr_neutral)
        # interior TKE: O(surface value) at the lowest interior level,
        # monotone decreasing with height through the BL
        tk = np.asarray(tke)[0]
        assert 0.3 * bcq_tke < tk[-2] < 1.2 * bcq_tke, (tk[-2], bcq_tke)
        assert np.all(np.diff(tk[-8:-1]) > 0), tk[-8:-1]

    def test_ras_heating_drying_consistency(self):
        from isca_tpu.constants import EARTH

        _, res, (t, q, pf, ph) = compute_ras()
        dp = np.asarray(ph[..., 1:] - ph[..., :-1])
        dq_int = np.sum(np.asarray(res.dt_q) * dp / EARTH.grav, axis=-1)
        dt_int = np.sum(np.asarray(res.dt_t) * dp / EARTH.grav
                        * EARTH.cp_air, axis=-1)
        rain = np.asarray(res.rain)
        assert np.all(rain > 0)
        # latent heating balances column drying: cp*dT = -Lv*dq (up to
        # the scheme's evaporation term, which only softens the equality)
        np.testing.assert_allclose(dt_int, -EARTH.hlv * dq_int, rtol=0.35)


def _update():
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    goldens = {name: fn() for name, fn in COMPUTE.items()}
    with open(GOLDEN_PATH, "w") as f:
        json.dump(goldens, f)
    print(f"wrote {GOLDEN_PATH}")


if __name__ == "__main__":
    if "--update" in sys.argv:
        _update()
    else:
        print(__doc__)
