"""Mellor-Yamada 2.5 turbulence closure tests.

Reference behavior: src/atmos_param/my25_turb/my25_turb.F90.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from isca_tpu.physics.my25_turb import MY25Config, _thomas, my25_turb, tke_surf


def make_bl(L=20, ncol=3, shear=5.0e-3, stable=False):
    """Boundary-layer columns, level-last top-down."""
    ps = 1.0e5
    z_half = jnp.linspace(5000.0, 0.0, L + 1)
    z_full = 0.5 * (z_half[:-1] + z_half[1:])
    p_half = ps * jnp.exp(-z_half / 7500.0)
    p_full = ps * jnp.exp(-z_full / 7500.0)
    theta0 = 295.0
    if stable:
        theta = theta0 + 0.01 * z_full          # strongly stable
    else:
        theta = theta0 + 0.0 * z_full           # neutral
    u = shear * (z_full - z_full[-1])
    tile = lambda a, n=L: jnp.broadcast_to(a, (ncol, n))
    return (tile(p_half, L + 1), tile(p_full), tile(theta), tile(u),
            jnp.zeros((ncol, L)), tile(z_half, L + 1), tile(z_full))


class TestThomas:
    def test_matches_dense_solve(self):
        rng = np.random.default_rng(0)
        n = 12
        c = rng.uniform(-0.3, -0.1, (4, n))
        a = rng.uniform(-0.3, -0.1, (4, n))
        b = 1.0 - a - c
        d = rng.normal(size=(4, n))
        x = np.asarray(_thomas(jnp.asarray(c), jnp.asarray(b),
                               jnp.asarray(a), jnp.asarray(d)))
        for i in range(4):
            M = np.zeros((n, n))
            for k in range(n):
                M[k, k] = b[i, k]
                if k > 0:
                    M[k, k - 1] = c[i, k]
                if k < n - 1:
                    M[k, k + 1] = a[i, k]
            expect = np.linalg.solve(M, d[i])
            np.testing.assert_allclose(x[i], expect, rtol=1e-10)


class TestMY25:
    def run(self, iters=25, stable=False, ustar=0.5, shear=5.0e-3):
        """Land columns: the akmin_land floor seeds shear production, the
        fastest spin-up path (over ocean akmin_sea=0 and a cold-started TKE
        field grows only by slow surface diffusion — reference behavior)."""
        cfg = MY25Config()
        ph, pf, theta, u, v, zh, zf = make_bl(stable=stable, shear=shear)
        ncol, L = u.shape
        fracland = jnp.ones((ncol,))
        z0 = jnp.full((ncol,), 0.05)
        tke = jnp.zeros((ncol, L + 1))
        res = my25_turb(cfg, 600.0, fracland, ph, pf, theta, u, v, zh, zf,
                        z0, tke, u_star=jnp.full((ncol,), ustar), iters=iters)
        return cfg, res

    def test_surface_tke_bc(self):
        cfg = MY25Config()
        tke = tke_surf(cfg, jnp.zeros((2, 11)), jnp.full((2,), 0.4))
        bcq = 0.5 * 16.0 ** (2.0 / 3.0)
        np.testing.assert_allclose(np.asarray(tke[..., -1]), bcq * 0.16,
                                   rtol=1e-6)

    def test_neutral_shear_generates_turbulence(self):
        cfg, res = self.run(stable=False)
        tke = np.asarray(res.tke)
        # TKE grows upward from the surface into the shear layer
        assert tke[0, -1] > 0.5          # surface BC
        assert tke[0, -3] > 1e-3         # interior spin-up
        akm = np.asarray(res.akm)
        assert akm.max() > 1.0           # O(1-100 m2/s) eddy viscosity
        assert np.all(akm >= 0.0) and np.all(akm <= cfg.akmax)
        assert np.all(np.isfinite(tke))

    def test_stable_stratification_suppresses_mixing(self):
        _, neutral = self.run(stable=False)
        _, stable = self.run(stable=True)
        assert (np.asarray(stable.tke)[:, 1:-1].sum()
                < 0.5 * np.asarray(neutral.tke)[:, 1:-1].sum())

    def test_tke_bounds_respected(self):
        cfg, res = self.run(ustar=3.0, shear=3.0e-2)   # violent forcing
        tke = np.asarray(res.tke)
        assert np.all(tke <= cfg.tkemax + 1e-9)
        assert np.all(tke >= cfg.tkemin - 1e-12)

    def test_akmin_floor_near_surface(self):
        cfg = MY25Config(akmin_land=5.0)
        ph, pf, theta, u, v, zh, zf = make_bl(stable=True, shear=0.0)
        ncol, L = u.shape
        res = my25_turb(cfg, 600.0, jnp.ones((ncol,)), ph, pf, theta, u, v,
                        zh, zf, jnp.full((ncol,), 0.05),
                        jnp.zeros((ncol, L + 1)),
                        u_star=jnp.full((ncol,), 0.01), iters=3)
        # lowest nk_lim interior half levels floored at akmin over land
        assert np.all(np.asarray(res.akm)[:, -cfg.nk_lim:] >= 5.0 - 1e-9)

    def test_moist_model_with_my25(self):
        import dataclasses as dc

        from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel

        cfg = GreyMoistConfig()
        cfg = dc.replace(
            cfg,
            core=dc.replace(cfg.core, resolution="T21", num_levels=12),
            physics=dc.replace(cfg.physics, bl_scheme="mellor_yamada"),
        )
        model = GreyMoistModel(cfg)
        state = model.initial_state()
        state = model.run(state, 8, first=True)
        tg = np.asarray(state.dyn.tg.curr)
        assert np.all(np.isfinite(tg)) and 150 < tg.mean() < 330
        assert np.all(np.isfinite(np.asarray(state.tke)))
        assert float(np.asarray(state.tke).max()) > 0.0
