"""Unit tests for the spherical transform core (SURVEY.md stage 1).

The reference has no transform unit tests (its mpp_chksum debug blocks imply the
checks); these enforce: Gauss quadrature exactness, Legendre orthonormality,
grid<->spectral round trips, analytic harmonics, operator identities, and
wind <-> (vor, div) consistency.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from isca_tpu.spectral import (
    make_transforms,
    grid_to_spec,
    spec_to_grid,
    triangular_truncate,
    laplacian,
    inverse_laplacian,
    uv_grid_from_vor_div,
    vor_div_from_uv_grid,
    horizontal_advection,
    area_weighted_mean,
)
from isca_tpu.spectral.gauss import gauss_legendre, legendre_table

T42 = make_transforms("T21", dtype=jnp.float64)  # small + fast; T21 64x32


def random_spec(T, key=0, nlev=None):
    """Random triangularly-truncated spectral field with real zonal-mean modes."""
    rng = np.random.default_rng(key)
    shape = (T.num_fourier + 1, T.num_spherical + 1)
    if nlev:
        shape = (nlev,) + shape
    s = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    s[..., 0, :] = s[..., 0, :].real  # m=0 coefficients of a real field are real
    return triangular_truncate(T, jnp.asarray(s))


class TestGauss:
    def test_weights_sum_to_two(self):
        _, w = gauss_legendre(64)
        assert abs(w.sum() - 2.0) < 1e-14

    def test_quadrature_exact_for_polynomials(self):
        # Gauss-Legendre with n nodes integrates degree 2n-1 exactly.
        x, w = gauss_legendre(8)
        for k in range(0, 15):
            exact = 2.0 / (k + 1) if k % 2 == 0 else 0.0
            assert abs(np.sum(w * x**k) - exact) < 1e-13, k

    def test_legendre_low_order_analytic(self):
        mu = np.array([-0.7, 0.0, 0.3, 0.9])
        P = legendre_table(mu, 2, 3)
        c = np.sqrt(1 - mu**2)
        np.testing.assert_allclose(P[:, 0, 0], 1.0)
        np.testing.assert_allclose(P[:, 0, 1], np.sqrt(3.0) * mu, rtol=1e-14)
        np.testing.assert_allclose(P[:, 0, 2], np.sqrt(5.0) * 0.5 * (3 * mu**2 - 1), rtol=1e-13, atol=1e-15)
        np.testing.assert_allclose(P[:, 1, 1], np.sqrt(3.0 / 2.0) * c, rtol=1e-14)
        np.testing.assert_allclose(P[:, 1, 2], np.sqrt(15.0 / 2.0) * mu * c, rtol=1e-13)
        # n < m entries are structurally zero
        assert np.all(P[:, 2, :2] == 0)

    def test_orthonormality(self):
        T = T42
        P = np.asarray(T.P)
        w = np.asarray(T.wts)
        for m in (0, 1, 5, 13):
            G = 0.5 * np.einsum("jn,jk,j->nk", P[:, m], P[:, m], w)
            n0 = m
            nmax = T.num_spherical
            eye = np.eye(nmax + 1 - n0)
            np.testing.assert_allclose(G[n0:, n0:], eye, atol=1e-12)


class TestRoundTrip:
    def test_spec_grid_spec(self):
        s = random_spec(T42)
        s2 = grid_to_spec(T42, spec_to_grid(T42, s))
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s), atol=1e-12)

    def test_grid_spec_grid_bandlimited(self):
        g = spec_to_grid(T42, random_spec(T42, key=3))  # band-limited by construction
        g2 = spec_to_grid(T42, grid_to_spec(T42, g))
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g), atol=1e-12)

    def test_multilevel_batch(self):
        s = random_spec(T42, key=5, nlev=4)
        s2 = grid_to_spec(T42, spec_to_grid(T42, s))
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s), atol=1e-12)

    def test_global_mean_is_00_coefficient(self):
        s = random_spec(T42, key=7)
        g = spec_to_grid(T42, s)
        mean = area_weighted_mean(T42, g)
        assert abs(float(mean) - float(s[0, 0].real)) < 1e-12


class TestAnalytic:
    def test_single_harmonic_analysis(self):
        # f = Re[ Pbar_3^2(mu) e^{2 i lambda} ] should produce exactly s[2,3] = 1.
        T = T42
        s = jnp.zeros(T.spec_shape, dtype=jnp.complex128).at[2, 3].set(1.0)
        g = spec_to_grid(T, s)
        s2 = grid_to_spec(T, g)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s), atol=1e-13)

    def test_laplacian_eigenfunction(self):
        T = T42
        s = jnp.zeros(T.spec_shape, dtype=jnp.complex128).at[4, 9].set(1.0 + 0.5j)
        lap = laplacian(T, s)
        expected = -9 * 10 / T.radius**2
        assert abs(complex(lap[4, 9]) - expected * complex(s[4, 9])) < 1e-20

    def test_inverse_laplacian(self):
        T = T42
        s = random_spec(T, key=11)
        s = s.at[0, 0].set(0.0)
        np.testing.assert_allclose(
            np.asarray(laplacian(T, inverse_laplacian(T, s))), np.asarray(s), atol=1e-12
        )


class TestWinds:
    def test_vordiv_uv_round_trip(self):
        T = T42
        vor = random_spec(T, key=21)
        div = random_spec(T, key=22)
        # remove the (0,0) modes (no wind contribution; not recoverable)
        vor = vor.at[0, 0].set(0.0)
        div = div.at[0, 0].set(0.0)
        u, v = uv_grid_from_vor_div(T, vor, div)
        vor2, div2 = vor_div_from_uv_grid(T, u, v)
        np.testing.assert_allclose(np.asarray(vor2), np.asarray(vor), atol=1e-11)
        np.testing.assert_allclose(np.asarray(div2), np.asarray(div), atol=1e-11)

    def test_solid_body_rotation(self):
        # u = U0 cos(lat), v = 0  =>  vor = (2 U0 / a) sin(lat), div = 0.
        T = T42
        U0 = 30.0
        u = jnp.broadcast_to(U0 * T.coslat[:, None], T.grid_shape)
        v = jnp.zeros(T.grid_shape)
        vor, div = vor_div_from_uv_grid(T, u, v)
        vor_g = spec_to_grid(T, vor)
        expected = 2.0 * U0 / T.radius * T.sinlat[:, None]
        np.testing.assert_allclose(np.asarray(vor_g), np.asarray(jnp.broadcast_to(expected, T.grid_shape)), atol=1e-12)
        np.testing.assert_allclose(np.asarray(spec_to_grid(T, div)), 0.0, atol=1e-12)

    def test_advection_by_solid_body(self):
        # Advection of f = Re[Pbar_5^3 e^{3 i lambda}] by u = W a cos(lat):
        # -u/(a cos) df/dlambda = -W * Re[3 i f_c] .
        T = T42
        W = 1e-5
        f = jnp.zeros(T.spec_shape, dtype=jnp.complex128).at[3, 5].set(1.0 - 0.7j)
        u = jnp.broadcast_to(W * T.radius * T.coslat[:, None], T.grid_shape)
        v = jnp.zeros(T.grid_shape)
        adv = horizontal_advection(T, f, u, v)
        expected = spec_to_grid(T, -W * 3j * f)
        np.testing.assert_allclose(np.asarray(adv), np.asarray(expected), atol=1e-12)

    def test_meridional_advection_of_zonal_field(self):
        # f depends only on latitude: f = Pbar_2^0; advect by v = const*cos(lat)?
        # Use v = V0 (not divergence-free but advection formula is pointwise).
        T = T42
        f = jnp.zeros(T.spec_shape, dtype=jnp.complex128).at[0, 2].set(1.0)
        V0 = 2.0
        u = jnp.zeros(T.grid_shape)
        v = jnp.full(T.grid_shape, V0)
        adv = horizontal_advection(T, f, u, v)
        # d/dlat Pbar_2^0 = sqrt(5)*3*mu*cos(lat)  (Pbar_2^0 = sqrt(5)(3mu^2-1)/2)
        mu = T.sinlat[:, None]
        expected = -V0 / T.radius * np.sqrt(5.0) * 3.0 * mu * T.coslat[:, None]
        np.testing.assert_allclose(
            np.asarray(adv), np.asarray(jnp.broadcast_to(expected, T.grid_shape)), atol=1e-12
        )


class TestF32:
    def test_round_trip_f32(self):
        T = make_transforms("T21", dtype=jnp.float32)
        s = jnp.asarray(random_spec(T42, key=31), dtype=jnp.complex64)
        s = triangular_truncate(T, s)
        s2 = grid_to_spec(T, spec_to_grid(T, s))
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s), atol=2e-5)


class TestTruncationShapes:
    """Rhomboidal truncation + fourier_inc sector models.

    Reference semantics: spectral storage is an (m, l) parallelogram with total
    wavenumber n = m*fourier_inc + l (spherical.F90:179-186); rhomboidal keeps
    l = 0..T for every m (rhomboidal_truncation, spherical.F90:603-644);
    triangular masks n > T regardless of fourier_inc (spherical.F90:184).
    """

    def test_rhomboidal_shape_and_mask(self):
        T = make_transforms(10, nlon=64, nlat=32, dtype=jnp.float64,
                            truncation_shape="rhomboidal")
        assert T.num_fourier == 10
        assert T.num_spherical == 21  # m_max + T + 1
        tri = np.asarray(T.triangle)
        m = np.arange(11)[:, None]
        n = np.arange(22)[None, :]
        np.testing.assert_array_equal(tri, ((n >= m) & (n - m <= 10)).astype(float))

    def test_rhomboidal_round_trip(self):
        T = make_transforms(10, nlon=96, nlat=48, dtype=jnp.float64,
                            truncation_shape="rhomboidal")
        s = random_spec(T, key=7)
        s2 = grid_to_spec(T, spec_to_grid(T, s))
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s), atol=1e-12)

    def test_rhomboidal_uv_vordiv_round_trip(self):
        T = make_transforms(10, nlon=96, nlat=48, dtype=jnp.float64,
                            truncation_shape="rhomboidal")
        vor = random_spec(T, key=1)
        div = random_spec(T, key=2)
        # remove the global-mean (n=0) mode, which carries no wind
        vor = vor.at[0, 0].set(0.0)
        div = div.at[0, 0].set(0.0)
        u, v = uv_grid_from_vor_div(T, vor, div)
        vor2, div2 = vor_div_from_uv_grid(T, u, v)
        np.testing.assert_allclose(np.asarray(vor2), np.asarray(vor), atol=1e-10)
        np.testing.assert_allclose(np.asarray(div2), np.asarray(div), atol=1e-10)

    def test_fourier_inc_retained_modes(self):
        T = make_transforms(21, nlon=64, nlat=32, dtype=jnp.float64, fourier_inc=3)
        # zonal wavenumbers are multiples of 3, still bounded by n <= 21
        np.testing.assert_array_equal(np.asarray(T.mvec), 3.0 * np.arange(8))
        assert T.num_spherical == 22
        tri = np.asarray(T.triangle)
        assert tri[7, 21] == 1.0 and tri[7, 22] == 0.0  # m=21 retains only n=21

    def test_fourier_inc_round_trip(self):
        T = make_transforms(21, nlon=64, nlat=32, dtype=jnp.float64, fourier_inc=3)
        s = random_spec(T, key=5)
        s2 = grid_to_spec(T, spec_to_grid(T, s))
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s), atol=1e-12)

    def test_fourier_inc_ddx(self):
        # d/dlambda of e^{i 3 lambda} harmonic must multiply by i*3 (the
        # physical zonal wavenumber, m_index=1 * fourier_inc=3).
        from isca_tpu.spectral.transforms import ddx_spec
        T = make_transforms(21, nlon=64, nlat=32, dtype=jnp.float64, fourier_inc=3)
        s = jnp.zeros(T.spec_shape, dtype=jnp.complex128).at[1, 4].set(1.0 + 0.5j)
        np.testing.assert_allclose(np.asarray(ddx_spec(T, s)),
                                   np.asarray(3j * s), atol=1e-14)


class TestBatchedOperatorSeams:
    """The dycore batches transforms via the operator halves
    (uv_coeffs_from_vor_div, vor_div_from_analysis, transforms.py): each must
    agree exactly with the corresponding whole-op it was split from."""

    def test_uv_coeffs_match_uv_grid(self):
        from isca_tpu.spectral.transforms import (
            spec_to_grid, uv_coeffs_from_vor_div, uv_grid_from_vor_div)
        T = make_transforms("T21", dtype=jnp.float64)
        vor = random_spec(T, key=11, nlev=3)
        div = random_spec(T, key=12, nlev=3)
        u0, v0 = uv_grid_from_vor_div(T, vor, div)
        U, V = uv_coeffs_from_vor_div(T, vor, div)
        batch = spec_to_grid(T, jnp.concatenate([U, V], axis=0))
        coslat = T.coslat[:, None]
        np.testing.assert_array_equal(np.asarray(batch[:3] / coslat),
                                      np.asarray(u0))
        np.testing.assert_array_equal(np.asarray(batch[3:] / coslat),
                                      np.asarray(v0))

    def test_vor_div_from_analysis_matches_whole_op(self):
        from isca_tpu.spectral.transforms import (
            grid_to_spec, vor_div_from_analysis, vor_div_from_uv_grid)
        T = make_transforms("T21", dtype=jnp.float64)
        u = spec_to_grid(T, random_spec(T, key=13, nlev=2))
        v = spec_to_grid(T, random_spec(T, key=14, nlev=2))
        vor0, div0 = vor_div_from_uv_grid(T, u, v)
        coslat = T.coslat[:, None]
        AB = grid_to_spec(T, jnp.concatenate([u / coslat, v / coslat], axis=0),
                          truncate=False)
        vor1, div1 = vor_div_from_analysis(T, AB[:2], AB[2:])
        np.testing.assert_array_equal(np.asarray(vor1), np.asarray(vor0))
        np.testing.assert_array_equal(np.asarray(div1), np.asarray(div0))
