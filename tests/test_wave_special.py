"""Special functions vs scipy (machine-precision cross-validation).

Mirrors the unit-test layer of math-wave/src/special/*.rs, with scipy as
the trusted oracle for the oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special as sps

from mathaudio_tpu.wave.special import (
    bessel_jn_all,
    bessel_jn_yn_all,
    hankel1_all,
    spherical_jn_all,
    spherical_yn_all,
    spherical_bessel_derivative,
    legendre_all,
    legendre_derivative_all,
    associated_legendre_all,
    greens_function_3d,
    greens_function_2d,
    all_kernels_3d,
    greens_function_normal_derivative_3d,
    greens_function_adjoint_derivative_3d,
    greens_function_hypersingular_3d,
    laplace_greens_function_3d,
)

XS = np.array([0.05, 0.3, 1.0, 2.5, 5.0, 10.0, 25.0, 60.0, 95.0])


class TestCylindricalBessel:
    def test_jn_vs_scipy(self):
        nmax = 30
        j = np.asarray(bessel_jn_all(nmax, jnp.asarray(XS)))
        for n in range(nmax + 1):
            ref = sps.jv(n, XS)
            np.testing.assert_allclose(j[n], ref, rtol=1e-11, atol=1e-13)

    def test_yn_vs_scipy(self):
        nmax = 20
        _, y = bessel_jn_yn_all(nmax, jnp.asarray(XS))
        y = np.asarray(y)
        for n in range(nmax + 1):
            ref = sps.yv(n, XS)
            np.testing.assert_allclose(y[n], ref, rtol=1e-9, atol=1e-11)

    def test_hankel(self):
        h = np.asarray(hankel1_all(5, jnp.asarray(XS)))
        for n in range(6):
            ref = sps.hankel1(n, XS)
            np.testing.assert_allclose(h[n], ref, rtol=1e-9, atol=1e-11)

    def test_small_x_no_overflow(self):
        x = jnp.asarray([1e-6, 1e-3])
        j = np.asarray(bessel_jn_all(40, x))
        assert np.all(np.isfinite(j))
        np.testing.assert_allclose(j[0], sps.jv(0, np.asarray(x)), rtol=1e-12)

    def test_x_zero(self):
        j = np.asarray(bessel_jn_all(3, jnp.asarray(0.0)))
        np.testing.assert_allclose(j, [1.0, 0.0, 0.0, 0.0], atol=1e-300)


class TestSphericalBessel:
    def test_jn_vs_scipy(self):
        nmax = 25
        j = np.asarray(spherical_jn_all(nmax, jnp.asarray(XS)))
        for n in range(nmax + 1):
            ref = sps.spherical_jn(n, XS)
            np.testing.assert_allclose(j[n], ref, rtol=1e-11, atol=1e-14)

    def test_jn_at_bessel_zero(self):
        # j_0(pi) = 0: normalization must survive zeros of j_0.
        x = jnp.asarray([np.pi, 2 * np.pi, 4.493409457909064])  # last: zero of j_1
        j = np.asarray(spherical_jn_all(10, x))
        for n in range(11):
            ref = sps.spherical_jn(n, np.asarray(x))
            np.testing.assert_allclose(j[n], ref, rtol=1e-10, atol=1e-13)

    def test_yn_vs_scipy(self):
        nmax = 15
        y = np.asarray(spherical_yn_all(nmax, jnp.asarray(XS)))
        for n in range(nmax + 1):
            ref = sps.spherical_yn(n, XS)
            np.testing.assert_allclose(y[n], ref, rtol=1e-10, atol=1e-12)

    def test_derivatives(self):
        nmax = 8
        x = jnp.asarray(XS)
        j = spherical_jn_all(nmax + 1, x)
        dj = np.asarray(spherical_bessel_derivative(j, x))
        for n in range(nmax + 1):
            ref = sps.spherical_jn(n, XS, derivative=True)
            np.testing.assert_allclose(dj[n], ref, rtol=1e-9, atol=1e-12)

    def test_j0_closed_form(self):
        x = jnp.asarray([0.5, 1.0, 3.0])
        j = np.asarray(spherical_jn_all(0, x))[0]
        np.testing.assert_allclose(j, np.sin(np.asarray(x)) / np.asarray(x), rtol=1e-13)


class TestLegendre:
    def test_pn_vs_scipy(self):
        x = np.linspace(-1, 1, 41)
        p = np.asarray(legendre_all(12, jnp.asarray(x)))
        for n in range(13):
            ref = np.polynomial.legendre.legval(x, np.eye(13)[n])
            np.testing.assert_allclose(p[n], ref, rtol=1e-12, atol=1e-13)

    def test_derivative(self):
        x = np.linspace(-0.95, 0.95, 21)
        d = np.asarray(legendre_derivative_all(6, jnp.asarray(x)))
        eps = 1e-6
        p_hi = np.asarray(legendre_all(6, jnp.asarray(x + eps)))
        p_lo = np.asarray(legendre_all(6, jnp.asarray(x - eps)))
        fd = (p_hi - p_lo) / (2 * eps)
        np.testing.assert_allclose(d, fd, rtol=1e-6, atol=1e-6)

    def test_derivative_endpoints(self):
        d = np.asarray(legendre_derivative_all(4, jnp.asarray([1.0, -1.0])))
        # P_n'(1) = n(n+1)/2
        np.testing.assert_allclose(d[:, 0], [0, 1, 3, 6, 10], atol=1e-12)

    def test_associated_vs_scipy(self):
        x = np.linspace(-0.9, 0.9, 11)
        for m in [0, 1, 2, 3]:
            p = np.asarray(associated_legendre_all(6, m, jnp.asarray(x)))
            for n in range(m, 7):
                ref = np.array([sps.lpmv(m, n, xi) for xi in x])
                np.testing.assert_allclose(p[n], ref, rtol=1e-10, atol=1e-12)


class TestHelmholtzKernels:
    def test_g3d_magnitude(self):
        # |G| = 1/(4 pi r) for any k (helmholtz.rs doctest)
        g = complex(greens_function_3d(1.0, 2.0))
        assert abs(abs(g) - 1.0 / (4.0 * np.pi)) < 1e-12

    def test_g2d_vs_scipy(self):
        r = np.array([0.3, 1.0, 2.0])
        k = 2.0
        g = np.asarray(greens_function_2d(jnp.asarray(r), k))
        ref = 0.25j * sps.hankel1(0, k * r)
        np.testing.assert_allclose(g, ref, rtol=1e-9)

    def test_kernels_consistent_with_fd(self):
        # dG/dn_y via finite differences of G along n_y.
        k = 1.7
        src = jnp.asarray([0.1, 0.2, 0.3])
        fld = jnp.asarray([1.0, -0.5, 0.8])
        ny = np.array([1.0, 2.0, -1.0])
        ny = ny / np.linalg.norm(ny)
        eps = 1e-6

        def g_at(f):
            r = float(jnp.linalg.norm(f - src))
            return complex(greens_function_3d(r, k))

        fd = (g_at(fld + eps * ny) - g_at(fld - eps * ny)) / (2 * eps)
        val = complex(greens_function_normal_derivative_3d(src, fld, jnp.asarray(ny), k))
        assert abs(val - fd) < 1e-6 * max(1.0, abs(fd))

    def test_adjoint_sign(self):
        k = 1.3
        src = jnp.asarray([0.0, 0.0, 0.0])
        fld = jnp.asarray([1.0, 1.0, 0.5])
        n = jnp.asarray([0.0, 0.0, 1.0])
        # moving the source along n changes G opposite to moving the field
        eps = 1e-6

        def g(s, f):
            return complex(greens_function_3d(float(jnp.linalg.norm(f - s)), k))

        fd = (g(src + eps * n, fld) - g(src - eps * n, fld)) / (2 * eps)
        val = complex(greens_function_adjoint_derivative_3d(src, fld, n, k))
        assert abs(val - fd) < 1e-6 * max(1.0, abs(fd))

    def test_hypersingular_fd(self):
        k = 0.9
        src = jnp.asarray([0.0, 0.1, -0.2])
        fld = jnp.asarray([0.8, -0.3, 0.7])
        nx = np.array([0.0, 1.0, 0.0])
        ny = np.array([1.0, 0.0, 1.0]) / np.sqrt(2.0)
        eps = 1e-5

        def dg_dny(s):
            return complex(
                greens_function_normal_derivative_3d(jnp.asarray(s), fld, jnp.asarray(ny), k)
            )

        fd = (dg_dny(np.asarray(src) + eps * nx) - dg_dny(np.asarray(src) - eps * nx)) / (
            2 * eps
        )
        val = complex(
            greens_function_hypersingular_3d(src, fld, jnp.asarray(nx), jnp.asarray(ny), k)
        )
        # Parity quirk: the reference kernel (helmholtz.rs:176) flips the
        # sign of the (r.n_x)(r.n_y) term relative to the true mixed
        # derivative n_x.grad_x(n_y.grad_y G) — an inherited NumCalc
        # convention. Here n_x.n_y = 0, so the whole value is term1 and
        # the reference kernel equals MINUS the nested FD.
        assert abs(val + fd) < 1e-4 * max(1.0, abs(fd))

    def test_all_kernels_match_individual(self):
        k = 2.2
        src = jnp.asarray([0.0, 0.0, 0.0])
        fld = jnp.asarray([0.5, 0.5, 0.5])
        nx = jnp.asarray([1.0, 0.0, 0.0])
        ny = jnp.asarray([0.0, 0.0, 1.0])
        g, dgy, dgx, d2g = all_kernels_3d(src, fld, nx, ny, k)
        r = float(jnp.linalg.norm(fld - src))
        assert abs(complex(g) - complex(greens_function_3d(r, k))) < 1e-14
        assert (
            abs(complex(dgy) - complex(greens_function_normal_derivative_3d(src, fld, ny, k)))
            < 1e-14
        )
        assert (
            abs(complex(dgx) - complex(greens_function_adjoint_derivative_3d(src, fld, nx, k)))
            < 1e-14
        )
        assert (
            abs(
                complex(d2g)
                - complex(greens_function_hypersingular_3d(src, fld, nx, ny, k))
            )
            < 1e-14
        )

    def test_laplace_limit(self):
        r = 0.7
        g0 = float(laplace_greens_function_3d(r))
        gk = complex(greens_function_3d(r, 1e-8))
        assert abs(g0 - gk.real) < 1e-10


class TestWronskian:
    def test_spherical_bessel_wronskian(self):
        """j_n(x) y_n'(x) - j_n'(x) y_n(x) = 1/x^2 — an identity
        independent of the recurrence direction, so it catches both
        up-recurrence overflow and Miller-normalization bugs."""
        from mathaudio_tpu.wave.special import (
            spherical_bessel_derivative,
            spherical_jn_all,
            spherical_yn_all,
        )

        x = jnp.asarray(np.linspace(0.3, 40.0, 60))
        nmax = 15
        j = spherical_jn_all(nmax, x)
        y = spherical_yn_all(nmax, x)
        jp = spherical_bessel_derivative(j, x)
        yp = spherical_bessel_derivative(y, x)
        for n in (0, 1, 3, 8, 15):
            w = j[n] * yp[n] - jp[n] * y[n]
            np.testing.assert_allclose(np.asarray(w), 1.0 / np.asarray(x) ** 2,
                                       rtol=1e-8, err_msg=f"n={n}")


class TestLegendreIdentities:
    """legendre.rs tests not covered above: endpoint values and
    orthogonality."""

    def test_endpoints(self):
        """P_n(1) = 1, P_n(-1) = (-1)^n."""
        from mathaudio_tpu.wave.special.legendre import legendre_all

        p1 = np.asarray(legendre_all(8, jnp.asarray(1.0)))
        pm1 = np.asarray(legendre_all(8, jnp.asarray(-1.0)))
        np.testing.assert_allclose(p1, 1.0, atol=1e-12)
        np.testing.assert_allclose(pm1, [(-1.0) ** n for n in range(9)], atol=1e-12)

    def test_orthogonality(self):
        """int_-1^1 P_m P_n dx = 2/(2n+1) delta_mn (Gauss-Legendre
        quadrature is exact for the products)."""
        from mathaudio_tpu.wave.special.legendre import legendre_all

        x, w = np.polynomial.legendre.leggauss(16)
        p = np.asarray(legendre_all(6, jnp.asarray(x)))  # (7, 16)
        gram = (p * w) @ p.T
        expect = np.diag([2.0 / (2 * n + 1) for n in range(7)])
        np.testing.assert_allclose(gram, expect, atol=1e-12)


class TestHankelAsymptotics:
    def test_hankel_large_argument(self):
        """h_n(x) ~ (-i)^{n+1} e^{ix}/x for x >> n (spherical.rs
        test_hankel_asymptotic)."""
        from mathaudio_tpu.wave.special.spherical import spherical_hankel1_all

        x = 100.0  # inside the max_arg=120 overflow guard
        h = np.asarray(spherical_hankel1_all(4, jnp.asarray(x)))
        for n in range(5):
            expect = (-1j) ** (n + 1) * np.exp(1j * x) / x
            # leading correction is n(n+1)/(2x)
            tol = 1e-4 + n * (n + 1) / (2 * x) * 1.1
            assert abs(h[n] - expect) / abs(expect) < tol, n


class TestNormalDerivativeGeometry:
    """helmholtz.rs test_normal_derivative_radial/_tangential."""

    def test_radial_normal_maximal(self):
        from mathaudio_tpu.wave.special.helmholtz import (
            greens_function_normal_derivative_3d,
        )

        src = jnp.asarray([0.0, 0.0, 0.0])
        fld = jnp.asarray([2.0, 0.0, 0.0])
        k = 1.3
        radial = complex(
            greens_function_normal_derivative_3d(src, fld, jnp.asarray([1.0, 0.0, 0.0]), k)
        )
        tangential = complex(
            greens_function_normal_derivative_3d(src, fld, jnp.asarray([0.0, 1.0, 0.0]), k)
        )
        assert abs(tangential) < 1e-14  # dG/dn = 0 for n perp r
        # radial derivative matches d/dr[e^{ikr}/(4 pi r)]
        r = 2.0
        g = np.exp(1j * k * r) / (4 * np.pi * r)
        expect = (1j * k - 1.0 / r) * g
        assert abs(radial - expect) < 1e-12
