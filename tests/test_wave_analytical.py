"""Analytical solutions vs known physics.

Mirrors math-wave in-crate tests + the tolerance anchors in BASELINE.md
(1D identities <= 1e-10; sphere regimes; 2D symmetry < 1e-6).
"""

import jax.numpy as jnp
import numpy as np

from mathaudio_tpu.wave.analytical import (
    plane_wave_1d,
    standing_wave_1d,
    damped_wave_1d,
    helmholtz_1d_mode,
    cylinder_scattering_2d,
    cylinder_scattering_cross_section_2d,
    plane_wave_2d,
    sphere_scattering_3d,
    sphere_rcs_3d,
    sphere_scattering_efficiency_3d,
    classify_regime,
    plane_wave_3d,
    point_source_3d,
    relative_l2_error,
)


class Test1D:
    def test_plane_wave(self):
        sol = plane_wave_1d(1.0, 0.0, 2 * np.pi, 100)
        assert abs(complex(sol.pressure[0]) - 1.0) < 1e-12
        x = np.asarray(sol.positions[:, 0])
        np.testing.assert_allclose(
            np.asarray(sol.pressure), np.exp(1j * x), rtol=0, atol=1e-12
        )
        # |p| = 1 everywhere
        np.testing.assert_allclose(np.asarray(sol.magnitude()), 1.0, atol=1e-12)

    def test_standing_wave_nodes(self):
        k = 2.0
        sol = standing_wave_1d(k, 0.0, np.pi, 201)
        x = np.asarray(sol.positions[:, 0])
        np.testing.assert_allclose(
            np.asarray(sol.pressure), 1j * np.sin(k * x), atol=1e-12
        )

    def test_damped_wave_decay(self):
        sol = damped_wave_1d(1.0, 0.1, 0.0, 10.0, 100)
        mags = np.asarray(sol.magnitude())
        ratio = mags[-1] / mags[0]
        assert abs(ratio - np.exp(-0.1 * 10.0)) < 1e-6

    def test_helmholtz_mode(self):
        k, L, n = 2.0, 1.0, 1
        sol = helmholtz_1d_mode(k, L, n, 50)
        x = np.asarray(sol.positions[:, 0])
        expected = np.sin(n * np.pi * x / L) / (k**2 - (n * np.pi / L) ** 2)
        np.testing.assert_allclose(np.asarray(sol.real()), expected, atol=1e-12)
        assert abs(float(sol.pressure[0].real)) < 1e-12  # BC
        assert abs(float(sol.pressure[-1].real)) < 1e-12


class Test2D:
    def test_cylinder_low_frequency_weak_scattering(self):
        sol = cylinder_scattering_2d(0.1, 1.0, 10, [2.0], [0.0, np.pi / 2, np.pi])
        mags = np.asarray(sol.magnitude())
        assert np.all(mags > 0.5) and np.all(mags < 2.0)

    def test_cylinder_symmetry(self):
        # |p(+theta)| == |p(-theta)| for plane wave along +x
        # (math-bem/tests/test_2d_cylinder.rs:172 tolerance 1e-6)
        thetas = np.linspace(0.1, np.pi - 0.1, 9)
        sol_p = cylinder_scattering_2d(2.0, 1.0, 30, [3.0], thetas)
        sol_m = cylinder_scattering_2d(2.0, 1.0, 30, [3.0], -thetas)
        np.testing.assert_allclose(
            np.asarray(sol_p.magnitude()), np.asarray(sol_m.magnitude()), atol=1e-10
        )

    def test_rigid_boundary_condition(self):
        # On the cylinder surface dp/dr = 0; check via finite differences.
        k, a = 1.5, 1.0
        eps = 1e-5
        t = np.array([0.7])
        p_hi = cylinder_scattering_2d(k, a, 40, [a + eps], t).pressure
        p_lo = cylinder_scattering_2d(k, a, 40, [a - eps], t).pressure
        dpdr = complex((p_hi[0] - p_lo[0]) / (2 * eps))
        assert abs(dpdr) < 1e-4

    def test_cross_section_positive(self):
        sigma = float(cylinder_scattering_cross_section_2d(1.0, 1.0, 30))
        assert sigma > 0

    def test_plane_wave_2d(self):
        sol = plane_wave_2d(1.0, np.pi / 4, [0.0, 1.0], [0.0, 1.0])
        pos = np.asarray(sol.positions)
        expected = np.exp(1j * (pos[:, 0] * np.cos(np.pi / 4) + pos[:, 1] * np.sin(np.pi / 4)))
        np.testing.assert_allclose(np.asarray(sol.pressure), expected, atol=1e-12)


class Test3D:
    def test_rigid_boundary_condition(self):
        # dp/dr = 0 on the sphere surface.
        k, a = 2.0, 1.0
        eps = 1e-5
        t = np.array([0.4, 1.2, 2.5])
        p_hi = sphere_scattering_3d(k, a, 40, [a + eps], t).pressure
        p_lo = sphere_scattering_3d(k, a, 40, [a - eps], t).pressure
        dpdr = np.asarray((p_hi - p_lo) / (2 * eps))
        assert np.all(np.abs(dpdr) < 1e-4)

    def test_rayleigh_regime_weak(self):
        sol = sphere_scattering_3d(0.1, 1.0, 10, [3.0], [0.0, np.pi / 2, np.pi])
        mags = np.asarray(sol.magnitude())
        np.testing.assert_allclose(mags, 1.0, atol=0.05)

    def test_geometric_limit_efficiency(self):
        # RCS/(pi a^2) -> 2 as ka -> inf; reference checks ka=20 with
        # num_terms = ka+20 (math-bem/tests/test_3d_sphere.rs:158-166,
        # tolerance +-0.3).
        q = float(sphere_scattering_efficiency_3d(20.0, 1.0, 40))
        assert abs(q - 2.0) < 0.3

    def test_rcs_rayleigh_scaling(self):
        # In Rayleigh regime RCS ~ k^4 a^6 -> ratio of RCS at 2k vs k = 16.
        r1 = float(sphere_rcs_3d(0.05, 1.0, 10))
        r2 = float(sphere_rcs_3d(0.10, 1.0, 10))
        assert abs(r2 / r1 - 16.0) < 1.0

    def test_regimes(self):
        assert "Rayleigh" in classify_regime(0.1)
        assert "Mie" in classify_regime(1.0)
        assert "Geometric" in classify_regime(10.0)

    def test_plane_wave_3d(self):
        pts = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        sol = plane_wave_3d(2.0, 0.0, 0.0, pts)  # along +z
        assert abs(complex(sol.pressure[0]) - 1.0) < 1e-12
        assert abs(complex(sol.pressure[1]) - np.exp(2.0j)) < 1e-12

    def test_point_source(self):
        pts = jnp.asarray([[1.0, 0.0, 0.0]])
        sol = point_source_3d(2.0, jnp.zeros(3), pts)
        expected = np.exp(2.0j) / (4 * np.pi)
        assert abs(complex(sol.pressure[0]) - expected) < 1e-12

    def test_error_metrics(self):
        sol_a = plane_wave_1d(1.0, 0.0, 1.0, 10)
        sol_b = plane_wave_1d(1.0, 0.0, 1.0, 10)
        assert float(sol_a.relative_l2_error(sol_b)) < 1e-14
        assert float(relative_l2_error(sol_a.pressure, sol_b.pressure)) < 1e-14
