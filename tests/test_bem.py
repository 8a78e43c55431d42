"""BEM validation vs analytical Mie series.

Mirrors math-bem/tests/test_bem_sphere_integration.rs (end-to-end
BemSolver vs sphere_scattering_3d, coarse-mesh rel error < 0.5),
test_3d_sphere.rs regimes, and mesh/assembly unit checks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mathaudio_tpu.bem import (
    BemProblem,
    BemSolver,
    BemSolverConfig,
    SolverMethod,
    PhysicsParams,
    icosphere,
    uv_sphere,
    cylinder_mesh,
    plane_wave,
    point_source,
)
from mathaudio_tpu.bem.assembly import single_layer_self_terms, _self_angular_rule
from mathaudio_tpu.wave.analytical import sphere_scattering_3d, from_spherical


class TestSurfaceMesh:
    def test_icosphere_area(self):
        m = icosphere(1.0, 2)
        assert m.num_elements == 320
        np.testing.assert_allclose(m.areas.sum(), 4 * np.pi, rtol=0.02)
        # normals point outward
        assert (np.einsum("nd,nd->n", m.centers, m.normals) > 0).all()

    def test_uv_sphere(self):
        m = uv_sphere(2.0, 8, 16)
        np.testing.assert_allclose(m.areas.sum(), 4 * np.pi * 4, rtol=0.05)

    def test_cylinder(self):
        m = cylinder_mesh(1.0, 2.0, 24, 8, closed=True)
        expected = 2 * np.pi * 1.0 * 2.0 + 2 * np.pi * 1.0**2
        np.testing.assert_allclose(m.areas.sum(), expected, rtol=0.03)

    def test_quad_points_weights_sum_to_area(self):
        m = icosphere(1.0, 1)
        qp, qw = m.quad_points(3)
        np.testing.assert_allclose(qw.sum(axis=1), m.areas, rtol=1e-12)

    def test_self_angular_rule_recovers_area(self):
        # integral of r dr dphi = sum_phi w R^2/2 = element area
        m = icosphere(1.0, 1)
        r, w = _self_angular_rule(m, n_ang=8)
        area = 0.5 * (w * r**2).sum(axis=1)
        np.testing.assert_allclose(area, m.areas, rtol=1e-4)

    def test_single_layer_self_laplace_limit(self):
        # k -> 0: S_ii -> (1/4pi) sum w R = known positive static integral
        m = icosphere(1.0, 1)
        s = np.asarray(single_layer_self_terms(m, 1e-9))
        r, w = _self_angular_rule(m, n_ang=8)
        static = (w * r).sum(axis=1) / (4 * np.pi)
        np.testing.assert_allclose(s.real, static, rtol=1e-6)
        assert np.all(np.abs(s.imag) < 1e-9)


def _surface_rel_error(ka, subdivisions, burton_miller, num_terms=30):
    prob = BemProblem.rigid_sphere(ka, subdivisions=subdivisions)
    cfg = BemSolverConfig(burton_miller=burton_miller)
    sol = BemSolver(cfg).solve(prob)
    # analytical total surface pressure at element centers
    c = prob.mesh.centers
    r = np.linalg.norm(c, axis=1)
    theta = np.arccos(np.clip(c[:, 2] / r, -1, 1))
    exact = sphere_scattering_3d(ka, 1.0, num_terms, [1.0], theta).pressure
    # oracle returns grid (1, T) ordered as theta list
    exact = np.asarray(exact)
    p = np.asarray(sol.surface_pressure)
    return np.linalg.norm(p - exact) / np.linalg.norm(exact), sol


class TestSphereScattering:
    def test_rayleigh_regime(self):
        err, _ = _surface_rel_error(0.5, 2, burton_miller=False)
        assert err < 0.1, err

    def test_mie_regime(self):
        err, _ = _surface_rel_error(2.0, 3, burton_miller=False)
        assert err < 0.1, err

    def test_burton_miller_matches_plain(self):
        err, _ = _surface_rel_error(1.0, 2, burton_miller=True)
        assert err < 0.1, err

    def test_burton_miller_handles_irregular_frequency(self):
        # ka = pi is the first interior Dirichlet eigenvalue -> plain CBIE
        # is singular there; Burton-Miller must stay accurate
        # (the reason tbem.rs implements the combination).
        err_bm, _ = _surface_rel_error(np.pi, 3, burton_miller=True)
        assert err_bm < 0.15, err_bm

    def test_field_evaluation_vs_mie(self):
        # end-to-end: exterior field at r = 2 vs analytical series
        # (test_bem_sphere_integration.rs:23-115, tolerance 0.5 coarse)
        ka = 1.0
        prob = BemProblem.rigid_sphere(ka, subdivisions=2)
        sol = BemSolver(BemSolverConfig(burton_miller=True)).solve(prob)
        thetas = np.linspace(0.0, np.pi, 7)
        pts = from_spherical(jnp.full(7, 2.0), jnp.asarray(thetas), jnp.zeros(7))
        p_bem = np.asarray(sol.evaluate_pressure(pts))
        exact = np.asarray(sphere_scattering_3d(ka, 1.0, 30, [2.0], thetas).pressure)
        rel = np.abs(p_bem - exact) / np.abs(exact)
        assert rel.max() < 0.1, rel

    def test_gmres_matches_lu(self):
        prob = BemProblem.rigid_sphere(1.0, subdivisions=2)
        sol_lu = BemSolver(BemSolverConfig(method=SolverMethod.LU)).solve(prob)
        sol_gm = BemSolver(
            BemSolverConfig(method=SolverMethod.GMRES, tolerance=1e-10)
        ).solve(prob)
        assert sol_gm.info["converged"]
        np.testing.assert_allclose(
            np.asarray(sol_gm.surface_pressure),
            np.asarray(sol_lu.surface_pressure),
            atol=1e-7,
        )

    def test_point_source_reciprocity_smoke(self):
        # point source excitation runs end to end and yields finite fields
        prob = BemProblem(
            mesh=icosphere(1.0, 2),
            physics=PhysicsParams.from_wave_number(1.0),
            incident=point_source((0.0, 0.0, 3.0)),
        )
        sol = BemSolver(BemSolverConfig(burton_miller=True)).solve(prob)
        p = sol.evaluate_pressure(jnp.asarray([[2.0, 0.0, 0.0]]))
        assert np.isfinite(np.asarray(p)).all()


class TestQuadElements:
    def test_cube_sphere_geometry(self):
        from mathaudio_tpu.bem.mesh import cube_sphere

        m = cube_sphere(1.0, 8)
        assert m.nodes_per_element == 4
        assert m.num_elements == 6 * 64
        np.testing.assert_allclose(m.areas.sum(), 4 * np.pi, rtol=0.02)
        qp, qw = m.quad_points()
        np.testing.assert_allclose(qw.sum(), m.areas.sum(), rtol=1e-6)
        assert (np.einsum("nd,nd->n", m.centers, m.normals) > 0).all()

    def test_quad_bem_vs_mie(self):
        from mathaudio_tpu.bem.mesh import cube_sphere

        ka = 1.0
        mesh = cube_sphere(1.0, 8)
        prob = BemProblem(
            mesh=mesh,
            physics=PhysicsParams.from_wave_number(ka),
            incident=plane_wave((0.0, 0.0, 1.0)),
        )
        sol = BemSolver(BemSolverConfig(burton_miller=False)).solve(prob)
        c = mesh.centers
        r = np.linalg.norm(c, axis=1)
        theta = np.arccos(np.clip(c[:, 2] / r, -1, 1))
        exact = np.asarray(sphere_scattering_3d(ka, 1.0, 30, [1.0], theta).pressure)
        p = np.asarray(sol.surface_pressure)
        rel = np.linalg.norm(p - exact) / np.linalg.norm(exact)
        assert rel < 0.1, rel


class TestFmmAssemblyDispatch:
    """BemSolverConfig.assembly = SLFMM/MLFMM routes to matrix-free FMM
    (bem_solver.rs assembly dispatch)."""

    def test_slfmm_and_mlfmm_match_dense(self):
        from mathaudio_tpu.bem.types import BemMethod

        ka = 2.0
        prob = BemProblem.rigid_sphere(ka, subdivisions=3)
        dense = BemSolver(BemSolverConfig(burton_miller=False)).solve(prob)
        for method in (BemMethod.SLFMM, BemMethod.MLFMM):
            cfg = BemSolverConfig(assembly=method, burton_miller=False,
                                  tolerance=1e-8, restart=60)
            sol = BemSolver(cfg).solve(prob)
            assert sol.info["converged"], sol.info
            assert sol.info["assembly"] == method.value
            rel = float(
                jnp.linalg.norm(sol.surface_pressure - dense.surface_pressure)
                / jnp.linalg.norm(dense.surface_pressure)
            )
            assert rel < 0.05, (method, rel)

    def test_fmm_burton_miller(self):
        from mathaudio_tpu.bem.types import BemMethod

        ka = 2.0
        prob = BemProblem.rigid_sphere(ka, subdivisions=3)
        dense = BemSolver(BemSolverConfig(burton_miller=True)).solve(prob)
        for method in (BemMethod.SLFMM, BemMethod.MLFMM):
            cfg = BemSolverConfig(assembly=method, burton_miller=True,
                                  tolerance=1e-8, restart=60)
            sol = BemSolver(cfg).solve(prob)
            assert sol.info["converged"] and sol.info["burton_miller"]
            rel = float(
                jnp.linalg.norm(sol.surface_pressure - dense.surface_pressure)
                / jnp.linalg.norm(dense.surface_pressure)
            )
            assert rel < 0.05, (method, rel)


class TestBatchedSweep:
    def test_sweep_matches_per_frequency_solver(self):
        """bem/sweep.py: a band of frequencies assembled+solved in one
        jit (audio_frequency_sweep.rs loop, batched) equals the
        per-frequency BemSolver exactly."""
        from mathaudio_tpu.bem import plane_wave
        from mathaudio_tpu.bem.mesh import icosphere
        from mathaudio_tpu.bem.sweep import bem_frequency_sweep
        from mathaudio_tpu.bem.types import PhysicsParams

        mesh = icosphere(1.0, 2)
        inc = plane_wave((0.0, 0.0, 1.0))
        ks = np.array([0.5, 1.0, 2.0])
        for bm in (False, True):
            p_sweep = np.asarray(
                bem_frequency_sweep(mesh, ks, inc, burton_miller=bm, beta_scale=1.0)
            )
            for i, k in enumerate(ks):
                prob = BemProblem(mesh, PhysicsParams.from_wave_number(k), inc)
                sol = BemSolver(
                    BemSolverConfig(burton_miller=bm, beta_scale=1.0)
                ).solve(prob)
                ref = np.asarray(sol.surface_pressure)
                rel = np.linalg.norm(p_sweep[i] - ref) / np.linalg.norm(ref)
                assert rel < 1e-12, (bm, k, rel)

    def test_sweep_gmres_solver_matches_lu(self):
        """sweep_apply(solver='gmres') — the bench path for N >= 1000,
        mirroring the reference's size-based solver table
        (qa_suite.rs:9-14) — matches the LU path to well inside its
        1e-5 residual tolerance, rigid and Burton-Miller."""
        import jax

        from mathaudio_tpu.bem import plane_wave
        from mathaudio_tpu.bem.mesh import icosphere
        from mathaudio_tpu.bem.sweep import sweep_apply, sweep_statics

        mesh = icosphere(1.0, 2)
        inc = plane_wave((0.0, 0.0, 1.0))
        s = sweep_statics(mesh)
        ks = jnp.linspace(0.5, 3.0, 4)
        cdt = jnp.result_type(1j * ks)
        for bm in (False, True):
            betas = (2j / (ks + 1.0)).astype(cdt) if bm else jnp.zeros_like(ks).astype(cdt)
            if bm:
                rhs = jax.vmap(
                    lambda k, b: inc.pressure(s.centers, k)
                    - b * inc.normal_derivative(s.centers, s.normals, k)
                )(ks, betas)
            else:
                rhs = jax.vmap(lambda k: inc.pressure(s.centers, k))(ks)
            p_lu = sweep_apply(s, ks, betas, rhs, burton_miller=bm)
            p_gm = sweep_apply(s, ks, betas, rhs, burton_miller=bm, solver="gmres")
            rel = float(
                jnp.max(jnp.linalg.norm(p_gm - p_lu, axis=1) / jnp.linalg.norm(p_lu, axis=1))
            )
            assert rel < 1e-4, (bm, rel)


class TestAccuracyParity:
    """Parity with test_accuracy_parity.rs: forward/backscatter ratio,
    pressure phase, and mesh convergence against the Mie series."""

    @pytest.fixture(scope="class")
    def solution(self):
        prob = BemProblem.rigid_sphere(1.0, subdivisions=3)
        return prob, BemSolver(BemSolverConfig(burton_miller=True)).solve(prob)

    def test_forward_backscatter_ratio(self, solution):
        from mathaudio_tpu.wave.analytical import sphere_scattering_3d

        prob, sol = solution
        r_eval = 3.0
        pts = jnp.asarray([[0.0, 0.0, r_eval], [0.0, 0.0, -r_eval]])
        p = np.abs(np.asarray(sol.evaluate_pressure(pts)))
        ana_f = np.abs(np.asarray(sphere_scattering_3d(1.0, 1.0, 40, [r_eval], [0.0]).pressure))[0]
        ana_b = np.abs(np.asarray(sphere_scattering_3d(1.0, 1.0, 40, [r_eval], [np.pi]).pressure))[0]
        # each direction within 5% and the ratio within 5% (rs asserts 15%)
        assert abs(p[0] - ana_f) / ana_f < 0.05, (p[0], ana_f)
        assert abs(p[1] - ana_b) / ana_b < 0.05, (p[1], ana_b)
        assert abs(p[0] / p[1] - ana_f / ana_b) / (ana_f / ana_b) < 0.05

    def test_pressure_phase(self, solution):
        from mathaudio_tpu.wave.analytical import sphere_scattering_3d

        prob, sol = solution
        r_eval = 2.0
        thetas = np.pi * np.arange(9) / 8.0
        pts = jnp.asarray(
            np.stack([r_eval * np.sin(thetas), np.zeros(9), r_eval * np.cos(thetas)], 1)
        )
        p = np.asarray(sol.evaluate_pressure(pts))
        ana = np.asarray(sphere_scattering_3d(1.0, 1.0, 40, [r_eval], thetas).pressure)
        dphi = np.angle(p * np.conj(ana))  # phase difference per point
        assert np.abs(dphi).max() < 0.1, dphi  # < ~6 degrees everywhere

    def test_mesh_convergence(self):
        """Surface error decreases monotonically with refinement
        (test_accuracy_parity.rs test_mesh_convergence)."""
        from mathaudio_tpu.wave.analytical import sphere_scattering_3d

        errs = []
        for sub in (1, 2, 3):
            prob = BemProblem.rigid_sphere(1.0, subdivisions=sub)
            sol = BemSolver(BemSolverConfig(burton_miller=True)).solve(prob)
            c = prob.mesh.centers
            th = np.arccos(np.clip(c[:, 2] / np.linalg.norm(c, axis=1), -1, 1))
            exact = np.asarray(sphere_scattering_3d(1.0, 1.0, 30, [1.0], th).pressure)
            p = np.asarray(sol.surface_pressure)
            errs.append(np.linalg.norm(p - exact) / np.linalg.norm(exact))
        assert errs[0] > errs[1] > errs[2], errs
        assert errs[2] < 0.02, errs


class TestIncidentFieldGradients:
    """Analytic normal derivatives vs central finite differences
    (incident.rs:93,177 pressure/dp_dn consistency)."""

    @pytest.mark.parametrize("make", ["plane", "point"])
    def test_normal_derivative_matches_fd(self, make):
        from mathaudio_tpu.bem import plane_wave, point_source

        inc = plane_wave((0.3, -0.5, 0.81)) if make == "plane" else point_source((0.1, 2.5, -0.3))
        k = 1.7
        rng = np.random.default_rng(5)
        pts = jnp.asarray(rng.standard_normal((16, 3)))
        nrm = rng.standard_normal((16, 3))
        nrm = jnp.asarray(nrm / np.linalg.norm(nrm, axis=1, keepdims=True))
        h = 1e-5
        fd = (inc.pressure(pts + h * nrm, k) - inc.pressure(pts - h * nrm, k)) / (2 * h)
        ana = inc.normal_derivative(pts, nrm, k)
        np.testing.assert_allclose(np.asarray(ana), np.asarray(fd), rtol=1e-6, atol=1e-8)


class TestEvalPointGenerators:
    """pressure.rs:320-420 eval-point generators."""

    def test_sphere_eval_points(self):
        from mathaudio_tpu.bem import generate_sphere_eval_points

        pts = generate_sphere_eval_points(2.5, 6, 8)
        assert pts.shape == (48, 3)
        np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 2.5, rtol=1e-12)
        # cell-centered polar grid avoids the poles
        assert np.abs(pts[:, 2]).max() < 2.5

    def test_line_eval_points(self):
        from mathaudio_tpu.bem import generate_line_eval_points

        pts = generate_line_eval_points([0, 0, 0], [1, 2, 3], 5)
        assert pts.shape == (5, 3)
        np.testing.assert_allclose(pts[0], [0, 0, 0], atol=0)
        np.testing.assert_allclose(pts[-1], [1, 2, 3], atol=0)
        np.testing.assert_allclose(pts[2], [0.5, 1.0, 1.5], atol=1e-14)

    def test_plane_eval_points(self):
        from mathaudio_tpu.bem import generate_plane_eval_points

        center = np.array([1.0, -2.0, 0.5])
        normal = np.array([0.0, 0.0, 1.0])
        pts = generate_plane_eval_points(center, normal, 2.0, 7)
        assert pts.shape == (49, 3)
        # all points in the plane through center with that normal
        np.testing.assert_allclose((pts - center) @ normal, 0.0, atol=1e-12)
        # spans +-extent
        d = np.linalg.norm(pts - center, axis=1)
        np.testing.assert_allclose(d.max(), 2.0 * np.sqrt(2.0), rtol=1e-12)
        assert d.min() < 1e-12  # center point included (odd n)

    def test_plane_points_near_parallel_normal(self):
        from mathaudio_tpu.bem import generate_plane_eval_points

        pts = generate_plane_eval_points([0, 0, 0], [1.0, 0.0, 0.0], 1.0, 3)
        np.testing.assert_allclose(pts[:, 0], 0.0, atol=1e-12)


class TestErrorMetrics:
    """testing/mod.rs ErrorMetrics::compute edge cases."""

    def test_perfect_match(self):
        from mathaudio_tpu.bem.testing import ErrorMetrics

        a = np.array([1 + 1j, 2.0, -3.0])
        m = ErrorMetrics.compute(a, a)
        assert m.l2_error == 0.0 and m.l2_relative == 0.0 and m.linf_error == 0.0

    def test_nonzero(self):
        from mathaudio_tpu.bem.testing import ErrorMetrics

        m = ErrorMetrics.compute(np.array([1.0, 0.0]), np.array([0.0, 0.0]))
        assert m.l2_error == 1.0
        assert m.l2_relative == 1.0  # zero-norm reference falls back to absolute
        assert m.linf_error == 1.0


class TestOctreeEdgeCases:
    """octree.rs test_octree_empty / test_octree_single_point."""

    def test_empty(self):
        from mathaudio_tpu.bem.octree import Octree

        t = Octree.build(np.empty((0, 3)))
        assert len(t.leaves) == 1 and len(t.leaves[0].indices) == 0

    def test_single_point(self):
        from mathaudio_tpu.bem.octree import Octree

        t = Octree.build(np.array([[1.0, 2.0, 3.0]]), max_per_leaf=4)
        assert len(t.leaves) == 1
        near, far = t.interaction_lists(2.0)
        assert near.shape == (1, 2) and far.shape == (0, 2)
