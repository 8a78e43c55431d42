"""SLFMM validation (math-bem/tests/test_fmm_validation.rs): FMM matvec
vs dense TBEM matvec (reference tolerance rel < 0.5; we target ~1e-2),
octree sanity, end-to-end GMRES solve vs the Mie oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mathaudio_tpu.bem import icosphere
from mathaudio_tpu.bem.assembly import assemble_collocation_matrix
from mathaudio_tpu.bem.fmm import build_slfmm_system, unit_sphere_quadrature
from mathaudio_tpu.bem.octree import Octree


class TestOctree:
    def test_build_partitions(self):
        pts = np.random.default_rng(0).random((500, 3))
        tree = Octree.build(pts, max_per_leaf=32)
        all_idx = np.concatenate([lf.indices for lf in tree.leaves])
        assert sorted(all_idx.tolist()) == list(range(500))
        assert all(len(lf.indices) <= 32 for lf in tree.leaves)

    def test_levels(self):
        pts = np.random.default_rng(1).random((300, 3))
        tree = Octree.build(pts, max_per_leaf=16)
        lv = tree.levels()
        assert len(lv) >= 2
        assert lv[0][0].is_leaf is False or len(lv) == 1

    def test_interaction_lists(self):
        pts = np.random.default_rng(2).random((400, 3))
        tree = Octree.build(pts, max_per_leaf=32)
        near, far = tree.interaction_lists(2.0)
        c = len(tree.leaves)
        assert len(near) + len(far) == c * c
        # diagonal pairs are always near
        assert all((a == b) <= 1 for a, b in near)


class TestSphereQuadrature:
    def test_integrates_constants_and_harmonics(self):
        dirs, w = unit_sphere_quadrature(6)
        np.testing.assert_allclose(w.sum(), 4 * np.pi, rtol=1e-12)
        # int s_z^2 = 4 pi / 3
        np.testing.assert_allclose((w * dirs[:, 2] ** 2).sum(), 4 * np.pi / 3, rtol=1e-12)
        # odd harmonics vanish
        np.testing.assert_allclose((w * dirs[:, 0]).sum(), 0.0, atol=1e-12)


class TestSlfmm:
    @pytest.mark.parametrize("ka", [1.0, 2.0])
    def test_matvec_vs_dense(self, ka):
        mesh = icosphere(1.0, 3)  # 1280 elements
        k = ka
        op = build_slfmm_system(mesh, k, max_per_leaf=64, separation_ratio=2.0)
        a_dense = assemble_collocation_matrix(mesh, k)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal(mesh.num_elements)
                        + 1j * rng.standard_normal(mesh.num_elements))
        y_fmm = np.asarray(op.matvec(x))
        y_dense = np.asarray(a_dense @ x)
        rel = np.linalg.norm(y_fmm - y_dense) / np.linalg.norm(y_dense)
        # reference accepts < 0.5 (test_fmm_validation.rs:142); with the
        # exact static row-sum diagonal the build matches dense to ~1e-6
        assert rel < 1e-4, rel

    def test_solve_vs_mie(self):
        from mathaudio_tpu.solvers import KrylovConfig, gmres
        from mathaudio_tpu.bem import plane_wave
        from mathaudio_tpu.wave.analytical import sphere_scattering_3d

        ka = 1.0
        mesh = icosphere(1.0, 3)
        op = build_slfmm_system(mesh, ka, max_per_leaf=64, separation_ratio=2.0)
        inc = plane_wave((0.0, 0.0, 1.0))
        rhs = inc.pressure(jnp.asarray(mesh.centers), ka)
        sol = gmres(op.matvec, rhs, config=KrylovConfig(tolerance=1e-8, restart=60,
                                                        max_iterations=600))
        assert bool(sol.converged)
        c = mesh.centers
        theta = np.arccos(np.clip(c[:, 2] / np.linalg.norm(c, axis=1), -1, 1))
        exact = np.asarray(sphere_scattering_3d(ka, 1.0, 30, [1.0], theta).pressure)
        p = np.asarray(sol.x)
        rel = np.linalg.norm(p - exact) / np.linalg.norm(exact)
        assert rel < 0.1, rel


class TestMlfmm:
    def test_matvec_vs_dense(self):
        from mathaudio_tpu.bem.fmm import build_mlfmm_system, estimate_num_levels

        mesh = icosphere(1.0, 3)
        k = 2.0
        op = build_mlfmm_system(mesh, k, max_per_leaf=16, separation_ratio=2.0)
        a_dense = assemble_collocation_matrix(mesh, k)
        rng = np.random.default_rng(5)
        x = jnp.asarray(
            rng.standard_normal(mesh.num_elements)
            + 1j * rng.standard_normal(mesh.num_elements)
        )
        y_fmm = np.asarray(op.matvec(x))
        y_dense = np.asarray(a_dense @ x)
        rel = np.linalg.norm(y_fmm - y_dense) / np.linalg.norm(y_dense)
        assert rel < 0.05, rel
        assert estimate_num_levels(20000) >= 3


class TestRoomFmm:
    def test_interior_matvec_vs_dense(self):
        from mathaudio_tpu.bem.fmm import build_room_fmm_system
        from mathaudio_tpu.bem.room_acoustics import _room_matrix
        from mathaudio_tpu.bem.assembly import _self_angular_rule
        from mathaudio_tpu.xtypes import default_float

        mesh = icosphere(1.0, 3)
        k, beta = 2.0, 0.1
        op = build_room_fmm_system(mesh, k, admittance=beta, max_per_leaf=64)
        qp, qw = mesh.quad_points(3)
        sr, sw = _self_angular_rule(mesh)
        dt = default_float()
        a_dense = _room_matrix(
            jnp.asarray(mesh.centers, dt), jnp.asarray(mesh.normals, dt),
            jnp.asarray(qp, dt), jnp.asarray(qw, dt),
            jnp.asarray(sr, dt), jnp.asarray(sw, dt), k,
            jnp.broadcast_to(jnp.asarray(beta, dt), (mesh.num_elements,)),
        )
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal(mesh.num_elements)
                        + 1j * rng.standard_normal(mesh.num_elements))
        y_fmm = np.asarray(op.matvec(x))
        y_dense = np.asarray(a_dense @ x)
        rel = np.linalg.norm(y_fmm - y_dense) / np.linalg.norm(y_dense)
        assert rel < 0.05, rel


class TestMlfmmTree:
    """True hierarchical MLFMM: M2M/L2L passes (mlfmm.rs:483)."""

    def test_sphere_interp_exact_on_band(self):
        from mathaudio_tpu.bem.fmm import (
            _sph_harm_matrix,
            sphere_interp_matrix,
            unit_sphere_quadrature,
        )

        df, wf = unit_sphere_quadrature(6)
        dt, wt = unit_sphere_quadrature(10)
        for a, wa, b in [(df, wf, dt), (dt, wt, df)]:
            u = sphere_interp_matrix(a, wa, b, 6)
            ya = _sph_harm_matrix(a, 6)
            yb = _sph_harm_matrix(b, 6)
            assert np.abs(u @ ya - yb).max() < 1e-12

    def test_matvec_vs_dense_three_levels(self):
        from mathaudio_tpu.bem.fmm import build_mlfmm_tree_system

        mesh = icosphere(1.0, 3)
        k = 2.0
        op = build_mlfmm_tree_system(mesh, k, max_per_leaf=4, separation_ratio=1.5)
        assert len(op.data.levels) >= 3  # genuine M2M/L2L chain
        assert all(int(lv.trans_op.shape[0]) > 0 for lv in op.data.levels)
        a_dense = assemble_collocation_matrix(mesh, k)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(1280) + 1j * rng.standard_normal(1280))
        y = np.asarray(op.matvec(x))
        yd = np.asarray(a_dense @ x)
        rel = np.linalg.norm(y - yd) / np.linalg.norm(yd)
        assert rel < 0.05, rel

    def test_low_frequency_demotes_gracefully(self):
        """At small k the diagonal form is unstable for deep boxes; the
        stability cap must route those pairs to exact near blocks and
        keep the matvec accurate."""
        from mathaudio_tpu.bem.fmm import build_mlfmm_tree_system

        mesh = icosphere(1.0, 2)  # 320 elements
        k = 0.5
        op = build_mlfmm_tree_system(mesh, k, max_per_leaf=4, separation_ratio=2.0)
        a_dense = assemble_collocation_matrix(mesh, k)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal(320) + 1j * rng.standard_normal(320))
        rel = float(
            jnp.linalg.norm(op.matvec(x) - a_dense @ x) / jnp.linalg.norm(a_dense @ x)
        )
        assert rel < 0.05, rel

    def test_solve_vs_dense_solution(self):
        from mathaudio_tpu.bem.fmm import build_mlfmm_tree_system
        from mathaudio_tpu.bem import plane_wave
        from mathaudio_tpu.solvers import KrylovConfig, gmres

        ka = 2.0
        mesh = icosphere(1.0, 3)
        op = build_mlfmm_tree_system(mesh, ka, max_per_leaf=4, separation_ratio=1.5)
        rhs = plane_wave((0.0, 0.0, 1.0)).pressure(jnp.asarray(mesh.centers), ka)
        sol = gmres(
            op.matvec, rhs,
            config=KrylovConfig(tolerance=1e-8, restart=60, max_iterations=600),
        )
        assert bool(sol.converged)
        a = np.asarray(assemble_collocation_matrix(mesh, ka))
        xd = np.linalg.solve(a, np.asarray(rhs))
        rel = np.linalg.norm(np.asarray(sol.x) - xd) / np.linalg.norm(xd)
        assert rel < 0.05, rel


class TestFmmPostprocess:
    def test_field_eval_fmm_matches_dense(self):
        """evaluate_field_fmm (pressure.rs field sweep, FMM-accelerated)
        agrees with the dense Kirchhoff-Helmholtz evaluation, including
        the low-frequency demotion path."""
        from mathaudio_tpu.bem import BemProblem, BemSolver, BemSolverConfig
        from mathaudio_tpu.bem.postprocess import evaluate_field, evaluate_field_fmm

        ka = 2.0
        prob = BemProblem.rigid_sphere(ka, subdivisions=3)
        sol = BemSolver(BemSolverConfig(burton_miller=True)).solve(prob)
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((400, 3))
        pts = pts / np.linalg.norm(pts, axis=1, keepdims=True)
        pts = pts * rng.uniform(2.0, 6.0, (400, 1))
        for k in (ka, 0.3):  # 0.3 exercises the stability demotion
            dense = evaluate_field(prob.mesh, sol.surface_pressure, pts, k, prob.incident)
            fmm = evaluate_field_fmm(prob.mesh, sol.surface_pressure, pts, k, prob.incident)
            rel = float(
                jnp.linalg.norm(fmm.p_scat - dense.p_scat) / jnp.linalg.norm(dense.p_scat)
            )
            assert rel < 1e-4, (k, rel)
        # and through the BemSolution front door
        pf = sol.evaluate_pressure_field(pts[:50], method="fmm")
        pd = sol.evaluate_pressure_field(pts[:50])
        np.testing.assert_allclose(
            np.asarray(pf.p_total), np.asarray(pd.p_total), rtol=1e-4, atol=1e-8
        )

    def test_field_eval_fmm_single_layer_radiating(self):
        """Radiating (mixed-BC) solution: evaluate_field_fmm with q_surf
        carries the -G q single-layer term through the clustered far
        field and exact near pairs — matches the dense evaluation and
        the pulsating-sphere analytic field (pressure.rs field sweep for
        dp/dn != 0 surfaces)."""
        from mathaudio_tpu.bem import BemProblem, BemSolver, BemSolverConfig
        from mathaudio_tpu.bem.postprocess import evaluate_field, evaluate_field_fmm
        from mathaudio_tpu.wave.analytical.solutions_3d import pulsating_sphere_3d

        ka = 2.0
        prob = BemProblem.radiating_sphere(ka, subdivisions=3)
        sol = BemSolver(BemSolverConfig(burton_miller=True)).solve(prob)
        assert sol.surface_q is not None
        rng = np.random.default_rng(1)
        pts = rng.standard_normal((300, 3))
        pts = pts / np.linalg.norm(pts, axis=1, keepdims=True)
        pts = pts * rng.uniform(2.0, 6.0, (300, 1))
        dense = evaluate_field(
            prob.mesh, sol.surface_pressure, pts, ka, None, q_surf=sol.surface_q
        )
        fmm = evaluate_field_fmm(
            prob.mesh, sol.surface_pressure, pts, ka, None, q_surf=sol.surface_q
        )
        rel = float(
            jnp.linalg.norm(fmm.p_scat - dense.p_scat) / jnp.linalg.norm(dense.p_scat)
        )
        assert rel < 1e-4, rel
        exact = np.asarray(pulsating_sphere_3d(ka, 1.0, pts).pressure)
        rel_exact = np.abs(np.asarray(fmm.p_total) - exact).max() / np.abs(exact).max()
        assert rel_exact < 0.05, rel_exact
        # front door no longer rejects mixed-BC solutions for method='fmm'
        pf = sol.evaluate_pressure_field(pts[:40], method="fmm")
        pd = sol.evaluate_pressure_field(pts[:40])
        np.testing.assert_allclose(
            np.asarray(pf.p_total), np.asarray(pd.p_total), rtol=1e-4, atol=1e-8
        )


class TestNearIlu:
    def test_near_ilu_beats_jacobi_on_room(self):
        """Near-field ILU(0) preconditioner (solver.rs:975
        solve_bem_fmm_gmres_ilu): on a room mesh (flat parallel walls =
        strong near coupling) it clearly beats diagonal preconditioning;
        solutions agree."""
        from mathaudio_tpu.common import RectangularRoom
        from mathaudio_tpu.bem.fmm import (
            build_room_fmm_system,
            near_field_csr,
            near_ilu_preconditioner,
        )
        from mathaudio_tpu.solvers import KrylovConfig, gmres

        mesh = RectangularRoom(4.0, 5.0, 2.7).generate_mesh(3).to_surface_mesh()
        n = mesh.num_elements
        k = 2 * np.pi * 150.0 / 343.0
        op = build_room_fmm_system(mesh, k, admittance=0.1, max_per_leaf=48)
        rng = np.random.default_rng(0)
        rhs = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))
        cfg = KrylovConfig(max_iterations=900, tolerance=1e-9, restart=60)
        inv_diag = 1.0 / op.data.diag_add
        sol_j = gmres(op.matvec, rhs, config=cfg,
                      preconditioner=lambda r: inv_diag * r)
        sol_i = gmres(op.matvec, rhs, config=cfg,
                      preconditioner=near_ilu_preconditioner(op))
        assert bool(sol_i.converged) and bool(sol_j.converged)
        rel = float(jnp.linalg.norm(sol_i.x - sol_j.x) / jnp.linalg.norm(sol_j.x))
        assert rel < 1e-6, rel
        assert int(sol_i.iterations) < int(sol_j.iterations), (
            int(sol_i.iterations), int(sol_j.iterations))

        csr = near_field_csr(op.data)
        assert csr.shape == (n, n) and csr.nnz > n

    def test_hierarchical_block_preconditioner(self):
        """Cluster block-diagonal preconditioner (solver.rs:1046
        solve_bem_fmm_gmres_hierarchical): batched-LU self blocks; beats
        Jacobi on the room mesh, O(N) setup."""
        from mathaudio_tpu.common import RectangularRoom
        from mathaudio_tpu.bem.fmm import (
            ClusterBlockPreconditioner,
            build_room_fmm_system,
        )
        from mathaudio_tpu.solvers import KrylovConfig, gmres

        mesh = RectangularRoom(4.0, 5.0, 2.7).generate_mesh(3).to_surface_mesh()
        n = mesh.num_elements
        k = 2 * np.pi * 150.0 / 343.0
        op = build_room_fmm_system(mesh, k, admittance=0.1, max_per_leaf=48)
        rng = np.random.default_rng(0)
        rhs = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))
        cfg = KrylovConfig(max_iterations=900, tolerance=1e-9, restart=60)
        inv_diag = 1.0 / op.data.diag_add
        sol_j = gmres(op.matvec, rhs, config=cfg,
                      preconditioner=lambda r: inv_diag * r)
        sol_h = gmres(op.matvec, rhs, config=cfg,
                      preconditioner=ClusterBlockPreconditioner.from_operator(op))
        assert bool(sol_h.converged)
        rel = float(jnp.linalg.norm(sol_h.x - sol_j.x) / jnp.linalg.norm(sol_j.x))
        assert rel < 1e-6, rel
        assert int(sol_h.iterations) < int(sol_j.iterations)


class TestOctreeInteractionLists:
    def test_near_far_partition_symmetric(self):
        """near/far must partition all same-level pairs and be symmetric
        (octree.rs:327 compute_interaction_lists)."""
        rng = np.random.default_rng(11)
        pts = rng.standard_normal((400, 3))
        tree = Octree.build(pts, max_per_leaf=32)
        near, far = tree.interaction_lists(2.0)
        near_set = {(a, b) for a, b in near}
        far_set = {(a, b) for a, b in far}
        assert not near_set & far_set
        # symmetry
        assert all((b, a) in near_set for a, b in near_set)
        assert all((b, a) in far_set for a, b in far_set)
        # every node id appearing anywhere is classified against
        # every partner exactly once (no pair in both lists, checked
        # above) and self-pairs are near-listed
        ids = {a for a, _ in near_set | far_set} | {b for _, b in near_set | far_set}
        assert all((i, i) in near_set for i in ids if (i, i) in near_set | far_set)


class TestPreconditionerDispatch:
    """near-field preconditioners must accept every FMM operator type and
    survive pytree flatten/unflatten (regression: tree_flatten referenced
    removed fields; MlfmmTreeData was dispatched to a missing .leaf)."""

    @pytest.mark.parametrize("build_name", ["slfmm", "mlfmm_tree"])
    def test_build_and_roundtrip(self, build_name):
        from mathaudio_tpu.bem.fmm import (
            ClusterBlockPreconditioner,
            build_mlfmm_tree_system,
            build_slfmm_system,
            near_ilu_preconditioner,
        )

        mesh = icosphere(1.0, 2)
        build = {"slfmm": build_slfmm_system, "mlfmm_tree": build_mlfmm_tree_system}[build_name]
        op = build(mesh, 1.0)
        near_ilu_preconditioner(op)  # must not raise
        pre = ClusterBlockPreconditioner.from_operator(op)
        leaves, treedef = jax.tree_util.tree_flatten(pre)
        pre2 = jax.tree_util.tree_unflatten(treedef, leaves)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(mesh.num_elements) + 0j)
        np.testing.assert_allclose(np.asarray(pre.matvec(x)), np.asarray(pre2.matvec(x)))


class TestTranslationKernels:
    """Direct oracle checks of the padded/bucketed fused translation
    kernels (fmm._translation_padded): the padded lanes (kd=1, order=-1)
    and the bucketed Legendre order must never leak into real rows."""

    @staticmethod
    def _oracle(k, d_vecs, dirs, lmax, orders):
        from scipy.special import spherical_jn, spherical_yn

        d_len = np.linalg.norm(d_vecs, axis=1)
        d_hat = d_vecs / d_len[:, None]
        cos_g = np.clip(d_hat @ dirs.T, -1.0, 1.0)
        out = np.zeros(cos_g.shape, complex)
        for p in range(len(d_vecs)):
            for l in range(int(orders[p]) + 1):
                h = spherical_jn(l, k * d_len[p]) + 1j * spherical_yn(l, k * d_len[p])
                pl = np.polynomial.legendre.legval(
                    cos_g[p], np.eye(lmax + 1)[l]
                )
                out[p] += (2 * l + 1) * (1j**l) * h * pl
        return out

    @pytest.mark.parametrize("p,order", [(1, 4), (3, 8), (5, 12)])
    def test_translation_operator_vs_oracle(self, p, order):
        from mathaudio_tpu.bem.fmm import translation_operator

        rng = np.random.default_rng(p)
        d_vecs = rng.standard_normal((p, 3)) * 3.0 + 4.0
        dirs, _ = unit_sphere_quadrature(3)
        k = 1.7
        got = translation_operator(k, d_vecs, dirs, order)
        want = self._oracle(k, d_vecs, dirs, order, np.full(p, order))
        np.testing.assert_allclose(got, want, rtol=5e-7, atol=1e-9)

    def test_pairwise_orders_mask_high_l(self):
        """Per-pair truncation: each row must match the oracle truncated
        at its own order, including a row at order 0 and one at lmax."""
        from mathaudio_tpu.bem.fmm import translation_operator_pairwise

        rng = np.random.default_rng(7)
        p, lmax = 4, 10
        d_vecs = rng.standard_normal((p, 3)) * 2.0 + 5.0
        dirs, _ = unit_sphere_quadrature(3)
        orders = np.array([0, 3, lmax, 6], np.int32)
        k = 2.3
        got = translation_operator_pairwise(k, d_vecs, dirs, lmax, orders)
        want = self._oracle(k, d_vecs, dirs, lmax, orders)
        np.testing.assert_allclose(got, want, rtol=5e-7, atol=1e-9)

    def test_bucketing_is_invisible(self):
        """Results must be identical whether P lands on a bucket boundary
        or just past it (padded lanes discarded exactly)."""
        from mathaudio_tpu.bem.fmm import translation_operator

        rng = np.random.default_rng(3)
        dirs, _ = unit_sphere_quadrature(4)
        k = 1.1
        d65 = rng.standard_normal((65, 3)) + 4.0
        full = translation_operator(k, d65, dirs, 6)
        head = translation_operator(k, d65[:64], dirs, 6)
        np.testing.assert_allclose(full[:64], head, rtol=1e-12, atol=0)


class TestRoomFmmOnRoomMesh:
    def test_room_mesh_matvec_vs_dense(self):
        """Regression: on an actual room mesh (into-the-fluid normals,
        flat walls) the FMM diagonal must carry the same static
        solid-angle row-sum correction as the dense path — the naive
        +1/2 jump term is wrong by exactly 1 there and produced O(1)
        matvec error (fixed via _static_dlp_row_sums)."""
        from mathaudio_tpu.common import RectangularRoom
        from mathaudio_tpu.bem.fmm import build_room_fmm_system
        from mathaudio_tpu.bem.room_acoustics import _room_matrix
        from mathaudio_tpu.bem.assembly import _self_angular_rule
        from mathaudio_tpu.xtypes import default_float

        mesh = RectangularRoom(3.0, 4.0, 2.5).generate_mesh(2).to_surface_mesh()
        k, beta = 1.76, 0.1
        dt = default_float()
        qp, qw = mesh.quad_points(3)
        sr, sw = _self_angular_rule(mesh)
        a = _room_matrix(
            jnp.asarray(mesh.centers, dt), jnp.asarray(mesh.normals, dt),
            jnp.asarray(qp, dt), jnp.asarray(qw, dt),
            jnp.asarray(sr, dt), jnp.asarray(sw, dt), k,
            jnp.broadcast_to(jnp.asarray(beta, dt), (mesh.num_elements,)),
        )
        op = build_room_fmm_system(mesh, k, admittance=beta, max_per_leaf=48)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal(mesh.num_elements)
                        + 1j * rng.standard_normal(mesh.num_elements))
        rel = float(jnp.linalg.norm(op.matvec(x) - a @ x) / jnp.linalg.norm(a @ x))
        assert rel < 1e-4, rel


class TestSelForm:
    def test_sel_form_matches_scatter_and_gather(self):
        """sel_form (per-level 0/1 selection-matrix reductions — the chip
        lowering of the tree translations, round 4) reproduces both the
        scatter and gather_form matvecs up to sum reassociation."""
        from mathaudio_tpu.bem.fmm import (
            build_mlfmm_tree_system,
            gather_form,
            sel_form,
        )
        from mathaudio_tpu.bem.mesh import icosphere

        surf = icosphere(1.0, 3)
        op = build_mlfmm_tree_system(surf, 4.0)
        ops = sel_form(op)
        opg = gather_form(op)
        # sel matrices exist on levels that have pairs
        assert any(lv.sel is not None for lv in ops.data.levels)
        rng = np.random.default_rng(3)
        x = jnp.asarray(
            rng.standard_normal(op.n) + 1j * rng.standard_normal(op.n)
        )
        y0 = op.matvec(x)
        rel_s = float(jnp.linalg.norm(ops.matvec(x) - y0) / jnp.linalg.norm(y0))
        rel_g = float(jnp.linalg.norm(opg.matvec(x) - y0) / jnp.linalg.norm(y0))
        assert rel_s < 1e-10, rel_s
        assert rel_g < 1e-10, rel_g

    def test_sel_form_passthrough_for_slfmm(self):
        from mathaudio_tpu.bem.fmm import build_slfmm_system, sel_form
        from mathaudio_tpu.bem.mesh import icosphere

        surf = icosphere(1.0, 2)
        op = build_slfmm_system(surf, 2.0)
        ops = sel_form(op)  # falls back to gather_form
        rng = np.random.default_rng(4)
        x = jnp.asarray(
            rng.standard_normal(op.n) + 1j * rng.standard_normal(op.n)
        )
        y0 = op.matvec(x)
        rel = float(jnp.linalg.norm(ops.matvec(x) - y0) / jnp.linalg.norm(y0))
        assert rel < 1e-10, rel


class TestTreeBurtonMiller:
    """Burton-Miller through the hierarchical MLFMM tree (VERDICT r4 #2).

    The reference's MLFMM is CBIE-only (mlfmm.rs:3); here the BM row
    factor applies at leaf disaggregation, covering every level's
    translations, so the N>20000 production tier is resonance-safe too.
    Chip preconditioning record (N=20480, ka=16, 2026-08-21):
    unpreconditioned converges in 75 iterations and Jacobi ties it (74);
    the cluster-block LU actively HURTS Burton-Miller (170 iterations —
    the round-4 "divergence" was this plus a 200-iteration budget);
    near-field ILU(0) wins at N=5120 (55) but crashes the tunneled TPU
    worker at N=20480. The bench's BM robustness line therefore runs
    unpreconditioned (see bench.py run_fmm)."""

    @pytest.mark.parametrize("ka", [2.0, np.pi])
    def test_matvec_and_resonance_safe_solve(self, ka):
        from mathaudio_tpu.bem import plane_wave
        from mathaudio_tpu.bem.assembly import assemble_burton_miller
        from mathaudio_tpu.bem.fmm import build_mlfmm_tree_system, gather_form
        from mathaudio_tpu.solvers import KrylovConfig, gmres
        from mathaudio_tpu.wave.analytical import sphere_scattering_3d

        # ka = pi is the first interior (Dirichlet) resonance of the unit
        # sphere, where the plain CBIE operator is singular — the BM
        # combination must stay well-conditioned there.
        mesh = icosphere(1.0, 3)
        n = mesh.num_elements
        beta = 1j / ka
        op = build_mlfmm_tree_system(mesh, ka, beta=beta, max_per_leaf=16)

        a = np.asarray(assemble_burton_miller(mesh, ka, beta=beta))
        rng = np.random.default_rng(3)
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        y = np.asarray(op.matvec(jnp.asarray(x)))
        rel = np.linalg.norm(y - a @ x) / np.linalg.norm(a @ x)
        assert rel < 1e-3, rel  # measured 2.0e-4 (ka=2), 7.9e-5 (ka=pi)

        inc = plane_wave((0.0, 0.0, 1.0))
        rhs = np.asarray(inc.pressure(jnp.asarray(mesh.centers), ka)) - beta * np.asarray(
            inc.normal_derivative(
                jnp.asarray(mesh.centers), jnp.asarray(mesh.normals), ka
            )
        )
        sol = gmres(
            gather_form(op), jnp.asarray(rhs),
            config=KrylovConfig(max_iterations=400, tolerance=1e-8, restart=60),
        )
        assert bool(sol.converged) and int(sol.iterations) < 60, int(sol.iterations)

        c = mesh.centers
        r_mie = float(np.linalg.norm(c, axis=1).mean())
        th = np.arccos(np.clip(c[:, 2] / np.linalg.norm(c, axis=1), -1, 1))
        ex = np.asarray(
            sphere_scattering_3d(ka, 1.0, 60, [r_mie], th).pressure
        ).reshape(-1)
        mie = np.linalg.norm(np.asarray(sol.x) - ex) / np.linalg.norm(ex)
        assert mie < 2e-2, mie  # measured 5.1e-3 (ka=2), 9.1e-3 (ka=pi)
