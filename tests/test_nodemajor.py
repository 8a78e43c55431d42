"""Node-major batched sweep (DIA + batched GMRES/MG) vs the vmapped path.

The node-major stack (fem/dia.py, solvers/krylov_batched.py,
fem/multigrid_batched.py, models/room_sweep_nm.py) must reproduce the
frequency-major sweep lane for lane: same algorithm, different batch
layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mathaudio_tpu.fem.assembly import HelmholtzAssembler
from mathaudio_tpu.fem.dia import dia_matvec, dia_pattern, dia_tables_of
from mathaudio_tpu.fem.mesh import unit_cube_tetrahedra
from mathaudio_tpu.fem.multigrid import GeometricMultigrid, box_grid_dims, box_hierarchy
from mathaudio_tpu.models import RoomSweepModel
from mathaudio_tpu.models.room_sweep_nm import NodeMajorRoomSweep
from mathaudio_tpu.solvers import KrylovConfig
from mathaudio_tpu.solvers.krylov import gmres
from mathaudio_tpu.solvers.krylov_batched import gmres_batched


class TestDia:
    def test_dia_matvec_matches_dense(self):
        mesh = unit_cube_tetrahedra(4)
        asm = HelmholtzAssembler(mesh, robin_tags=(1, 2, 3, 4, 5, 6))
        b_sum = sum(asm.b_vals.values())
        offsets, tables = dia_tables_of(asm, b_sum)
        assert len(offsets) == 15  # the box-mesh stencil
        n = mesh.num_nodes
        rng = np.random.default_rng(0)
        nf = 3
        ks = jnp.asarray([0.7, 1.3, 2.1])
        x = jnp.asarray(rng.normal(size=(n, nf)) + 1j * rng.normal(size=(n, nf)))
        cm = (ks * ks).astype(x.dtype)
        cb = (-1j * 0.15 * ks).astype(x.dtype)
        y = dia_matvec(offsets, tables, cm, cb, x)
        # dense reference per frequency
        row = np.asarray(asm.row_of_slot)
        col = np.asarray(asm.col_of_slot)
        for f in range(nf):
            vals = np.asarray(asm.k_vals) - float(ks[f]) ** 2 * np.asarray(asm.m_vals) \
                + complex(-1j * 0.15 * float(ks[f])) * np.asarray(b_sum)
            a = np.zeros((n, n), complex)
            np.add.at(a, (row, col), vals)
            np.testing.assert_allclose(
                np.asarray(y[:, f]), a @ np.asarray(x[:, f]), rtol=1e-10, atol=1e-12
            )

    def test_pattern_covers_all_slots(self):
        mesh = unit_cube_tetrahedra(5)
        asm = HelmholtzAssembler(mesh)
        offsets, d_of_slot = dia_pattern(asm.row_of_slot, asm.col_of_slot)
        assert d_of_slot.shape[0] == np.asarray(asm.row_of_slot).shape[0]
        assert 0 in offsets
        off = np.asarray(asm.col_of_slot) - np.asarray(asm.row_of_slot)
        np.testing.assert_array_equal(np.asarray(offsets)[d_of_slot], off)


class TestBatchedGmres:
    def test_matches_vmapped_lane_for_lane(self):
        rng = np.random.default_rng(1)
        n, nf = 50, 4
        a = rng.normal(size=(nf, n, n)) + 1j * rng.normal(size=(nf, n, n))
        a += (25 + 5 * np.arange(nf))[:, None, None] * np.eye(n)
        b = rng.normal(size=(nf, n)) + 1j * rng.normal(size=(nf, n))
        aj, bj = jnp.asarray(a), jnp.asarray(b)
        cfg = KrylovConfig(max_iterations=80, tolerance=1e-9, restart=10)
        diag = jnp.stack([jnp.diagonal(aj[f]) for f in range(nf)])
        sol_v = jax.vmap(
            lambda af, bf, df: gmres(af, bf, config=cfg, preconditioner=lambda v: v / df)
        )(aj, bj, diag)
        at = jnp.transpose(aj, (1, 2, 0))
        sol_b = gmres_batched(
            lambda x: jnp.einsum("nmf,mf->nf", at, x),
            bj.T, config=cfg, preconditioner=lambda v: v / diag.T,
        )
        np.testing.assert_array_equal(np.asarray(sol_b.iterations), np.asarray(sol_v.iterations))
        np.testing.assert_array_equal(np.asarray(sol_b.converged), np.asarray(sol_v.converged))
        np.testing.assert_allclose(np.asarray(sol_b.x.T), np.asarray(sol_v.x), atol=1e-12)

    def test_restart_and_budget(self):
        # lanes that need >1 restart cycle, plus a lane that exhausts budget
        rng = np.random.default_rng(2)
        n, nf = 40, 3
        a = rng.normal(size=(nf, n, n)) + (4 + 12 * np.arange(nf))[:, None, None] * np.eye(n)
        b = rng.normal(size=(nf, n)) + 0j
        cfg = KrylovConfig(max_iterations=25, tolerance=1e-10, restart=8)
        at = jnp.transpose(jnp.asarray(a), (1, 2, 0))
        sol = gmres_batched(lambda x: jnp.einsum("nmf,mf->nf", at, x),
                            jnp.asarray(b).T, config=cfg)
        sol_v = jax.vmap(lambda af, bf: gmres(af, bf, config=cfg))(
            jnp.asarray(a), jnp.asarray(b)
        )
        np.testing.assert_array_equal(np.asarray(sol.iterations), np.asarray(sol_v.iterations))
        np.testing.assert_allclose(np.asarray(sol.x.T), np.asarray(sol_v.x), atol=1e-10)


class TestNodeMajorSweep:
    @pytest.mark.parametrize("cycle", ["v", "w"])
    def test_matches_vmapped_sweep(self, cycle):
        meshes = box_hierarchy(8, 2)
        model = RoomSweepModel(
            meshes[0], wall_tags=(1, 2, 3, 4, 5, 6), absorption=0.15,
            listening_positions=((0.25, 0.25, 0.25), (0.7, 0.6, 0.4)),
        )
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        cfg = KrylovConfig(max_iterations=60, tolerance=1e-6, restart=8)
        ks = jnp.linspace(0.55, 2.2, 8, dtype=model.dtype)
        fn_old = jax.jit(model.sweep_fn(
            cfg, mg_builder=mg.builder, mg_nu=1, mg_omega=1.0,
            mg_coarse_anchors=4, mg_cycle_type=cycle,
        ))
        p_old, it_old, cv_old = fn_old(model.params(), ks)
        nm = NodeMajorRoomSweep(model, mg)
        fn_nm = jax.jit(nm.sweep_fn(cfg, mg_nu=1, mg_omega=1.0,
                                    mg_coarse_anchors=4, mg_cycle_type=cycle))
        p_nm, it_nm, cv_nm = fn_nm(nm.params(), ks)
        np.testing.assert_array_equal(np.asarray(it_nm), np.asarray(it_old))
        assert np.all(np.asarray(cv_nm))
        scale = np.max(np.abs(np.asarray(p_old)))
        np.testing.assert_allclose(np.asarray(p_nm), np.asarray(p_old),
                                   atol=1e-10 * scale)

    @pytest.mark.parametrize("cycle", ["v", "f"])
    def test_matches_vmapped_three_levels(self, cycle):
        # 3-level hierarchy: exercises the shifted deeper-level operators
        # (l >= 1 in make_dia_mg) and the F-cycle's V-recursion — the
        # bench default is levels=3, so the headline path must be under
        # test, not just the 2-level slice.
        meshes = box_hierarchy(8, 3)
        model = RoomSweepModel(
            meshes[0], wall_tags=(1, 2, 3, 4, 5, 6), absorption=0.15,
            listening_positions=((0.25, 0.25, 0.25),),
        )
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        cfg = KrylovConfig(max_iterations=60, tolerance=1e-6, restart=8)
        ks = jnp.linspace(0.55, 2.2, 8, dtype=model.dtype)
        fn_old = jax.jit(model.sweep_fn(
            cfg, mg_builder=mg.builder, mg_nu=1, mg_omega=1.0,
            mg_coarse_anchors=4, mg_cycle_type=cycle,
        ))
        p_old, it_old, _ = fn_old(model.params(), ks)
        nm = NodeMajorRoomSweep(model, mg)
        fn_nm = jax.jit(nm.sweep_fn(cfg, mg_nu=1, mg_omega=1.0,
                                    mg_coarse_anchors=4, mg_cycle_type=cycle))
        p_nm, it_nm, cv_nm = fn_nm(nm.params(), ks)
        np.testing.assert_array_equal(np.asarray(it_nm), np.asarray(it_old))
        assert np.all(np.asarray(cv_nm))
        scale = np.max(np.abs(np.asarray(p_old)))
        np.testing.assert_allclose(np.asarray(p_nm), np.asarray(p_old),
                                   atol=1e-10 * scale)

    def test_no_anchoring_mode(self):
        # anchors <= 0 = one coarse inverse per frequency; lane-exact vs
        # the vmapped sweep with per-frequency anchors (anchors=nf runs
        # the same Newton-Schulz inverse chain).
        meshes = box_hierarchy(8, 2)
        model = RoomSweepModel(meshes[0], wall_tags=(1, 2, 3, 4, 5, 6),
                               absorption=0.15)
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        cfg = KrylovConfig(max_iterations=60, tolerance=1e-6, restart=8)
        ks = jnp.linspace(0.6, 2.0, 4, dtype=model.dtype)
        p_old, it_old, _ = jax.jit(model.sweep_fn(
            cfg, mg_builder=mg.builder, mg_nu=1, mg_omega=1.0,
            mg_coarse_anchors=4,
        ))(model.params(), ks)
        nm = NodeMajorRoomSweep(model, mg)
        p_nm, it_nm, cv_nm = jax.jit(nm.sweep_fn(
            cfg, mg_nu=1, mg_omega=1.0, mg_coarse_anchors=0,
        ))(nm.params(), ks)
        np.testing.assert_array_equal(np.asarray(it_nm), np.asarray(it_old))
        assert np.all(np.asarray(cv_nm))
        scale = np.max(np.abs(np.asarray(p_old)))
        np.testing.assert_allclose(np.asarray(p_nm), np.asarray(p_old),
                                   atol=1e-10 * scale)

    def test_anchor_count_rounds_to_divisor(self):
        meshes = box_hierarchy(6, 2)
        model = RoomSweepModel(meshes[0], wall_tags=(1, 2, 3, 4, 5, 6),
                               absorption=0.15)
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        nm = NodeMajorRoomSweep(model, mg)
        cfg = KrylovConfig(max_iterations=60, tolerance=1e-6, restart=8)
        ks = jnp.linspace(0.6, 2.0, 8, dtype=model.dtype)
        fn = jax.jit(nm.sweep_fn(cfg, mg_coarse_anchors=3))
        with pytest.warns(UserWarning, match="does not divide"):
            _, _, conv = fn(nm.params(), ks)
        assert np.all(np.asarray(conv))

    def test_unstructured_sparsity_rejected(self):
        # A scattered (non-stencil) sparsity must raise instead of
        # silently building near-dense (D, N) DIA tables.
        from types import SimpleNamespace

        rng = np.random.default_rng(3)
        n, nnz = 200, 600
        asm = SimpleNamespace(
            row_of_slot=rng.integers(0, n, nnz),
            col_of_slot=rng.integers(0, n, nnz),
            num_nodes=n,
        )
        with pytest.raises(ValueError, match="node-major DIA"):
            NodeMajorRoomSweep._check_structured(asm)

    def test_jacobi_variant(self):
        meshes = box_hierarchy(6, 1)
        model = RoomSweepModel(meshes[0], absorption=0.2)
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        nm = NodeMajorRoomSweep(model, mg)
        cfg = KrylovConfig(max_iterations=400, tolerance=1e-8, restart=30)
        ks = jnp.asarray([0.6, 1.1], dtype=model.dtype)
        p, its, conv = jax.jit(nm.sweep_fn_jacobi(cfg))(nm.params(), ks)
        p_ref, _, conv_ref = model.sweep(ks, cfg)
        assert np.all(np.asarray(conv))
        scale = np.max(np.abs(np.asarray(p_ref)))
        np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-6 * scale)


class TestTensorProductTransfers:
    """Separable (tensor-product) multigrid transfers: three streamed 1D
    matmuls replacing the 2^d-point gather stencil on box hierarchies —
    exactly the same operator (fem.multigrid.prolongation_1d)."""

    def test_prolongation_1d_matches_stencil_rows(self):
        from mathaudio_tpu.fem.multigrid import prolongation_1d

        p = prolongation_1d(3)  # 7 fine x 4 coarse
        assert p.shape == (7, 4)
        np.testing.assert_allclose(p[::2], np.eye(4))  # even rows: injection
        np.testing.assert_allclose(p[1::2].sum(axis=1), 1.0)  # odd rows: averages
        np.testing.assert_allclose(p[1, :2], [0.5, 0.5])

    def test_box_grid_dims_detects_and_rejects(self):
        from types import SimpleNamespace

        from mathaudio_tpu.fem.multigrid import box_grid_dims

        mesh = unit_cube_tetrahedra(4)
        assert box_grid_dims(mesh) == (5, 5, 5)
        # perturbed nodes are not a lexicographic grid
        nodes = mesh.nodes.copy()
        nodes[7, 0] += 0.01
        assert box_grid_dims(SimpleNamespace(nodes=nodes)) is None
        # 2D meshes fall back too
        assert box_grid_dims(SimpleNamespace(nodes=nodes[:, :2])) is None

    def test_tp_factors_built_and_lane_exact(self):
        meshes = box_hierarchy(8, 3)
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        model = RoomSweepModel(
            meshes[0], wall_tags=(1, 2, 3, 4, 5, 6), absorption=0.15,
            assembler=mg.assemblers[0],
        )
        nm = NodeMajorRoomSweep(model, mg)
        params = nm.params()
        assert len(params.tp) == 2  # one per smoothing level
        assert params.tp[0][0].shape == (9, 5)  # (pz) level-0: 8 -> 4 cells
        cfg = KrylovConfig(max_iterations=60, tolerance=1e-6, restart=8)
        ks = jnp.linspace(0.55, 2.2, 8, dtype=model.dtype)
        fn_tp = jax.jit(nm.sweep_fn(cfg, mg_nu=1, mg_omega=1.0,
                                    mg_coarse_anchors=4, mg_transfers="tp"))
        fn_g = jax.jit(nm.sweep_fn(cfg, mg_nu=1, mg_omega=1.0, mg_coarse_anchors=4))
        p_tp, it_tp, cv_tp = fn_tp(params, ks)
        p_g, it_g, cv_g = fn_g(params, ks)  # gather default
        assert np.all(np.asarray(cv_tp)) and np.all(np.asarray(cv_g))
        np.testing.assert_array_equal(np.asarray(it_tp), np.asarray(it_g))
        scale = np.max(np.abs(np.asarray(p_g)))
        np.testing.assert_allclose(np.asarray(p_tp), np.asarray(p_g),
                                   atol=1e-10 * scale)

    def test_stream_transfers_match_gather_sweep(self):
        meshes = box_hierarchy(8, 3)
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        model = RoomSweepModel(
            meshes[0], wall_tags=(1, 2, 3, 4, 5, 6), absorption=0.15,
            assembler=mg.assemblers[0],
        )
        nm = NodeMajorRoomSweep(model, mg)
        assert nm.grid_dims == ((9, 9, 9), (5, 5, 5), (3, 3, 3))
        params = nm.params()
        cfg = KrylovConfig(max_iterations=60, tolerance=1e-6, restart=8)
        ks = jnp.linspace(0.55, 2.2, 8, dtype=model.dtype)
        fn_s = jax.jit(nm.sweep_fn(cfg, mg_nu=1, mg_omega=1.0,
                                   mg_coarse_anchors=4, mg_transfers="stream"))
        fn_g = jax.jit(nm.sweep_fn(cfg, mg_nu=1, mg_omega=1.0, mg_coarse_anchors=4))
        p_s, it_s, cv_s = fn_s(params, ks)
        p_g, it_g, cv_g = fn_g(params, ks)
        assert np.all(np.asarray(cv_s)) and np.all(np.asarray(cv_g))
        np.testing.assert_array_equal(np.asarray(it_s), np.asarray(it_g))
        scale = np.max(np.abs(np.asarray(p_g)))
        np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_g),
                                   atol=1e-10 * scale)

    def test_stream16_converges_to_same_solution(self):
        # bf16-plane transfers perturb the PRECONDITIONER only (~4e-3),
        # so iteration counts may differ by a step, but the accepted
        # solutions must still satisfy the same residual tolerance and
        # agree with the exact-transfer sweep to solver accuracy.
        meshes = box_hierarchy(8, 3)
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        model = RoomSweepModel(
            meshes[0], wall_tags=(1, 2, 3, 4, 5, 6), absorption=0.15,
            listening_positions=((0.25, 0.25, 0.25),),
            assembler=mg.assemblers[0],
        )
        nm = NodeMajorRoomSweep(model, mg)
        params = nm.params()
        cfg = KrylovConfig(max_iterations=60, tolerance=1e-6, restart=8)
        ks = jnp.linspace(0.55, 2.2, 8, dtype=model.dtype)
        fn_16 = jax.jit(nm.sweep_fn(cfg, mg_nu=1, mg_omega=1.0,
                                    mg_coarse_anchors=4,
                                    mg_transfers="stream16"))
        fn_g = jax.jit(nm.sweep_fn(cfg, mg_nu=1, mg_omega=1.0, mg_coarse_anchors=4))
        p_16, it_16, cv_16 = fn_16(params, ks)
        p_g, _, cv_g = fn_g(params, ks)
        assert np.all(np.asarray(cv_16)) and np.all(np.asarray(cv_g))
        scale = np.max(np.abs(np.asarray(p_g)))
        # Both runs pass the (left-preconditioned) 1e-6 residual gate, but
        # the two runs use DIFFERENT preconditioners (bf16-plane vs exact
        # transfers), so the accepted solutions are distinct members of
        # the residual-tolerance ball; near band resonances the listening-
        # point pressures amplify that to the ~1e-4 relative level
        # (measured max 2.7e-4 on this band). 1e-3 bounds it with margin
        # while still catching a wrong-operator bug (which shows up at
        # O(1), see test_stream_transfers_match_gather_sweep for the
        # exact-arithmetic parity contract).
        np.testing.assert_allclose(np.asarray(p_16), np.asarray(p_g),
                                   atol=1e-3 * scale)

    def test_stream_transfers_require_box_hierarchy(self):
        meshes = box_hierarchy(4, 2)
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        model = RoomSweepModel(meshes[0], assembler=mg.assemblers[0])
        nm = NodeMajorRoomSweep(model, mg)
        nm.grid_dims = ()  # simulate a non-box hierarchy
        with pytest.raises(ValueError, match="stream"):
            nm.sweep_fn(mg_transfers="stream")

    def test_unknown_transfers_rejected(self):
        meshes = box_hierarchy(4, 2)
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        model = RoomSweepModel(meshes[0], assembler=mg.assemblers[0])
        nm = NodeMajorRoomSweep(model, mg)
        with pytest.raises(ValueError, match="mg_transfers"):
            nm.sweep_fn(mg_transfers="matfree")

    def test_transfer_ops_equal_stencil_apply(self):
        from mathaudio_tpu.fem.multigrid_batched import (
            _prolong_b,
            _restrict_b,
        )

        meshes = box_hierarchy(6, 2)
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        model = RoomSweepModel(meshes[0], assembler=mg.assemblers[0])
        nm = NodeMajorRoomSweep(model, mg)
        lvl = nm.params().levels[0]
        tp = nm.params().tp[0]
        rng = np.random.default_rng(5)
        nf, nc = meshes[0].num_nodes, meshes[1].num_nodes
        xc = jnp.asarray(rng.normal(size=(nc, 4)) + 1j * rng.normal(size=(nc, 4)))
        rf = jnp.asarray(rng.normal(size=(nf, 4)) + 1j * rng.normal(size=(nf, 4)))
        np.testing.assert_allclose(
            np.asarray(_prolong_b(lvl, xc, tp)), np.asarray(_prolong_b(lvl, xc)),
            atol=1e-13,
        )
        np.testing.assert_allclose(
            np.asarray(_restrict_b(lvl, rf, nc, tp)),
            np.asarray(_restrict_b(lvl, rf, nc)),
            atol=1e-13,
        )
        dims_f = box_grid_dims(meshes[0])
        dims_c = box_grid_dims(meshes[1])
        np.testing.assert_allclose(
            np.asarray(_prolong_b(lvl, xc, dims_c=dims_c)),
            np.asarray(_prolong_b(lvl, xc)),
            atol=1e-13,
        )
        np.testing.assert_allclose(
            np.asarray(_restrict_b(lvl, rf, nc, dims_f=dims_f)),
            np.asarray(_restrict_b(lvl, rf, nc)),
            atol=1e-13,
        )


class TestCgs1Orthogonalization:
    def test_cgs1_matches_cgs2_on_preconditioned_sweep(self):
        # The bench-style workload: MG-preconditioned short cycles. CGS1
        # must deliver the same solutions to solver tolerance, with true
        # residuals (not just Givens estimates) below tol.
        meshes = box_hierarchy(8, 3)
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        model = RoomSweepModel(
            meshes[0], wall_tags=(1, 2, 3, 4, 5, 6), absorption=0.15,
            assembler=mg.assemblers[0],
        )
        nm = NodeMajorRoomSweep(model, mg)
        params = nm.params()
        cfg = KrylovConfig(max_iterations=60, tolerance=1e-6, restart=8)
        ks = jnp.linspace(0.55, 2.2, 8, dtype=model.dtype)
        out = {}
        for orth in ("cgs1", "cgs2"):
            fn = jax.jit(nm.sweep_fn(cfg, mg_nu=1, mg_omega=1.0,
                                     mg_coarse_anchors=4, gmres_orth=orth))
            out[orth] = fn(params, ks)
            assert np.all(np.asarray(out[orth][2])), orth
        p1, p2 = np.asarray(out["cgs1"][0]), np.asarray(out["cgs2"][0])
        scale = np.max(np.abs(p2))
        np.testing.assert_allclose(p1, p2, atol=2e-6 * scale)

    def test_cgs1_true_residual_below_tol(self):
        # Givens residual can drift from the true residual when
        # orthogonality degrades; verify it does not on this workload.
        # "True" means the recomputed LEFT-PRECONDITIONED residual
        # ||M(b - Ax)|| / ||M b|| — the quantity left-preconditioned GMRES
        # minimizes and the Givens recurrence estimates (gmres.rs:282
        # semantics); the unpreconditioned ratio is larger by ~cond(M A)
        # for BOTH cgs1 and cgs2 and is not what the stop test promises.
        from mathaudio_tpu.fem.dia import dia_matvec

        meshes = box_hierarchy(8, 2)
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        model = RoomSweepModel(meshes[0], wall_tags=(1, 2, 3, 4, 5, 6),
                               absorption=0.15, assembler=mg.assemblers[0])
        nm = NodeMajorRoomSweep(model, mg)
        params = nm.params()
        cfg = KrylovConfig(max_iterations=60, tolerance=1e-6, restart=8)
        ks = jnp.linspace(0.55, 2.2, 8, dtype=model.dtype)
        mgb = nm.sweep_fn  # noqa: F841  (keep model alive)
        from mathaudio_tpu.solvers.krylov_batched import gmres_batched
        from mathaudio_tpu.fem.multigrid_batched import make_dia_mg, mg_cycle_batched
        from mathaudio_tpu.fem.multigrid import build_coarse_inv_chain

        cd = params.rhs.dtype
        k = ks.astype(cd)
        cm, cb = k * k, jnp.asarray(-1j * 0.15, cd) * k
        anchor_ks = jnp.mean(ks.reshape(4, 2), axis=1)
        anchor_inv = build_coarse_inv_chain(
            params.mg_builder, anchor_ks,
            jnp.asarray(-1j * 0.15, cd) * anchor_ks.astype(cd))
        mgp = make_dia_mg(nm.offsets, params.levels, ks, 0.15, anchor_inv,
                          tp=params.tp)
        a_mv = lambda x: dia_matvec(nm.offsets[0], params.fine_tables, cm, cb, x)
        pre = lambda r: mg_cycle_batched(mgp, nm.offsets, r, omega=1.0, nu=1)
        b = jnp.broadcast_to(params.rhs[:, None], (params.rhs.shape[0], 8))
        sol = gmres_batched(a_mv, b, config=cfg, preconditioner=pre, orth="cgs1")
        assert np.all(np.asarray(sol.converged))

        def pnorm(v):
            return jnp.sqrt(jnp.sum(jnp.abs(pre(v)) ** 2, axis=0))

        true_res = np.asarray(pnorm(b - a_mv(sol.x)) / pnorm(b))
        # recomputed preconditioned residual vs the Givens estimate
        assert np.all(true_res < 2 * cfg.tolerance), true_res
        np.testing.assert_allclose(true_res, np.asarray(sol.residual_norm),
                                   rtol=0.1, atol=1e-9)

    def test_unknown_orth_rejected(self):
        from mathaudio_tpu.solvers.krylov_batched import gmres_batched

        with pytest.raises(ValueError, match="orthogonalization"):
            gmres_batched(lambda x: x, jnp.ones((4, 2), jnp.complex128),
                          orth="mgs")


def test_freq_chunked_sweep_matches_whole_band():
    """freq_chunk streaming (the HBM-bounded 4096-band path) is exactly
    the whole-band sweep per chunk: same anchors-per-chunk grouping ->
    lane-for-lane equality."""
    import jax

    from mathaudio_tpu.fem.multigrid import GeometricMultigrid, box_hierarchy
    from mathaudio_tpu.models import RoomSweepModel
    from mathaudio_tpu.models.room_sweep_nm import NodeMajorRoomSweep
    from mathaudio_tpu.solvers import KrylovConfig

    meshes = box_hierarchy(6, 2)
    mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
    model = RoomSweepModel(
        meshes[0], wall_tags=(1, 2, 3, 4, 5, 6), absorption=0.15,
        listening_positions=((0.25, 0.25, 0.25),), assembler=mg.assemblers[0],
    )
    nm = NodeMajorRoomSweep(model, mg)
    params = nm.params()
    config = KrylovConfig(max_iterations=60, tolerance=1e-6, restart=6)
    ks = jnp.linspace(0.6, 2.1, 16, dtype=model.dtype)

    whole = jax.jit(nm.sweep_fn(config, mg_nu=1, mg_omega=1.0,
                                mg_coarse_anchors=8))
    chunked = jax.jit(nm.sweep_fn(config, mg_nu=1, mg_omega=1.0,
                                  mg_coarse_anchors=2, freq_chunk=4))
    p_w, its_w, conv_w = whole(params, ks)
    p_c, its_c, conv_c = chunked(params, ks)
    assert bool(jnp.all(conv_w)) and bool(jnp.all(conv_c))
    np.testing.assert_array_equal(np.asarray(its_c), np.asarray(its_w))
    # the Newton-Schulz anchor-inverse chain normalizes over the anchor
    # batch, so different chunk groupings differ at roundoff (~1e-9)
    np.testing.assert_allclose(np.asarray(p_c), np.asarray(p_w),
                               rtol=1e-6, atol=1e-9)

    with np.testing.assert_raises(ValueError):
        jax.jit(nm.sweep_fn(config, freq_chunk=5))(params, ks)


def test_dia_matvec_pallas_matches_xla():
    """Halo-tiled Pallas DIA matvec (interpret on CPU) == the XLA shifted
    -slice form, including the interleaved complex combine."""
    import jax

    from mathaudio_tpu.fem.dia import dia_matvec, dia_matvec_pallas
    from mathaudio_tpu.fem.multigrid import GeometricMultigrid, box_hierarchy
    from mathaudio_tpu.models import RoomSweepModel
    from mathaudio_tpu.models.room_sweep_nm import NodeMajorRoomSweep

    meshes = box_hierarchy(6, 2)
    mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
    model = RoomSweepModel(meshes[0], wall_tags=(1, 2, 3, 4, 5, 6),
                           absorption=0.15,
                           listening_positions=((0.25, 0.25, 0.25),),
                           assembler=mg.assemblers[0])
    nm = NodeMajorRoomSweep(model, mg)
    p = nm.params()
    offs = nm.offsets[0]
    n, F = p.rhs.shape[0], 8
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        (rng.standard_normal((n, F)) + 1j * rng.standard_normal((n, F))
         ).astype(np.complex64)
    )
    ks = jnp.linspace(0.6, 2.1, F, dtype=jnp.float32)
    cm = (ks * ks).astype(jnp.complex64)
    cb = (-1j * 0.15 * ks).astype(jnp.complex64)
    # f64 tables downcast inside; compare both at c64 working precision
    y_ref = np.asarray(dia_matvec(offs, p.fine_tables, cm, cb, x))
    # odd tile/lane sizes exercise padding paths
    for tile_n, lane_tile in ((128, 16), (200, 8)):
        y_p = np.asarray(dia_matvec_pallas(offs, p.fine_tables, cm, cb, x,
                                           tile_n=tile_n, lane_tile=lane_tile))
        rel = np.linalg.norm(y_p - y_ref) / np.linalg.norm(y_ref)
        assert rel < 1e-5, (tile_n, lane_tile, rel)


class TestPerLevelNu:
    def test_tuple_nu_converges_and_matches(self):
        """mg_nu as a per-level tuple (round-4 knob: e.g. (1, 2) doubles
        the level-1 smoothing without touching the fine level) solves to
        the same tolerance-gated solutions as scalar nu."""
        import jax
        import jax.numpy as jnp

        from mathaudio_tpu.fem.multigrid import GeometricMultigrid, box_hierarchy
        from mathaudio_tpu.models import RoomSweepModel
        from mathaudio_tpu.models.room_sweep_nm import NodeMajorRoomSweep
        from mathaudio_tpu.solvers import KrylovConfig

        meshes = box_hierarchy(6, 2)
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        model = RoomSweepModel(
            meshes[0], wall_tags=(1, 2, 3, 4, 5, 6), absorption=0.15,
            listening_positions=((0.25, 0.25, 0.25),),
            assembler=mg.assemblers[0],
        )
        nm = NodeMajorRoomSweep(model, mg)
        params = nm.params()
        cfg = KrylovConfig(max_iterations=60, tolerance=1e-8, restart=8)
        ks = jnp.linspace(0.7, 1.9, 8, dtype=model.dtype)
        p1, it1, cv1 = jax.jit(nm.sweep_fn(cfg, mg_nu=1, mg_omega=1.0,
                                           mg_coarse_anchors=2))(params, ks)
        p2, it2, cv2 = jax.jit(nm.sweep_fn(cfg, mg_nu=(1, 2), mg_omega=1.0,
                                           mg_coarse_anchors=2))(params, ks)
        assert bool(jnp.all(cv1)) and bool(jnp.all(cv2))
        # stronger level-1 smoothing must not need more iterations
        assert int(jnp.max(it2)) <= int(jnp.max(it1))
        scale = float(jnp.max(jnp.abs(p1)))
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                                   atol=1e-6 * scale)


class TestWarmStart:
    """Anchor-interpolated warm starts (room_sweep_nm warm_stride)."""

    def _setup(self, n=8, levels=2):
        meshes = box_hierarchy(n, levels)
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        model = RoomSweepModel(
            meshes[0], wall_tags=(1, 2, 3, 4, 5, 6), absorption=0.15,
            listening_positions=((0.25, 0.25, 0.25), (0.7, 0.6, 0.4)),
            assembler=mg.assemblers[0],
        )
        return model, GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))

    def test_gmres_batched_exact_x0_converges_immediately(self):
        from mathaudio_tpu.solvers.krylov_batched import gmres_batched

        rng = np.random.default_rng(3)
        n, nf = 24, 4
        a = jnp.asarray(rng.standard_normal((n, n)) + np.eye(n) * 6.0,
                        jnp.complex128)
        xs = jnp.asarray(rng.standard_normal((n, nf)), jnp.complex128)
        b = a @ xs
        cfg = KrylovConfig(max_iterations=50, tolerance=1e-8, restart=8)
        sol = gmres_batched(lambda v: a @ v, b, config=cfg, x0=xs)
        assert bool(jnp.all(sol.converged))
        # initial residual is already below tol: the first cycle's
        # done-mask is set before any Arnoldi step, so no iterations count
        assert int(jnp.max(sol.iterations)) == 0
        np.testing.assert_allclose(np.asarray(sol.x), np.asarray(xs),
                                   atol=1e-8)

    def test_warm_sweep_matches_cold(self):
        model, mg = self._setup()
        nm = NodeMajorRoomSweep(model, mg)
        params = nm.params()
        cfg = KrylovConfig(max_iterations=60, tolerance=1e-6, restart=8)
        ks = jnp.linspace(0.55, 2.2, 16, dtype=model.dtype)
        cold = jax.jit(nm.sweep_fn(cfg, mg_nu=1, mg_omega=1.0,
                                   mg_coarse_anchors=4))
        warm = jax.jit(nm.sweep_fn(cfg, mg_nu=1, mg_omega=1.0,
                                   mg_coarse_anchors=4, warm_stride=4,
                                   warm_restart=4))
        p_c, it_c, cv_c = cold(params, ks)
        p_w, it_w, cv_w = warm(params, ks)
        assert bool(jnp.all(cv_c)) and bool(jnp.all(cv_w))
        # both are tolerance-1e-6 solutions of the same systems
        scale = float(jnp.max(jnp.abs(p_c)))
        np.testing.assert_allclose(np.asarray(p_w), np.asarray(p_c),
                                   atol=2e-5 * scale)
        # the warm interpolant must actually help: non-anchor lanes need
        # no more iterations than the cold solve (anchor lanes carry the
        # honest two-phase total)
        it_c, it_w = np.asarray(it_c), np.asarray(it_w)
        non_anchor = np.ones(len(ks), bool)
        non_anchor[::4] = False
        assert it_w[non_anchor].max() <= it_c[non_anchor].max()

    def test_warm_stride_must_divide(self):
        model, mg = self._setup(n=6)
        nm = NodeMajorRoomSweep(model, mg)
        cfg = KrylovConfig(max_iterations=30, tolerance=1e-5, restart=6)
        ks = jnp.linspace(0.7, 1.9, 10, dtype=model.dtype)
        with pytest.raises(ValueError, match="warm_stride"):
            jax.jit(nm.sweep_fn(cfg, warm_stride=3))(nm.params(), ks)

    def test_warm_with_freq_chunk(self):
        # warm start operates per chunk; combined path stays correct
        model, mg = self._setup(n=6)
        nm = NodeMajorRoomSweep(model, mg)
        params = nm.params()
        cfg = KrylovConfig(max_iterations=60, tolerance=1e-6, restart=8)
        ks = jnp.linspace(0.55, 2.2, 16, dtype=model.dtype)
        ref = jax.jit(nm.sweep_fn(cfg, mg_nu=1, mg_omega=1.0,
                                  mg_coarse_anchors=2))
        warm = jax.jit(nm.sweep_fn(cfg, mg_nu=1, mg_omega=1.0,
                                   mg_coarse_anchors=2, freq_chunk=8,
                                   warm_stride=2))
        p_r, _, cv_r = ref(params, ks)
        p_w, _, cv_w = warm(params, ks)
        assert bool(jnp.all(cv_r)) and bool(jnp.all(cv_w))
        scale = float(jnp.max(jnp.abs(p_r)))
        np.testing.assert_allclose(np.asarray(p_w), np.asarray(p_r),
                                   atol=2e-5 * scale)

    def test_warm_cubic_matches_cold(self):
        model, mg = self._setup()
        nm = NodeMajorRoomSweep(model, mg)
        params = nm.params()
        cfg = KrylovConfig(max_iterations=60, tolerance=1e-6, restart=8)
        ks = jnp.linspace(0.55, 2.2, 16, dtype=model.dtype)
        cold = jax.jit(nm.sweep_fn(cfg, mg_nu=1, mg_omega=1.0,
                                   mg_coarse_anchors=4))
        warm = jax.jit(nm.sweep_fn(cfg, mg_nu=1, mg_omega=1.0,
                                   mg_coarse_anchors=4, warm_stride=4,
                                   warm_restart=4, warm_interp="cubic"))
        p_c, _, cv_c = cold(params, ks)
        p_w, it_w, cv_w = warm(params, ks)
        assert bool(jnp.all(cv_c)) and bool(jnp.all(cv_w))
        scale = float(jnp.max(jnp.abs(p_c)))
        np.testing.assert_allclose(np.asarray(p_w), np.asarray(p_c),
                                   atol=2e-5 * scale)
