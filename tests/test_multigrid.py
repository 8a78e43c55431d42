"""Geometric multigrid + shifted-Laplacian preconditioning.

Mirrors math-fem multigrid tests: V-cycle contraction, MG solve on a
damped/low-k Helmholtz problem, and the shifted-Laplacian-preconditioned
GMRES beating Jacobi on an absorbing-wall room problem.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mathaudio_tpu.fem.multigrid import (
    GeometricMultigrid,
    box_hierarchy,
    rect_hierarchy,
    build_mg_params,
    structured_prolongation,
    vcycle,
    solve_multigrid,
    _level_matvec,
)
from mathaudio_tpu.models import RoomSweepModel
from mathaudio_tpu.models.helmholtz_room import sweep_pressure
from mathaudio_tpu.fem.mesh import unit_cube_tetrahedra
from mathaudio_tpu.solvers import KrylovConfig, gmres


class TestTransfer:
    def test_prolongation_partition_of_unity(self):
        for dim, nf in [(2, 8), (3, 4)]:
            idx, w = structured_prolongation(nf, nf // 2, dim)
            np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-14)

    def test_prolongation_exact_on_linear(self):
        # interpolating a linear function from coarse grid is exact
        hier = rect_hierarchy(8, 2)
        fine, coarse = hier
        idx, w = structured_prolongation(8, 4, 2)
        f = lambda p: 2.0 * p[:, 0] - 0.7 * p[:, 1] + 0.3
        xc = f(coarse.nodes)
        xf = (w * xc[idx]).sum(axis=1)
        np.testing.assert_allclose(xf, f(fine.nodes), atol=1e-13)


class TestVcycle:
    def test_mg_solve_low_k(self):
        # k below first resonance: plain MG on the true operator converges.
        meshes = box_hierarchy(8, 3)
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        k = 0.5
        mgp = build_mg_params(mg.builder, k, robin_coeff=-1j * k * 0.3, shift=(1.0, 0.0))
        n = meshes[0].num_nodes
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))
        x, cycles = solve_multigrid(mgp, b, tol=1e-8, max_cycles=60)
        r = b - _level_matvec(mgp.levels[0], x)
        rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
        assert rel < 1e-8, rel
        assert int(cycles) < 40, int(cycles)

    def test_vcycle_contracts(self):
        meshes = box_hierarchy(8, 2)
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        k = 0.8
        mgp = build_mg_params(mg.builder, k, robin_coeff=-1j * k * 0.3, shift=(1.0, 0.0))
        n = meshes[0].num_nodes
        rng = np.random.default_rng(1)
        b = jnp.asarray(rng.standard_normal(n) + 0j)
        x = vcycle(mgp, b)
        r1 = float(jnp.linalg.norm(b - _level_matvec(mgp.levels[0], x)))
        assert r1 < 0.5 * float(jnp.linalg.norm(b))


class TestShiftedLaplacianGmres:
    def test_beats_jacobi_on_room(self):
        n = 12
        mesh_hier = box_hierarchy(n, 3)
        model = RoomSweepModel(mesh_hier[0], absorption=0.15)
        params = model.params()
        mg = GeometricMultigrid(mesh_hier, robin_tags=(1, 2, 3, 4, 5, 6))
        k = 2.0

        cfg = KrylovConfig(max_iterations=2000, tolerance=1e-8, restart=30)
        p_jac, its_jac, conv_jac = sweep_pressure(
            params, jnp.asarray([k]), absorption=0.15, config=cfg,
            num_nodes=model.num_nodes, ell_width=model.ell_width,
        )

        from mathaudio_tpu.models.helmholtz_room import operator_of, system_values_of

        mgp = build_mg_params(mg.builder, k, robin_coeff=-1j * k * 0.15, shift=(1.0, 0.5))
        vals = system_values_of(params, k, 0.15)
        op = operator_of(params, vals, model.num_nodes, model.ell_width)
        sol = gmres(op.matvec, params.rhs, config=cfg, preconditioner=lambda r: vcycle(mgp, r))
        assert bool(sol.converged)
        assert int(sol.iterations) < int(its_jac[0]) / 3, (
            int(sol.iterations),
            int(its_jac[0]),
        )
        # same answer
        np.testing.assert_allclose(
            np.asarray(sol.x[params.listen_idx]), np.asarray(p_jac[0]), rtol=1e-4, atol=1e-9
        )


class TestCycleTypes:
    def test_w_and_f_cycles_converge_faster(self):
        """W/F cycles (cycle.rs CycleType::WCycle/FCycle) contract at
        least as fast per cycle as V on a 3-level hierarchy."""
        from mathaudio_tpu.fem.multigrid import mg_cycle

        meshes = box_hierarchy(8, 3)
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        k = 0.8
        mgp = build_mg_params(mg.builder, k, robin_coeff=-1j * k * 0.3, shift=(1.0, 0.0))
        n = meshes[0].num_nodes
        rng = np.random.default_rng(2)
        b = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))
        res = {}
        for cyc in ("v", "w", "f"):
            x = mg_cycle(mgp, b, cycle=cyc)
            res[cyc] = float(jnp.linalg.norm(b - _level_matvec(mgp.levels[0], x)))
        assert res["w"] <= res["v"] * 1.001, res
        assert res["f"] <= res["v"] * 1.001, res
        # and the stand-alone solve accepts the cycle type
        x, cycles_w = solve_multigrid(mgp, b, tol=1e-8, cycle="w")
        _, cycles_v = solve_multigrid(mgp, b, tol=1e-8, cycle="v")
        assert int(cycles_w) <= int(cycles_v), (int(cycles_w), int(cycles_v))


class TestAnchoredSweep:
    def test_anchor_paths_match_plain(self):
        """Anchored coarse inverses (Newton-Schulz chain) through both the
        nested anchor-chunk vmap (chunk a multiple of 128 lanes) and the
        flat gathered-inverse fallback agree with per-frequency exact
        inverses and converge identically."""
        meshes = box_hierarchy(8, 2)
        model = RoomSweepModel(meshes[0], absorption=0.15)
        params = model.params()
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        cfg = KrylovConfig(max_iterations=200, tolerance=1e-6, restart=8)
        ks = jnp.linspace(0.6, 2.0, 256, dtype=model.dtype)

        def run(anchors):
            fn = jax.jit(model.sweep_fn(cfg, mg_builder=mg.builder,
                                        mg_coarse_anchors=anchors))
            return fn(params, ks)

        p0, it0, c0 = run(0)  # exact per-frequency inverses
        assert bool(jnp.all(c0))
        p_nested, it_n, c_n = run(2)   # 256/2 = 128-frequency chunks
        p_flat, it_f, c_f = run(17)    # 256 % 17 != 0 -> flat gather path
        assert bool(jnp.all(c_n)) and bool(jnp.all(c_f))
        # preconditioner perturbation must not change iteration counts
        # by more than 1 nor the solution beyond solver tolerance
        assert int(jnp.max(jnp.abs(it_n - it0))) <= 1
        assert int(jnp.max(jnp.abs(it_f - it0))) <= 1
        np.testing.assert_allclose(np.asarray(p_nested), np.asarray(p0),
                                   rtol=2e-4, atol=1e-10)
        np.testing.assert_allclose(np.asarray(p_flat), np.asarray(p0),
                                   rtol=2e-4, atol=1e-10)

    def test_wide_band_falls_back_to_direct_inverses(self):
        """Anchors spaced beyond the Newton-Schulz basin must trigger the
        residual-guarded direct-inverse fallback, not NaN inverses."""
        meshes = box_hierarchy(8, 2)
        model = RoomSweepModel(meshes[0], absorption=0.15)
        params = model.params()
        mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
        cfg = KrylovConfig(max_iterations=200, tolerance=1e-6, restart=10)
        ks = jnp.linspace(0.5, 4.0, 8, dtype=model.dtype)  # dk/anchor = 1.75
        fn = jax.jit(model.sweep_fn(cfg, mg_builder=mg.builder,
                                    mg_coarse_anchors=2))
        p, it, c = fn(params, ks)
        assert bool(jnp.all(jnp.isfinite(jnp.abs(p)))), p
        assert bool(jnp.all(c)), (it, c)
