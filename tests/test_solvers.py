"""Krylov solvers, sparse formats, preconditioners.

Mirrors math-solvers in-crate tests (gmres.rs, cg.rs, csr.rs, ilu.rs,
schwarz.rs test modules): small SPD/general/complex systems solved to
tight tolerances, CSR/ELL matvec identities, preconditioner algebra.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mathaudio_tpu.solvers import (
    KrylovConfig,
    cg,
    bicgstab,
    cgs,
    gmres,
    lu_solve,
    complex_solve,
    LuFactorization,
    CsrMatrix,
    DenseOperator,
    jacobi_preconditioner,
    IluFixedPoint,
    AdditiveSchwarz,
    BlockJacobi,
)


def spd_matrix(n, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)).astype(dtype)
    return a @ a.T + n * np.eye(n, dtype=dtype)


def complex_diag_dominant(n, seed=1):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a += np.diag(3.0 * n + np.arange(n) + 1j * np.ones(n))
    return a


class TestCG:
    def test_spd_solve(self):
        n = 40
        a = spd_matrix(n)
        x_true = np.arange(1.0, n + 1)
        b = a @ x_true
        sol = cg(jnp.asarray(a), jnp.asarray(b), config=KrylovConfig(tolerance=1e-12))
        assert bool(sol.converged)
        np.testing.assert_allclose(np.asarray(sol.x), x_true, rtol=1e-8)

    def test_jacobi_preconditioned(self):
        n = 50
        a = spd_matrix(n, seed=3)
        b = np.ones(n)
        m = jacobi_preconditioner(jnp.asarray(np.diag(a)))
        sol = cg(jnp.asarray(a), jnp.asarray(b), config=KrylovConfig(tolerance=1e-12), preconditioner=m)
        assert bool(sol.converged)
        np.testing.assert_allclose(np.asarray(a @ np.asarray(sol.x)), b, atol=1e-8)


class TestGmres:
    def test_nonsymmetric(self):
        n = 30
        rng = np.random.default_rng(7)
        a = rng.standard_normal((n, n)) + n * np.eye(n)
        x_true = rng.standard_normal(n)
        b = a @ x_true
        sol = gmres(jnp.asarray(a), jnp.asarray(b), config=KrylovConfig(tolerance=1e-12, restart=20))
        assert bool(sol.converged)
        np.testing.assert_allclose(np.asarray(sol.x), x_true, rtol=1e-7, atol=1e-9)

    def test_complex_system(self):
        n = 24
        a = complex_diag_dominant(n)
        x_true = np.exp(1j * np.linspace(0, 3, n))
        b = a @ x_true
        sol = gmres(jnp.asarray(a), jnp.asarray(b), config=KrylovConfig(tolerance=1e-12, restart=24))
        assert bool(sol.converged)
        np.testing.assert_allclose(np.asarray(sol.x), x_true, rtol=1e-7, atol=1e-9)

    def test_restart_cycles(self):
        n = 60
        a = spd_matrix(n, seed=5)
        b = np.ones(n)
        sol = gmres(jnp.asarray(a), jnp.asarray(b), config=KrylovConfig(tolerance=1e-10, restart=8, max_iterations=600))
        assert bool(sol.converged)
        np.testing.assert_allclose(np.asarray(a @ np.asarray(sol.x)), b, atol=1e-6)

    def test_with_guess(self):
        from mathaudio_tpu.solvers.krylov import gmres_with_guess

        n = 20
        a = spd_matrix(n, seed=9)
        x_true = np.ones(n)
        b = a @ x_true
        x0 = jnp.asarray(x_true + 1e-3 * np.random.default_rng(0).standard_normal(n))
        sol = gmres_with_guess(jnp.asarray(a), jnp.asarray(b), x0, config=KrylovConfig(tolerance=1e-12))
        assert bool(sol.converged)
        assert int(sol.iterations) < 20  # full Krylov would need n = 20
        np.testing.assert_allclose(np.asarray(sol.x), x_true, rtol=1e-8)

    def test_already_converged(self):
        n = 10
        a = np.eye(n)
        sol = gmres(jnp.asarray(a), jnp.zeros(n))
        assert bool(sol.converged)
        assert int(sol.iterations) == 0

    def test_vmap_over_batch(self):
        # Batched frequency-sweep pattern: one sparsity, many value sets.
        n = 16
        base = spd_matrix(n, seed=11)
        shifts = np.array([0.5, 1.0, 2.0, 4.0])
        a_batch = jnp.asarray(base[None] + shifts[:, None, None] * np.eye(n)[None])
        b = jnp.ones((len(shifts), n))
        f = jax.vmap(lambda a, b: gmres(a, b, config=KrylovConfig(tolerance=1e-10)).x)
        xs = f(a_batch, b)
        for i, s in enumerate(shifts):
            np.testing.assert_allclose(
                np.asarray((base + s * np.eye(n)) @ np.asarray(xs[i])), 1.0, atol=1e-6
            )

    def test_jit_compiles_once(self):
        n = 12
        a = jnp.asarray(spd_matrix(n))
        b = jnp.ones(n)
        jitted = jax.jit(lambda a, b: gmres(a, b, config=KrylovConfig(tolerance=1e-10)).x)
        x1 = jitted(a, b)
        x2 = jitted(a + 0.0, b)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2))


class TestBicgstabCgs:
    def test_bicgstab(self):
        n = 35
        rng = np.random.default_rng(13)
        a = rng.standard_normal((n, n)) + n * np.eye(n)
        b = rng.standard_normal(n)
        sol = bicgstab(jnp.asarray(a), jnp.asarray(b), config=KrylovConfig(tolerance=1e-11))
        assert bool(sol.converged)
        np.testing.assert_allclose(np.asarray(a @ np.asarray(sol.x)), b, atol=1e-7)

    def test_cgs(self):
        n = 30
        rng = np.random.default_rng(17)
        a = rng.standard_normal((n, n)) + n * np.eye(n)
        b = rng.standard_normal(n)
        sol = cgs(jnp.asarray(a), jnp.asarray(b), config=KrylovConfig(tolerance=1e-11))
        assert bool(sol.converged)
        np.testing.assert_allclose(np.asarray(a @ np.asarray(sol.x)), b, atol=1e-6)


class TestDirect:
    def test_lu_real(self):
        a = spd_matrix(15)
        b = np.ones(15)
        x = np.asarray(lu_solve(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(a @ x, b, atol=1e-10)

    def test_complex_embed_matches_native(self):
        a = complex_diag_dominant(12)
        b = np.exp(1j * np.arange(12.0))
        x_e = np.asarray(complex_solve(jnp.asarray(a), jnp.asarray(b), method="embed"))
        x_n = np.asarray(complex_solve(jnp.asarray(a), jnp.asarray(b), method="native"))
        np.testing.assert_allclose(x_e, x_n, rtol=1e-10)
        np.testing.assert_allclose(a @ x_e, b, atol=1e-10)

    def test_factorization_reuse(self):
        a = complex_diag_dominant(10)
        f = LuFactorization.factor(jnp.asarray(a), method="embed")
        for s in [1.0, 2.0]:
            b = s * np.ones(10, complex)
            x = np.asarray(f.solve(jnp.asarray(b)))
            np.testing.assert_allclose(a @ x, b, atol=1e-10)


class TestSparse:
    def test_from_triplets_sums_duplicates(self):
        rows = [0, 0, 1, 1, 0]
        cols = [0, 1, 0, 1, 0]
        vals = [1.0, 2.0, 3.0, 4.0, 10.0]
        m = CsrMatrix.from_triplets(rows, cols, vals, (2, 2))
        np.testing.assert_allclose(m.to_dense(), [[11.0, 2.0], [3.0, 4.0]])

    def test_ell_matvec_matches_dense(self):
        rng = np.random.default_rng(23)
        a = rng.standard_normal((20, 20))
        a[np.abs(a) < 1.0] = 0.0
        m = CsrMatrix.from_dense(a)
        x = rng.standard_normal(20)
        y_ell = np.asarray(m.to_ell().matvec(jnp.asarray(x)))
        np.testing.assert_allclose(y_ell, a @ x, atol=1e-12)

    def test_ell_structure_scatter(self):
        a = np.array([[2.0, 1.0, 0.0], [0.0, 3.0, 0.0], [1.0, 0.0, 4.0]])
        m = CsrMatrix.from_dense(a)
        idx, scatter = m.ell_structure()
        width = idx.shape[1]
        vals = np.zeros(3 * width)
        vals[scatter] = m.data
        vals = vals.reshape(3, width)
        from mathaudio_tpu.solvers.operators import EllOperator

        op = EllOperator(jnp.asarray(idx), jnp.asarray(vals), 3)
        x = np.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(np.asarray(op.matvec(jnp.asarray(x))), a @ x)

    def test_diagonal(self):
        a = np.diag([1.0, 2.0, 3.0]) + np.eye(3, k=1)
        m = CsrMatrix.from_dense(a)
        np.testing.assert_allclose(m.diagonal(), [1.0, 2.0, 3.0])


class TestPreconditioners:
    def _laplace_1d(self, n):
        a = np.zeros((n, n))
        for i in range(n):
            a[i, i] = 2.0
            if i > 0:
                a[i, i - 1] = -1.0
            if i < n - 1:
                a[i, i + 1] = -1.0
        return a

    def test_ilu_fixed_point_improves_convergence(self):
        n = 64
        a = self._laplace_1d(n)
        csr = CsrMatrix.from_dense(a)
        b = jnp.ones(n)
        cfg = KrylovConfig(tolerance=1e-10, restart=20, max_iterations=400)
        plain = gmres(jnp.asarray(a), b, config=cfg)
        ilu = IluFixedPoint.from_csr(csr, sweeps=8)
        pre = gmres(jnp.asarray(a), b, config=cfg, preconditioner=ilu)
        assert bool(pre.converged)
        assert int(pre.iterations) < int(plain.iterations)
        np.testing.assert_allclose(np.asarray(a @ np.asarray(pre.x)), np.ones(n), atol=1e-6)

    def test_ilu_exact_on_triangular_friendly(self):
        # For a diagonally dominant matrix, enough sweeps = exact ILU apply.
        rng = np.random.default_rng(29)
        a = rng.standard_normal((16, 16)) * 0.1 + 4 * np.eye(16)
        csr = CsrMatrix.from_dense(a)
        ilu = IluFixedPoint.from_csr(csr, sweeps=30)
        r = jnp.asarray(rng.standard_normal(16))
        z = np.asarray(ilu.matvec(r))
        # M z ~= r where M = L U from ILU(0); dense here so ILU(0) = LU.
        from mathaudio_tpu.solvers.preconditioners.ilu import ilu0_factor

        l_csr, u_csr = ilu0_factor(csr)
        l_dense = l_csr.to_dense() + np.eye(16)
        u_dense = u_csr.to_dense()
        np.testing.assert_allclose(l_dense @ (u_dense @ z), np.asarray(r), atol=1e-8)

    def test_schwarz(self):
        n = 48
        a = self._laplace_1d(n)
        csr = CsrMatrix.from_dense(a)
        pre = AdditiveSchwarz.from_csr(csr, num_subdomains=4, overlap=2)
        b = jnp.ones(n)
        cfg = KrylovConfig(tolerance=1e-10, restart=20, max_iterations=400)
        plain = gmres(jnp.asarray(a), b, config=cfg)
        sol = gmres(jnp.asarray(a), b, config=cfg, preconditioner=pre)
        assert bool(sol.converged)
        assert int(sol.iterations) <= int(plain.iterations)
        np.testing.assert_allclose(np.asarray(a @ np.asarray(sol.x)), np.ones(n), atol=1e-6)

    def test_block_jacobi_exact_for_block_diagonal(self):
        blocks = [spd_matrix(4, seed=s) for s in range(3)]
        a = np.zeros((12, 12))
        for i, bl in enumerate(blocks):
            a[4 * i : 4 * i + 4, 4 * i : 4 * i + 4] = bl
        csr = CsrMatrix.from_dense(a)
        pre = BlockJacobi.from_csr(csr, num_blocks=3)
        r = np.arange(1.0, 13.0)
        z = np.asarray(pre.matvec(jnp.asarray(r)))
        np.testing.assert_allclose(a @ z, r, atol=1e-9)


class TestColoredIlu:
    def test_exact_in_n_colors_sweeps(self):
        """IluColored (ilu_parallel.rs graph-coloring variant): colored
        permutation makes the fixed-point triangular sweeps EXACT —
        matches scipy's sequential substitution on the same factors."""
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        from mathaudio_tpu.fem.assembly import HelmholtzAssembler
        from mathaudio_tpu.fem.mesh import unit_cube_tetrahedra
        from mathaudio_tpu.solvers.preconditioners.ilu import IluColored, ilu0_factor

        m = unit_cube_tetrahedra(4)
        asm = HelmholtzAssembler(m)
        vals = np.asarray(asm.k_vals) - 4.0 * np.asarray(asm.m_vals)
        csr = CsrMatrix(
            np.asarray(asm.csr.indptr), np.asarray(asm.csr.indices), vals,
            (m.num_nodes,) * 2,
        )
        pc = IluColored.from_csr(csr)
        assert 2 <= pc.n_colors <= 64

        perm = np.asarray(pc.perm)
        a = sp.csr_matrix((csr.data, csr.indices, csr.indptr), shape=csr.shape)
        ap = a[perm][:, perm].tocsr()
        ap.sort_indices()
        csr_p = CsrMatrix(
            ap.indptr.astype(np.int64), ap.indices.astype(np.int64), ap.data, csr.shape
        )
        l_csr, u_csr = ilu0_factor(csr_p)
        l_full = sp.csr_matrix(
            (l_csr.data, l_csr.indices, l_csr.indptr), shape=csr.shape
        ) + sp.eye(csr.shape[0])
        u_full = sp.csr_matrix((u_csr.data, u_csr.indices, u_csr.indptr), shape=csr.shape)
        rng = np.random.default_rng(0)
        r = rng.standard_normal(m.num_nodes)
        z = spla.spsolve_triangular(l_full.tocsr(), r[perm], lower=True)
        x_exact = spla.spsolve_triangular(u_full.tocsr(), z, lower=False)
        x_pc = np.asarray(pc.matvec(jnp.asarray(r)))[perm]
        np.testing.assert_allclose(x_pc, x_exact, atol=1e-12)

    def test_coloring_is_proper(self):
        from mathaudio_tpu.fem.assembly import HelmholtzAssembler
        from mathaudio_tpu.fem.mesh import unit_square_triangles
        from mathaudio_tpu.solvers.preconditioners.ilu import greedy_coloring

        m = unit_square_triangles(6)
        asm = HelmholtzAssembler(m)
        csr = CsrMatrix(
            np.asarray(asm.csr.indptr), np.asarray(asm.csr.indices),
            np.asarray(asm.k_vals), (m.num_nodes,) * 2,
        )
        colors = greedy_coloring(csr)
        rows = np.repeat(np.arange(m.num_nodes), np.diff(csr.indptr))
        off = rows != csr.indices
        assert (colors[rows[off]] != colors[csr.indices[off]]).all()


class TestQmrCgstab:
    def test_matches_direct_on_complex_system(self):
        """QMR-CGSTAB (types.rs:588 SolverMethod::QmrCgstab): converges
        on a complex diagonally-dominant system to the direct solution."""
        from mathaudio_tpu.solvers import KrylovConfig, qmrcgstab

        rng = np.random.default_rng(0)
        n = 150
        a = np.eye(n) * 4 + 0.1 * rng.standard_normal((n, n)) \
            + 0.05j * rng.standard_normal((n, n))
        b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        sol = qmrcgstab(jnp.asarray(a), jnp.asarray(b),
                        config=KrylovConfig(tolerance=1e-10, max_iterations=400))
        assert bool(sol.converged)
        np.testing.assert_allclose(np.asarray(sol.x), np.linalg.solve(a, b),
                                   atol=1e-8)

    def test_bem_solver_matrix(self):
        """Every SolverMethod row solves the sphere problem to the same
        answer (the reference's solver matrix in qa_suite)."""
        from mathaudio_tpu.bem import BemProblem, BemSolver, BemSolverConfig
        from mathaudio_tpu.bem.types import SolverMethod

        prob = BemProblem.rigid_sphere(1.0, subdivisions=2)
        ref = BemSolver(BemSolverConfig(method=SolverMethod.LU)).solve(prob)
        for m in (SolverMethod.GMRES, SolverMethod.BICGSTAB,
                  SolverMethod.CGS, SolverMethod.QMRCGSTAB):
            sol = BemSolver(BemSolverConfig(method=m, tolerance=1e-10)).solve(prob)
            assert sol.info["converged"], m
            np.testing.assert_allclose(
                np.asarray(sol.surface_pressure),
                np.asarray(ref.surface_pressure), atol=1e-7, err_msg=str(m))


class TestGmresEdgeCases:
    def test_max_iterations_zero_returns_guess(self):
        """Iteration budget 0: x0 returned untouched, convergence state
        reported from the initial residual (regression: the unrolled
        first cycle used to run unconditionally)."""
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.standard_normal((12, 12)) + 12 * np.eye(12))
        b = jnp.asarray(rng.standard_normal(12))
        x0 = jnp.asarray(rng.standard_normal(12))
        sol = gmres(DenseOperator(a), b, x0=x0,
                    config=KrylovConfig(max_iterations=0, tolerance=1e-10))
        assert int(sol.iterations) == 0
        assert not bool(sol.converged)
        np.testing.assert_allclose(np.asarray(sol.x), np.asarray(x0))

    def test_converged_guess_zero_iterations(self):
        """An x0 that already satisfies the tolerance must not be
        modified and must report iterations == 0."""
        rng = np.random.default_rng(4)
        a = jnp.asarray(rng.standard_normal((12, 12)) + 12 * np.eye(12))
        x_true = jnp.asarray(rng.standard_normal(12))
        b = a @ x_true
        sol = gmres(DenseOperator(a), b, x0=x_true,
                    config=KrylovConfig(max_iterations=50, tolerance=1e-6))
        assert bool(sol.converged)
        assert int(sol.iterations) == 0
        np.testing.assert_allclose(np.asarray(sol.x), np.asarray(x_true), rtol=1e-12)

    def test_zero_rhs(self):
        a = jnp.asarray(np.eye(8) * 2.0)
        sol = gmres(DenseOperator(a), jnp.zeros(8),
                    config=KrylovConfig(max_iterations=10, tolerance=1e-8))
        assert bool(sol.converged)
        np.testing.assert_allclose(np.asarray(sol.x), 0.0)
