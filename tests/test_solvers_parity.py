"""Solver-layer parity tests mirroring reference in-crate checks not yet
covered elsewhere: blas_helpers.rs (inner products, norms, axpy/axpby),
direct/lu.rs (identity, complex, singular), identity-operator Krylov
behavior (gmres.rs/cg.rs test_*_identity), CSR roundtrips (sparse/csr.rs)
and the Schwarz overlap effect (schwarz.rs test_schwarz_overlap_effect)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mathaudio_tpu.solvers.blas import axpby, axpy, inner_product, vector_norm
from mathaudio_tpu.solvers.direct import LuFactorization, complex_solve, lu_solve
from mathaudio_tpu.solvers.krylov import KrylovConfig, cg, gmres
from mathaudio_tpu.solvers.preconditioners.schwarz import AdditiveSchwarz
from mathaudio_tpu.solvers.sparse import CsrMatrix


class TestBlasHelpers:
    def test_inner_product_real(self):
        x = jnp.asarray([1.0, 2.0, 3.0])
        y = jnp.asarray([4.0, 5.0, 6.0])
        assert abs(float(inner_product(x, y)) - 32.0) < 1e-12

    def test_inner_product_complex_conjugate_linear(self):
        """<x, y> conjugates the FIRST argument (zdotc convention,
        blas_helpers.rs)."""
        x = jnp.asarray([1.0 + 2.0j, 0.5 - 1.0j])
        y = jnp.asarray([2.0 - 1.0j, 1.0 + 3.0j])
        got = complex(inner_product(x, y))
        expect = np.vdot(np.asarray(x), np.asarray(y))
        assert abs(got - expect) < 1e-12
        # <x, x> is real and positive
        self_ip = complex(inner_product(x, x))
        assert abs(self_ip.imag) < 1e-14 and self_ip.real > 0

    def test_vector_norm_real_complex_zero(self):
        assert abs(float(vector_norm(jnp.asarray([3.0, 4.0]))) - 5.0) < 1e-12
        z = jnp.asarray([3.0j, 4.0])
        assert abs(float(vector_norm(z)) - 5.0) < 1e-12
        assert float(vector_norm(jnp.zeros(4))) == 0.0

    def test_axpy_axpby(self):
        x = jnp.asarray([1.0, 2.0])
        y = jnp.asarray([10.0, 20.0])
        np.testing.assert_allclose(np.asarray(axpy(2.0, x, y)), [12.0, 24.0])
        np.testing.assert_allclose(np.asarray(axpby(2.0, x, 3.0, y)), [32.0, 64.0])


class TestLu:
    def test_lu_identity(self):
        b = jnp.asarray([1.0, 2.0, 3.0])
        x = lu_solve(jnp.eye(3), b)
        np.testing.assert_allclose(np.asarray(x), np.asarray(b), atol=1e-12)

    def test_lu_complex(self):
        rng = np.random.default_rng(5)
        a = rng.standard_normal((6, 6)) + 1j * rng.standard_normal((6, 6))
        xe = rng.standard_normal(6) + 1j * rng.standard_normal(6)
        x = complex_solve(jnp.asarray(a), jnp.asarray(a @ xe))
        np.testing.assert_allclose(np.asarray(x), xe, rtol=1e-9)

    def test_lu_singular_produces_nonfinite(self):
        """A singular matrix cannot silently produce a finite 'solution'
        (direct/lu.rs test_lu_singular returns an error; the jit-able
        equivalent signals through non-finite values)."""
        a = jnp.asarray([[1.0, 2.0], [2.0, 4.0]])
        x = lu_solve(a, jnp.asarray([1.0, 1.0]))
        assert not bool(jnp.all(jnp.isfinite(x)))

    def test_lu_factorization_reuse_many_rhs(self):
        rng = np.random.default_rng(6)
        a = rng.standard_normal((8, 8)) + 8 * np.eye(8)
        f = LuFactorization.factor(jnp.asarray(a))
        for _ in range(3):
            b = rng.standard_normal(8)
            x = f.solve(jnp.asarray(b))
            np.testing.assert_allclose(np.asarray(a @ np.asarray(x)), b, rtol=1e-9)


class TestKrylovIdentity:
    def test_gmres_identity_converges_immediately(self):
        b = jnp.asarray(np.random.default_rng(7).standard_normal(16))
        sol = gmres(lambda v: v, b, config=KrylovConfig(max_iterations=10, tolerance=1e-12))
        assert bool(sol.converged)
        np.testing.assert_allclose(np.asarray(sol.x), np.asarray(b), atol=1e-10)
        assert int(sol.iterations) <= 1

    def test_cg_identity(self):
        b = jnp.asarray(np.random.default_rng(8).standard_normal(16))
        sol = cg(lambda v: v, b, config=KrylovConfig(max_iterations=10, tolerance=1e-12))
        assert bool(sol.converged)
        np.testing.assert_allclose(np.asarray(sol.x), np.asarray(b), atol=1e-10)


class TestCsrRoundtrips:
    def test_to_dense_roundtrip(self):
        rng = np.random.default_rng(9)
        dense = rng.standard_normal((7, 7)) * (rng.random((7, 7)) < 0.4)
        csr = CsrMatrix.from_dense(dense)
        np.testing.assert_allclose(csr.to_dense(), dense, atol=0.0)

    def test_identity_matvec(self):
        csr = CsrMatrix.from_dense(np.eye(5))
        x = jnp.asarray(np.arange(5.0))
        ell = csr.to_ell().operator()
        np.testing.assert_allclose(np.asarray(ell.matvec(x)), np.arange(5.0), atol=1e-14)

    def test_diagonal_extraction(self):
        dense = np.diag([1.0, 2.0, 3.0]) + np.triu(np.ones((3, 3)), 1)
        csr = CsrMatrix.from_dense(dense)
        np.testing.assert_allclose(csr.diagonal(), [1.0, 2.0, 3.0], atol=0.0)


class TestSchwarzOverlap:
    def _poisson_1d(self, n):
        d = 2.0 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
        return CsrMatrix.from_dense(d)

    def test_overlap_improves_preconditioner(self):
        """More overlap -> fewer GMRES iterations on 1D Poisson
        (schwarz.rs test_schwarz_overlap_effect)."""
        n = 96
        csr = self._poisson_1d(n)
        rng = np.random.default_rng(10)
        b = jnp.asarray(rng.standard_normal(n))
        ell = csr.to_ell().operator()
        iters = []
        for overlap in (0, 4):
            pre = AdditiveSchwarz.from_csr(csr, num_subdomains=8, overlap=overlap)
            sol = gmres(
                ell.matvec,
                b,
                config=KrylovConfig(max_iterations=200, tolerance=1e-10, restart=40),
                preconditioner=pre.matvec,
            )
            assert bool(sol.converged)
            iters.append(int(sol.iterations))
        assert iters[1] < iters[0], iters

    def test_schwarz_exactness_single_domain(self):
        """One subdomain covering everything = a direct solve."""
        n = 24
        csr = self._poisson_1d(n)
        pre = AdditiveSchwarz.from_csr(csr, num_subdomains=1, overlap=0)
        rng = np.random.default_rng(11)
        b = rng.standard_normal(n)
        x = np.asarray(pre.matvec(jnp.asarray(b)))
        np.testing.assert_allclose(csr.to_dense() @ x, b, rtol=1e-8)
