"""Algebraic multigrid (math-solvers amg.rs test patterns): Poisson
solve by V-cycles, preconditioned GMRES iteration reduction, hierarchy
diagnostics, presets."""

import jax.numpy as jnp
import numpy as np

from mathaudio_tpu.solvers import AmgConfig, AmgPreconditioner, KrylovConfig, gmres
from mathaudio_tpu.solvers.sparse import CsrMatrix


def _poisson_2d(n):
    """5-point Laplacian on an n x n grid."""
    import scipy.sparse as sp

    main = 4.0 * np.ones(n * n)
    side = -np.ones(n * n - 1)
    side[np.arange(1, n * n) % n == 0] = 0
    updown = -np.ones(n * n - n)
    a = sp.diags([main, side, side, updown, updown], [0, -1, 1, -n, n]).tocsr()
    return a


class TestAmg:
    def test_hierarchy_diagnostics(self):
        a = _poisson_2d(24)
        amg = AmgPreconditioner(a, AmgConfig.for_fem())
        assert len(amg.level_sizes) >= 2
        assert amg.level_sizes[-1] <= 64 or len(amg.level_sizes) == 10
        assert 1.0 < amg.grid_complexity < 3.0
        assert amg.operator_complexity < 5.0

    def test_standalone_solve(self):
        a = _poisson_2d(16)
        amg = AmgPreconditioner(a)
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.standard_normal(a.shape[0]))
        x, cycles = amg.solve(b, tol=1e-8, max_cycles=100)
        r = b - jnp.asarray(a @ np.asarray(x).real)
        assert float(jnp.linalg.norm(r)) < 1e-7 * float(jnp.linalg.norm(b))
        assert int(cycles) < 60

    def test_gmres_preconditioning(self):
        a = _poisson_2d(24)
        n = a.shape[0]
        b = jnp.ones(n)
        a_dense = jnp.asarray(a.todense())
        cfg = KrylovConfig(max_iterations=600, tolerance=1e-8, restart=30)
        plain = gmres(a_dense, b, config=cfg)
        amg = AmgPreconditioner(a)
        pre = gmres(a_dense, b, config=cfg, preconditioner=amg)
        assert bool(pre.converged)
        assert int(pre.iterations) < int(plain.iterations) / 2
        np.testing.assert_allclose(
            np.asarray(a @ np.asarray(pre.x)), 1.0, atol=1e-5
        )

    def test_presets(self):
        for cfg in [AmgConfig.for_fem(), AmgConfig.for_bem(), AmgConfig.for_parallel(),
                    AmgConfig.for_difficult_problems()]:
            assert cfg.strength_threshold > 0

    def test_from_csr_matrix(self):
        a = _poisson_2d(10)
        csr = CsrMatrix(a.indptr, a.indices, a.data, a.shape)
        amg = AmgPreconditioner(csr)
        z = amg.matvec(jnp.ones(a.shape[0]))
        assert np.isfinite(np.asarray(z)).all()
