"""Differential evolution + test-function suite.

Mirrors math-differential-evolution tests (mod.rs:19-36 sphere < 1e-6,
strategy matrix, constraints) and math-test-functions metadata-driven
minimum checks (functions/sphere.rs:16-30 pattern).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mathaudio_tpu.optim import (
    DEConfig,
    DEConfigBuilder,
    Strategy,
    Mutation,
    Init,
    LinearConstraintHelper,
    CallbackAction,
    differential_evolution,
    run_recorded_differential_evolution,
)
from mathaudio_tpu.testfunctions import FUNCTIONS, get_function, get_function_metadata, list_functions
from mathaudio_tpu.testfunctions import functions as F


class TestRegistry:
    def test_has_reference_scale(self):
        # reference ships ~100 functions (SURVEY.md §2.8)
        assert len(list_functions()) >= 95

    def test_minima_values(self):
        """f(x*) == f* for every registered global minimum (the reference's
        metadata-driven test pattern)."""
        bad = []
        for name in list_functions():
            fn, meta = FUNCTIONS[name]
            for x_star, f_star in meta.global_minima:
                if np.isnan(f_star):
                    continue
                val = float(fn(jnp.asarray(x_star, jnp.float64)))
                tol = max(1e-4, 2e-4 * abs(f_star))
                if not (abs(val - f_star) < tol):
                    bad.append((name, val, f_star))
        assert not bad, bad

    def test_minima_are_minimal_locally(self):
        """Random in-bounds points should not beat the registered optimum."""
        rng = np.random.default_rng(0)
        bad = []
        for name in ["sphere", "rastrigin", "ackley", "rosenbrock", "griewank",
                     "levy", "branin", "goldstein_price", "himmelblau", "easom"]:
            fn, meta = FUNCTIONS[name]
            x_star, f_star = meta.global_minima[0]
            lo = np.array([b[0] for b in meta.bounds])
            hi = np.array([b[1] for b in meta.bounds])
            pts = lo + rng.random((64, len(lo))) * (hi - lo)
            vals = [float(fn(jnp.asarray(p))) for p in pts]
            if min(vals) < f_star - 1e-9:
                bad.append((name, min(vals), f_star))
        assert not bad, bad


class TestDE:
    def test_sphere_baseline_anchor(self):
        # BASELINE.md: DE on sphere -> fun < 1e-6 (100 iters, seed 42)
        report = differential_evolution(
            F.sphere,
            [(-5.0, 5.0)] * 2,
            maxiter=100,
            seed=42,
            tol=0.0,
        )
        assert report.fun < 1e-6, report.fun
        assert report.nfev > 0

    def test_rosenbrock(self):
        report = differential_evolution(
            F.rosenbrock, [(-5.0, 5.0)] * 3, maxiter=600, seed=1, tol=1e-12,
            popsize=20,
        )
        np.testing.assert_allclose(report.x, 1.0, atol=1e-3)

    def test_rastrigin_multimodal(self):
        report = differential_evolution(
            F.rastrigin, [(-5.12, 5.12)] * 2, maxiter=300, seed=3, tol=0.0,
            mutation=Mutation.range_of(0.5, 1.0), recombination=0.9,
        )
        assert report.fun < 1e-4, report.fun

    def test_strategies_matrix(self):
        for strat in ["best1bin", "rand1bin", "rand2bin", "best2bin",
                      "currenttobest1bin", "randtobest1bin", "best1exp",
                      "rand1exp", "adaptivebin"]:
            report = differential_evolution(
                F.sphere, [(-5.0, 5.0)] * 2, maxiter=150, seed=7,
                strategy=strat, tol=0.0,
            )
            assert report.fun < 1e-4, (strat, report.fun)

    def test_jit_loop_matches_host_loop(self):
        r1 = differential_evolution(
            F.sphere, [(-5.0, 5.0)] * 2, maxiter=80, seed=11, tol=1e-10
        )
        r2 = differential_evolution(
            F.sphere, [(-5.0, 5.0)] * 2, maxiter=80, seed=11, tol=1e-10, jit_loop=True
        )
        assert r2.fun < 1e-5
        np.testing.assert_allclose(r1.fun, r2.fun, rtol=1e-6, atol=1e-12)

    def test_linear_constraint(self):
        # minimize sphere s.t. x0 + x1 >= 1 -> optimum (0.5, 0.5)
        cfg = DEConfig(maxiter=400, seed=5, tol=0.0, popsize=25)
        LinearConstraintHelper(
            a=np.array([[1.0, 1.0]]), lb=np.array([1.0]), ub=np.array([np.inf])
        ).apply_to(cfg, weight=1e8)
        report = differential_evolution(F.sphere, [(-2.0, 2.0)] * 2, config=cfg)
        np.testing.assert_allclose(report.x, [0.5, 0.5], atol=5e-3)

    def test_rosenbrock_disk_penalty(self):
        cfg = DEConfig(maxiter=500, seed=9, tol=0.0, popsize=25)
        cfg.penalty_ineq.append((F.rosenbrock_disk_constraint, 1e8))
        report = differential_evolution(F.rosenbrock_objective, [(-1.5, 1.5)] * 2, config=cfg)
        np.testing.assert_allclose(report.x, [1.0, 1.0], atol=1e-2)

    def test_fixed_variables(self):
        report = differential_evolution(
            F.sphere, [(-5.0, 5.0), (2.0, 2.0), (-5.0, 5.0)], maxiter=150, seed=2, tol=0.0
        )
        assert abs(report.x[1] - 2.0) < 1e-15
        assert report.fun < 4.0 + 1e-4

    def test_integrality(self):
        report = differential_evolution(
            lambda x: jnp.sum((x - 2.4) ** 2),
            [(-5.0, 5.0)] * 2,
            maxiter=150,
            seed=4,
            tol=0.0,
            integrality=[True, False],
        )
        assert abs(report.x[0] - round(report.x[0])) < 1e-12
        assert abs(report.x[0] - 2.0) < 1e-9
        assert abs(report.x[1] - 2.4) < 1e-4

    def test_x0_injection(self):
        report = differential_evolution(
            F.sphere, [(-5.0, 5.0)] * 2, maxiter=5, seed=6, tol=0.0,
            x0=[1e-8, -1e-8],
        )
        assert report.fun < 1e-10

    def test_callback_stop(self):
        calls = []

        def cb(inter):
            calls.append(inter.iter)
            return CallbackAction.STOP if inter.iter >= 3 else CallbackAction.CONTINUE

        report = differential_evolution(
            F.sphere, [(-5.0, 5.0)] * 2, maxiter=100, seed=8, callback=cb, tol=0.0
        )
        assert report.nit == 3
        assert "callback" in report.message

    def test_polish(self):
        from mathaudio_tpu.optim.de import PolishConfig

        report = differential_evolution(
            F.rosenbrock, [(-2.0, 2.0)] * 2, maxiter=60, seed=10, tol=0.0,
            polish=PolishConfig(enabled=True),
        )
        assert report.fun < 1e-6

    def test_builder(self):
        cfg = (
            DEConfigBuilder()
            .maxiter(50)
            .popsize(10)
            .strategy(Strategy.RAND1BIN)
            .seed(42)
            .build()
        )
        assert cfg.maxiter == 50 and cfg.strategy == Strategy.RAND1BIN

    def test_recorder(self, tmp_path):
        csv = str(tmp_path / "trace.csv")
        report, rows = run_recorded_differential_evolution(
            F.sphere, [(-5.0, 5.0)] * 2, csv, maxiter=20, seed=1, tol=0.0
        )
        assert len(rows) == report.nit
        # best_so_far is non-increasing
        bests = [r.best_so_far for r in rows]
        assert all(b2 <= b1 + 1e-15 for b1, b2 in zip(bests, bests[1:]))
        with open(csv) as fh:
            lines = fh.read().strip().split("\n")
        assert len(lines) == len(rows) + 1
        assert lines[0].startswith("eval_id,generation,x0,x1,f")

    def test_wls_local_search(self):
        from mathaudio_tpu.optim.de import AdaptiveConfig

        cfg = DEConfig(maxiter=150, seed=12, tol=0.0,
                       adaptive=AdaptiveConfig(wls_enabled=True, wls_prob=0.5,
                                               wls_scale=0.05))
        report = differential_evolution(F.rosenbrock, [(-2.0, 2.0)] * 2, config=cfg)
        assert report.fun < 1e-3, report.fun


class TestDEParity:
    """Reference DE behaviors not covered above (mod.rs/de_tests.rs:
    seeded determinism, LHS init properties, popsize floor, 1-D
    problems, strategy parsing, adaptive convergence)."""

    def test_deterministic_with_seed(self):
        bounds = [(-5.0, 5.0)] * 3
        r1 = differential_evolution(F.rosenbrock, bounds, seed=7, maxiter=60)
        r2 = differential_evolution(F.rosenbrock, bounds, seed=7, maxiter=60)
        np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))
        assert r1.fun == r2.fun and r1.nfev == r2.nfev

    def test_latin_hypercube_stratified_in_bounds(self):
        """One sample per 1/npop stratum in every dimension
        (init_latin_hypercube.rs)."""
        import jax

        from mathaudio_tpu.optim.de import _latin_hypercube

        npop, n = 16, 4
        lb = jnp.asarray([-2.0, 0.0, 1.0, -1.0])
        ub = jnp.asarray([2.0, 10.0, 3.0, 0.0])
        pop = np.asarray(_latin_hypercube(jax.random.PRNGKey(0), npop, n, lb, ub))
        assert pop.shape == (npop, n)
        assert (pop >= np.asarray(lb)).all() and (pop <= np.asarray(ub)).all()
        unit = (pop - np.asarray(lb)) / (np.asarray(ub) - np.asarray(lb))
        for j in range(n):
            strata = np.floor(unit[:, j] * npop).astype(int)
            assert sorted(strata.tolist()) == list(range(npop))

    def test_single_dimension(self):
        r = differential_evolution(
            lambda x: (x[0] - 1.5) ** 2, [(-4.0, 4.0)], seed=3, maxiter=150
        )
        assert abs(float(r.x[0]) - 1.5) < 1e-3

    def test_strategy_parse_variants(self):
        from mathaudio_tpu.optim.de import Strategy

        assert Strategy.from_str("best1bin") is Strategy.BEST1BIN
        assert Strategy.from_str("Best1Bin") is Strategy.BEST1BIN
        assert Strategy.from_str("rand_1_exp") is Strategy.RAND1EXP
        assert Strategy.from_str("best1") is Strategy.BEST1BIN
        assert Strategy.from_str("adaptive") is Strategy.ADAPTIVEBIN
        with pytest.raises(ValueError):
            Strategy.from_str("nope9bin")

    def test_adaptive_strategy_converges(self):
        """JADE-style adaptive mutation solves Rastrigin 2-D
        (test_adaptive_basic)."""
        r = differential_evolution(
            F.rastrigin,
            [(-5.12, 5.12)] * 2,
            strategy="adaptive",
            seed=11,
            maxiter=300,
            popsize=20,
        )
        assert float(r.fun) < 1e-3
        np.testing.assert_allclose(np.asarray(r.x), 0.0, atol=0.05)

    def test_string_strategy_in_config(self):
        r = differential_evolution(
            F.sphere, [(-1.0, 1.0)] * 2, strategy="rand1bin", seed=1, maxiter=80
        )
        assert float(r.fun) < 1e-6
