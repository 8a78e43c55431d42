"""Metadata-driven checks of the optimizer benchmark registry.

Mirrors the reference's per-function test pattern
(math-test-functions/src/functions/sphere.rs:16-30 and siblings): every
function is evaluated at its declared global minima and must reproduce
the registered value; minima must lie inside the declared bounds; small
in-bounds perturbations must not fall below the minimum; constrained
optima must satisfy their companion constraints; and every function must
jit and vmap (the property the DE optimizer relies on,
parallel_eval.rs:6-32 -> vmapped population evaluation).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mathaudio_tpu.testfunctions import FUNCTIONS

# Functions whose registered minima are literature values rounded to
# 4-6 significant digits; everything else must match to 1e-9 relative.
_ROUNDED = {
    "alpine_n2",
    "michalewicz",
    "mccormick",
    "six_hump_camel",
    "schwefel",
    "shekel",
    "cross_in_tray",
    "keanes_bump_objective",
    "hartman_3d",
    "hartman_4d",
    "hartman_6d",
    "schaffer_n4",
    "holder_table",
    "langermann",
    "eggholder",
    "styblinski_tang2",
    "forrester_2008",
    "shubert",
    "bird",
    "dejong_f5_foxholes",
    "mishras_bird_objective",
    "ackley_n3",
    "branin",
    "gramacy_lee_2012",
    "gramacy_lee_function",
    "goldstein_price",
    "drop_wave",
    "easom",
    "himmelblau",
    "vincent",
    "whitley",
    "qing",
}

_NAMES = sorted(FUNCTIONS)


def _finite_minima(name):
    fn, meta = FUNCTIONS[name]
    return [(x, f) for x, f in meta.global_minima if not math.isnan(f)]


@pytest.mark.parametrize("name", _NAMES)
def test_minimum_value(name):
    fn, meta = FUNCTIONS[name]
    minima = _finite_minima(name)
    if not minima:
        pytest.skip("no finite registered minimum")
    rel_tol = 2.5e-4 if name in _ROUNDED else 1e-9
    for xstar, fstar in minima:
        val = float(fn(jnp.asarray(xstar, dtype=jnp.float64)))
        rel = abs(val - fstar) / max(1.0, abs(fstar))
        assert rel < rel_tol, f"{name}: f(x*)={val!r} vs registered {fstar!r} (rel {rel:.3g})"


@pytest.mark.parametrize("name", _NAMES)
def test_minimum_inside_bounds(name):
    fn, meta = FUNCTIONS[name]
    minima = _finite_minima(name)
    if not minima:
        pytest.skip("no finite registered minimum")
    lo = np.array([b[0] for b in meta.bounds])
    hi = np.array([b[1] for b in meta.bounds])
    for xstar, _ in minima:
        x = np.asarray(xstar)
        if x.size != lo.size:
            # dims-specific minimum (e.g. powell dims=[4] with 4 bounds)
            assert x.size in meta.dimensions or not meta.dimensions
            continue
        assert np.all(x >= lo - 1e-12) and np.all(x <= hi + 1e-12), name


@pytest.mark.parametrize("name", _NAMES)
def test_local_minimality(name):
    """f does not drop below the registered optimum in a small ball.

    Slack covers registered x*/f* rounded to ~1e-4 (the same tolerance
    class the reference's metadata checks accept).
    """
    fn, meta = FUNCTIONS[name]
    minima = _finite_minima(name)
    if not minima:
        pytest.skip("no finite registered minimum")
    rng = np.random.default_rng(0)
    for xstar, fstar in minima:
        x = np.asarray(xstar, dtype=np.float64)
        lo = np.array([b[0] for b in meta.bounds[: x.size]] or [-1.0])
        hi = np.array([b[1] for b in meta.bounds[: x.size]] or [1.0])
        if lo.size != x.size:
            lo = np.full(x.size, lo[0])
            hi = np.full(x.size, hi[0])
        scale = 1e-3 * (hi - lo)
        pts = x + rng.uniform(-1.0, 1.0, size=(64, x.size)) * scale
        pts = np.clip(pts, lo, hi)
        if meta.inequality_constraints:
            # Constrained optima sit on the g(x)=0 boundary; only
            # feasible neighbors may not undercut the optimum.
            feas = np.array(
                [
                    all(float(g(jnp.asarray(p))) <= 0.0 for g in meta.inequality_constraints)
                    for p in pts
                ]
            )
            pts = pts[feas]
            if pts.size == 0:
                continue
        vals = np.array([float(fn(jnp.asarray(p))) for p in pts])
        slack = 1e-3 * max(1.0, abs(fstar))
        assert vals.min() >= fstar - slack, (
            f"{name}: found {vals.min()!r} below registered minimum {fstar!r}"
        )


@pytest.mark.parametrize("name", _NAMES)
def test_jit_and_vmap(name):
    """Every registry entry is jit-able and vmaps over a population batch
    (the contract the DE evaluator depends on)."""
    fn, meta = FUNCTIONS[name]
    n = len(meta.bounds) if meta.bounds else 2
    rng = np.random.default_rng(1)
    lo = np.array([b[0] for b in meta.bounds] or [-1.0] * n)
    hi = np.array([b[1] for b in meta.bounds] or [1.0] * n)
    batch = rng.uniform(lo, hi, size=(8, n))
    vals = jax.jit(jax.vmap(fn))(jnp.asarray(batch))
    assert vals.shape == (8,)
    assert bool(jnp.all(jnp.isfinite(vals))), f"{name}: non-finite on in-bounds batch"


def test_constrained_optima_feasible():
    """Registered optima of constrained problems satisfy g(x*) <= 0
    (binh_korn / keanes_bump / mishras_bird / rosenbrock_disk families,
    math-test-functions constrained set)."""
    checked = 0
    for name in _NAMES:
        fn, meta = FUNCTIONS[name]
        if not meta.inequality_constraints:
            continue
        for xstar, fstar in meta.global_minima:
            if any(math.isnan(v) for v in xstar):
                continue
            x = jnp.asarray(xstar, dtype=jnp.float64)
            for g in meta.inequality_constraints:
                assert float(g(x)) <= 1e-6, f"{name}: optimum infeasible"
                checked += 1
    assert checked >= 4


def test_registry_size_and_shape():
    """Registry covers the reference's ~100-function suite and every
    entry carries usable bounds."""
    assert len(FUNCTIONS) >= 100
    for name, (fn, meta) in FUNCTIONS.items():
        assert callable(fn)
        assert meta.name == name
        assert all(lo < hi for lo, hi in meta.bounds), name
