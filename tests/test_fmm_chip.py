"""Planes-split FMM execution path (bem/fmm_chip.py): the re/im-plane
shipping that puts SLFMM/MLFMM on TPU transports without complex
serialization. On CPU these tests assert the path is *exactly* the
complex path at f64 planes, and within the f32 gate when downcast
(VERDICT r2 item 1: matvec rel err < 1e-3 vs the CPU f64 build)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mathaudio_tpu.bem import plane_wave
from mathaudio_tpu.bem.fmm import (
    ClusterBlockPreconditioner,
    build_mlfmm_tree_system,
    build_slfmm_system,
)
from mathaudio_tpu.bem.fmm_chip import (
    Planes,
    fmm_chip_matvec_fn,
    fmm_chip_solve_fn,
    join_planes,
    split_planes,
)
from mathaudio_tpu.bem.mesh import icosphere
from mathaudio_tpu.solvers import KrylovConfig, gmres

K = 2.0


@pytest.fixture(scope="module")
def surf():
    return icosphere(1.0, 2)  # 320 elements


@pytest.fixture(scope="module")
def slfmm_op(surf):
    return build_slfmm_system(surf, K)


def test_split_join_roundtrip(slfmm_op):
    planes = split_planes(slfmm_op, dtype=None)  # keep f64
    op2 = join_planes(planes)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(slfmm_op.n)
        + 1j * np.random.default_rng(1).standard_normal(slfmm_op.n)
    )
    np.testing.assert_allclose(
        np.asarray(op2.matvec(x)), np.asarray(slfmm_op.matvec(x)), rtol=0, atol=0
    )
    # complex leaves became Planes of reals; no complex leaf survives
    leaves = jax.tree_util.tree_leaves(planes)
    assert not any(np.iscomplexobj(np.asarray(l)) for l in leaves)


def test_chip_matvec_f32_gate(surf):
    """f32 planes matvec within 1e-3 of the f64 complex matvec (the
    VERDICT item-1 'done' gate). Needs the f32 stability screen
    (stability_tau ~ 1e4): without it the translation tensor spans 12
    decades that cancel in the quadrature — measured rel err 12 (!) in
    f32 at tau=inf vs 3.5e-6 at tau=1e4 on this mesh."""
    op = build_slfmm_system(surf, K, stability_tau=1e4)
    planes32 = split_planes(op, dtype=np.float32)
    mv = jax.jit(fmm_chip_matvec_fn())
    rng = np.random.default_rng(2)
    xr = rng.standard_normal(op.n).astype(np.float32)
    xi = rng.standard_normal(op.n).astype(np.float32)
    yr, yi = mv(planes32, jnp.asarray(xr), jnp.asarray(xi))
    y_ref = np.asarray(op.matvec(jnp.asarray(xr + 1j * xi)))
    rel = np.linalg.norm((np.asarray(yr) + 1j * np.asarray(yi)) - y_ref) / np.linalg.norm(y_ref)
    assert rel < 1e-3, rel


def test_stability_screen_accuracy_vs_dense(surf):
    """The screened (tau=1e4) f64 operator stays within 2x of the
    unscreened one against the dense collocation matrix (the screen
    trades only the accuracy margin, never correctness)."""
    from mathaudio_tpu.bem.assembly import assemble_collocation_matrix

    a_dense = np.asarray(assemble_collocation_matrix(surf, K))
    rng = np.random.default_rng(4)
    x = rng.standard_normal(surf.num_elements) + 1j * rng.standard_normal(
        surf.num_elements
    )
    y_ref = a_dense @ x
    rels = {}
    for tau in (1e8, 1e4):
        op = build_slfmm_system(surf, K, stability_tau=tau)
        y = np.asarray(op.matvec(jnp.asarray(x)))
        rels[tau] = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert rels[1e4] < 1e-2, rels
    assert rels[1e4] < 4 * rels[1e8] + 1e-3, rels


def test_chip_solve_matches_complex_path(surf, slfmm_op):
    """Full planes-path GMRES (f64 planes, exactness) against the direct
    complex solve: same x, same iteration count."""
    inc = plane_wave((0.0, 0.0, 1.0))
    rhs = np.asarray(inc.pressure(jnp.asarray(surf.centers), K))
    pre = ClusterBlockPreconditioner.from_operator(slfmm_op)
    config = KrylovConfig(max_iterations=200, tolerance=1e-8, restart=40)

    sol_ref = gmres(slfmm_op, jnp.asarray(rhs), config=config, preconditioner=pre)

    solve = jax.jit(fmm_chip_solve_fn(config))
    xr, xi, it, conv = solve(
        split_planes(slfmm_op, dtype=None),
        split_planes(pre, dtype=None),
        jnp.asarray(rhs.real),
        jnp.asarray(rhs.imag),
    )
    assert bool(conv)
    assert int(it) == int(sol_ref.iterations)
    np.testing.assert_allclose(
        np.asarray(xr) + 1j * np.asarray(xi), np.asarray(sol_ref.x), rtol=1e-10
    )


def test_chip_solve_unpreconditioned(surf, slfmm_op):
    inc = plane_wave((0.0, 0.0, 1.0))
    rhs = np.asarray(inc.pressure(jnp.asarray(surf.centers), K))
    config = KrylovConfig(max_iterations=300, tolerance=1e-8, restart=40)
    solve = jax.jit(fmm_chip_solve_fn(config))
    xr, xi, it, conv = solve(
        split_planes(slfmm_op, dtype=None), None,
        jnp.asarray(rhs.real), jnp.asarray(rhs.imag),
    )
    assert bool(conv)
    x = np.asarray(xr) + 1j * np.asarray(xi)
    res = np.asarray(slfmm_op.matvec(jnp.asarray(x))) - rhs
    assert np.linalg.norm(res) / np.linalg.norm(rhs) < 1e-6


def test_mlfmm_tree_planes_roundtrip(surf):
    """The hierarchical tree operator (nested MlfmmLevel tuples) survives
    the split/join round trip exactly."""
    op = build_mlfmm_tree_system(surf, K)
    planes = split_planes(op, dtype=None)
    op2 = join_planes(planes)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(op.n) + 1j * rng.standard_normal(op.n))
    np.testing.assert_allclose(
        np.asarray(op2.matvec(x)), np.asarray(op.matvec(x)), rtol=0, atol=0
    )


def test_gather_form_matches_scatter_slfmm(surf, slfmm_op):
    """gather_form (the scatter-free chip accumulation) is numerically
    the scatter matvec on SLFMM."""
    from mathaudio_tpu.bem.fmm import gather_form

    g = gather_form(slfmm_op)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal(slfmm_op.n)
                    + 1j * rng.standard_normal(slfmm_op.n))
    np.testing.assert_allclose(
        np.asarray(g.matvec(x)), np.asarray(slfmm_op.matvec(x)),
        rtol=1e-13, atol=1e-14,
    )


def test_gather_form_matches_scatter_mlfmm_tree(surf):
    from mathaudio_tpu.bem.fmm import build_mlfmm_tree_system, gather_form

    # subdiv-3 mesh: deep enough octree that the tree genuinely uses
    # >= 2 levels of M2M/L2L (same shape as the mixed-tree tests)
    op = build_mlfmm_tree_system(icosphere(1.0, 3), K, beta=0.1j)
    g = gather_form(op)
    assert len(op.data.levels) >= 2  # need real M2M/L2L + per-level trans
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal(op.n) + 1j * rng.standard_normal(op.n))
    # not bitwise: the target-side grouping reorders the summation of
    # ~1e5-amplitude translation terms (tau=1e8 default) — ~1e-10 rel
    np.testing.assert_allclose(
        np.asarray(g.matvec(x)), np.asarray(op.matvec(x)),
        rtol=1e-8, atol=1e-9,
    )
    # gather form survives the planes round trip (the chip combination)
    g2 = join_planes(split_planes(g, dtype=None))
    np.testing.assert_allclose(
        np.asarray(g2.matvec(x)), np.asarray(op.matvec(x)),
        rtol=1e-8, atol=1e-9,
    )


def test_gather_form_two_level(surf):
    from mathaudio_tpu.bem.fmm import build_mlfmm_system, gather_form

    op = build_mlfmm_system(surf, K)
    g = gather_form(op)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal(op.n) + 1j * rng.standard_normal(op.n))
    np.testing.assert_allclose(
        np.asarray(g.matvec(x)), np.asarray(op.matvec(x)),
        rtol=1e-13, atol=1e-14,
    )


class TestClusterMajorSolve:
    def test_cm_solve_matches_element_order(self):
        """fmm_chip_solve_cm_fn (cluster-major Krylov space, round 4)
        reproduces fmm_chip_solve_fn's iteration counts and solutions for
        both operator families."""
        from mathaudio_tpu.bem import plane_wave
        from mathaudio_tpu.bem.fmm import (
            ClusterBlockPreconditioner,
            build_mlfmm_tree_system,
            build_slfmm_system,
            gather_form,
            sel_form,
        )
        from mathaudio_tpu.bem.fmm_chip import (
            fmm_chip_solve_cm_fn,
            fmm_chip_solve_fn,
            split_planes,
        )
        from mathaudio_tpu.bem.mesh import icosphere
        from mathaudio_tpu.solvers import KrylovConfig

        inc = plane_wave((0.0, 0.0, 1.0))
        cfg = KrylovConfig(max_iterations=200, tolerance=1e-8, restart=40)
        for name, build, k, subdiv in (
            ("slfmm", build_slfmm_system, 2.0, 2),
            ("tree", build_mlfmm_tree_system, 4.0, 3),
        ):
            surf = icosphere(1.0, subdiv)
            kw = dict(beta=1j / k) if name == "slfmm" else {}
            op = build(surf, k, **kw)
            pre = ClusterBlockPreconditioner.from_operator(op)
            opg = sel_form(op) if name == "tree" else gather_form(op)
            c = jnp.asarray(surf.centers)
            nrm = jnp.asarray(surf.normals)
            beta = kw.get("beta", 0.0)
            rhs = np.asarray(inc.pressure(c, k)) - beta * np.asarray(
                inc.normal_derivative(c, nrm, k)
            )
            planes = split_planes(opg, dtype=np.float64)
            prep = split_planes(pre, dtype=np.float64)
            rr, ri = jnp.asarray(rhs.real), jnp.asarray(rhs.imag)
            s0 = fmm_chip_solve_fn(cfg)(planes, prep, rr, ri)
            s1 = fmm_chip_solve_cm_fn(cfg)(planes, prep, rr, ri)
            assert bool(s0[3]) and bool(s1[3])
            assert int(s0[2]) == int(s1[2]), name
            x0 = np.asarray(s0[0]) + 1j * np.asarray(s0[1])
            x1 = np.asarray(s1[0]) + 1j * np.asarray(s1[1])
            rel = np.linalg.norm(x1 - x0) / np.linalg.norm(x0)
            assert rel < 1e-7, (name, rel)
