"""Mixed-BC SLFMM: matrix-free velocity/pressure/admittance boundary
conditions (fmm.build_slfmm_mixed_system + BemSolver._solve_mixed_fmm).

The reference's SLFMM assumes a rigid surface and only switches the free
term (math-bem/src/core/assembly/slfmm.rs:524-531); its mixed-BC TBEM is
dense-only (tbem.rs:234-340). This path extends the per-column BC
combination of the dense mixed system to the FMM operator, so
inhomogeneous BCs work at FMM scale. Parity gates: exact (to expansion
error) matvec/RHS agreement with assemble_mixed_system, plus the same
analytic oracles as the dense mixed tests.
"""

import dataclasses

import numpy as np
import pytest

from mathaudio_tpu.bem import (
    BemProblem,
    BemSolver,
    BemSolverConfig,
    BoundaryCondition,
    PhysicsParams,
    assemble_mixed_system,
)
from mathaudio_tpu.bem.fmm import build_slfmm_mixed_system
from mathaudio_tpu.bem.mesh import icosphere
from mathaudio_tpu.bem.types import BemMethod
from mathaudio_tpu.wave.analytical.solutions_3d import pulsating_sphere_3d

RHO, C = 1.204, 343.0


def _hemisphere_bc(mesh, ka):
    """Velocity BC on z>0, analytic pressure BC on z<0 (consistent with
    the radiating pulsating-sphere solution)."""
    exact = np.asarray(pulsating_sphere_3d(ka, 1.0, mesh.centers).pressure)
    types = np.where(mesh.centers[:, 2] > 0, 0, 1).astype(np.int32)
    values = np.where(types == 0, 1.0 + 0.0j, exact)
    return BoundaryCondition(types=types, values=values)


@pytest.mark.parametrize("with_bm", [False, True])
def test_mixed_fmm_matvec_and_rhs_match_dense(with_bm):
    """Operator application and RHS agree with the dense mixed system to
    FMM expansion error on a mesh with genuine far-field pairs."""
    ka = 2.0
    mesh = icosphere(1.0, 3)  # 1280 elements
    bc = _hemisphere_bc(mesh, ka)
    beta = (
        PhysicsParams.from_wave_number(ka).burton_miller_beta_optimal(
            mesh.avg_element_size()
        )
        if with_bm
        else 0.0
    )
    a, b, up_dense = assemble_mixed_system(mesh, ka, bc, beta=beta, quad_order=3)
    op, rhs, up = build_slfmm_mixed_system(
        mesh, ka, bc, beta=beta, max_per_leaf=64, separation_ratio=2.0,
        quad_order=3,
    )
    assert (up == np.asarray(up_dense, bool)).all()
    rng = np.random.default_rng(7)
    x = rng.standard_normal(mesh.num_elements) + 1j * rng.standard_normal(
        mesh.num_elements
    )
    y_fmm = np.asarray(op.matvec(x))
    y_dense = np.asarray(a) @ x
    rel = np.abs(y_fmm - y_dense).max() / np.abs(y_dense).max()
    assert rel < 1e-3, f"matvec rel err {rel}"
    rel_b = np.abs(np.asarray(rhs) - np.asarray(b)).max() / np.abs(
        np.asarray(b)
    ).max()
    assert rel_b < 1e-3, f"rhs rel err {rel_b}"


def test_mixed_fmm_admittance_matvec_matches_dense():
    """The -ik*adm single-layer coupling on unknown-p columns survives the
    far-field factorization."""
    ka = 2.0
    mesh = icosphere(1.0, 3)
    bc = BoundaryCondition.velocity_with_admittance(1.0, 0.7 + 0.2j,
                                                    mesh.num_elements)
    a, b, _ = assemble_mixed_system(mesh, ka, bc, beta=0.0, quad_order=3)
    op, rhs, _ = build_slfmm_mixed_system(
        mesh, ka, bc, beta=0.0, max_per_leaf=64, separation_ratio=2.0,
        quad_order=3,
    )
    rng = np.random.default_rng(3)
    x = rng.standard_normal(mesh.num_elements) + 1j * rng.standard_normal(
        mesh.num_elements
    )
    rel = np.abs(np.asarray(op.matvec(x)) - np.asarray(a) @ x).max() / np.abs(
        np.asarray(a) @ x
    ).max()
    assert rel < 1e-3, rel
    rel_b = np.abs(np.asarray(rhs) - np.asarray(b)).max() / np.abs(
        np.asarray(b)
    ).max()
    assert rel_b < 1e-3, rel_b


def test_solver_mixed_fmm_pulsating_sphere():
    """End-to-end: SLFMM config + velocity BC through BemSolver vs the
    analytic pulsating sphere (dense-path oracle, qa_suite.rs:328)."""
    ka = 1.0
    prob = BemProblem.radiating_sphere(ka, subdivisions=3)
    sol = BemSolver(
        BemSolverConfig(assembly=BemMethod.SLFMM, burton_miller=False)
    ).solve(prob)
    assert sol.info["mixed_bc"] and sol.info["converged"]
    assert sol.info["assembly"] == "slfmm"
    exact = np.asarray(pulsating_sphere_3d(ka, 1.0, prob.mesh.centers).pressure)
    rel = np.abs(np.asarray(sol.surface_pressure) - exact).max() / np.abs(exact).max()
    assert rel < 0.05, f"rel err {rel}"
    # reconstructed q = i*omega*rho*v everywhere (all velocity elements)
    q_exact = 1j * ka * C * RHO
    assert np.abs(np.asarray(sol.surface_q) - q_exact).max() / abs(q_exact) < 1e-12


def test_solver_mixed_fmm_hemispheres_match_dense_solution():
    """Mixed velocity/pressure hemispheres: FMM solution vector matches
    the dense mixed solve (both fields, same BC routing)."""
    ka = 1.0
    mesh = icosphere(1.0, 3)  # expansion error < solver tol at this size
    bc = _hemisphere_bc(mesh, ka)
    prob = BemProblem(
        mesh=mesh, physics=PhysicsParams.from_wave_number(ka), bc=bc
    )
    cfg = dict(burton_miller=True, quad_order=4)
    sol_fmm = BemSolver(
        BemSolverConfig(assembly=BemMethod.SLFMM, **cfg)
    ).solve(prob)
    sol_dense = BemSolver(BemSolverConfig(assembly=BemMethod.TBEM, **cfg)).solve(prob)
    for field in ("surface_pressure", "surface_q"):
        f, d = np.asarray(getattr(sol_fmm, field)), np.asarray(
            getattr(sol_dense, field)
        )
        rel = np.abs(f - d).max() / np.abs(d).max()
        assert rel < 1e-2, f"{field}: rel {rel}"


def test_solver_mixed_fmm_admittance_oracle():
    """Locally-reacting sphere at FMM scale vs the impedance oracle."""
    from mathaudio_tpu.wave.analytical.solutions_3d import impedance_sphere_3d

    ka, adm = 1.0, 1.0
    prob = BemProblem.radiating_sphere(ka, subdivisions=3)
    prob = dataclasses.replace(
        prob,
        bc=BoundaryCondition.velocity_with_admittance(
            1.0, adm, prob.mesh.num_elements
        ),
    )
    sol = BemSolver(
        BemSolverConfig(assembly=BemMethod.SLFMM, burton_miller=False)
    ).solve(prob)
    ex = np.asarray(
        impedance_sphere_3d(ka, 1.0, prob.mesh.centers, admittance=adm).pressure
    )
    rel = np.abs(np.asarray(sol.surface_pressure) - ex).max() / np.abs(ex).max()
    assert rel < 0.05, rel


def test_mlfmm_config_routes_to_mixed_fmm():
    """An MLFMM config with BCs no longer raises — it routes through the
    mixed SLFMM operator (recorded in info)."""
    prob = BemProblem.radiating_sphere(1.0, subdivisions=2)
    sol = BemSolver(
        BemSolverConfig(assembly=BemMethod.MLFMM, burton_miller=False)
    ).solve(prob)
    assert sol.info["assembly"] == "slfmm" and sol.info["converged"]
    exact = np.asarray(pulsating_sphere_3d(1.0, 1.0, prob.mesh.centers).pressure)
    rel = np.abs(np.asarray(sol.surface_pressure) - exact).max() / np.abs(exact).max()
    assert rel < 0.05, rel


@pytest.mark.parametrize("with_bm", [False, True])
def test_mixed_mlfmm_tree_matvec_and_rhs_match_dense(with_bm):
    """Mixed BCs through the hierarchical MLFMM tree
    (fmm.build_mlfmm_tree_mixed_system; VERDICT r2 item 7): operator and
    RHS agree with the dense mixed system to FMM expansion error."""
    from mathaudio_tpu.bem.fmm import build_mlfmm_tree_mixed_system

    ka = 2.0
    mesh = icosphere(1.0, 3)  # 1280 elements -> a real multi-level tree
    bc = _hemisphere_bc(mesh, ka)
    beta = (
        PhysicsParams.from_wave_number(ka).burton_miller_beta_optimal(
            mesh.avg_element_size()
        )
        if with_bm
        else 0.0
    )
    a, b, up_dense = assemble_mixed_system(mesh, ka, bc, beta=beta, quad_order=3)
    op, rhs, up = build_mlfmm_tree_mixed_system(
        mesh, ka, bc, beta=beta, max_per_leaf=16, quad_order=3,
    )
    assert len(op.data.levels) >= 2
    assert (up == np.asarray(up_dense, bool)).all()
    rng = np.random.default_rng(7)
    x = rng.standard_normal(mesh.num_elements) + 1j * rng.standard_normal(
        mesh.num_elements
    )
    y_fmm = np.asarray(op.matvec(x))
    y_dense = np.asarray(a) @ x
    rel = np.abs(y_fmm - y_dense).max() / np.abs(y_dense).max()
    assert rel < 2e-3, f"tree matvec rel err {rel}"
    rel_b = np.abs(np.asarray(rhs) - np.asarray(b)).max() / np.abs(
        np.asarray(b)
    ).max()
    assert rel_b < 2e-3, f"tree rhs rel err {rel_b}"


def test_mixed_mlfmm_tree_pulsating_sphere_solve():
    """Full GMRES solve of a radiating (pulsating-sphere) problem through
    the mixed MLFMM tree, gated against the analytic solution."""
    import jax.numpy as jnp

    from mathaudio_tpu.bem.fmm import build_mlfmm_tree_mixed_system
    from mathaudio_tpu.solvers import KrylovConfig, gmres

    ka, v0 = 1.3, 1.0
    mesh = icosphere(1.0, 3)
    n = mesh.num_elements
    bc = BoundaryCondition(types=np.zeros(n, np.int32),
                           values=np.full(n, v0, complex))
    op, rhs, up = build_mlfmm_tree_mixed_system(mesh, ka, bc, beta=0.0)
    assert up.all()
    sol = gmres(op, rhs,
                config=KrylovConfig(max_iterations=300, tolerance=1e-7, restart=50))
    assert bool(sol.converged)
    exact = np.asarray(
        pulsating_sphere_3d(ka, 1.0, mesh.centers, velocity=v0).pressure
    )
    rel = np.linalg.norm(np.asarray(sol.x) - exact) / np.linalg.norm(exact)
    assert rel < 0.05, f"pulsating sphere rel err {rel}"
