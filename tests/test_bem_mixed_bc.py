"""Mixed per-element boundary conditions (velocity / pressure) in the
dense BEM — parity with the reference's BC-dependent TBEM assembly
(math-bem/src/core/assembly/tbem.rs:234-340 get_bc_type_and_value /
add_free_terms / assemble_tbem) and the pulsating-sphere validation
(math-bem/bin/qa_suite.rs:328 run_pulsating_sphere_test).
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
from mathaudio_tpu.bem.mesh import icosphere
from mathaudio_tpu.wave.analytical.solutions_3d import pulsating_sphere_3d

RHO, C = 1.204, 343.0


def _solve(mesh, ka, bc, beta=0.0, incident=None, quad_order=4):
    a, b, unknown_p = assemble_mixed_system(
        mesh, ka, bc, beta=beta, incident=incident, quad_order=quad_order
    )
    return np.linalg.solve(np.asarray(a), np.asarray(b)), unknown_p


def test_pulsating_sphere_oracle_velocity_relation():
    """dp/dr at r=a equals i*omega*rho*v0 (momentum equation, e^{-iwt})."""
    ka, a, v0 = 1.3, 1.0, 1.0
    eps = 1e-6
    pts = np.array([[a, 0.0, 0.0], [a + eps, 0.0, 0.0]])
    p = np.asarray(pulsating_sphere_3d(ka, a, pts, velocity=v0).pressure)
    dpdr = (p[1] - p[0]) / eps
    q_exact = 1j * (ka / a) * C * RHO * v0
    assert abs(dpdr - q_exact) / abs(q_exact) < 1e-4


@pytest.mark.parametrize("ka", [0.5, 1.0, 2.0])
def test_pulsating_sphere_cbie_surface_pressure(ka):
    mesh = icosphere(1.0, 2)
    bc = BoundaryCondition.velocity(1.0, mesh.num_elements)
    u, _ = _solve(mesh, ka, bc)
    exact = np.asarray(pulsating_sphere_3d(ka, 1.0, mesh.centers).pressure)
    rel = np.abs(u - exact).max() / np.abs(exact).max()
    assert rel < 0.05, f"ka={ka}: rel err {rel}"


def test_pulsating_sphere_burton_miller_at_fictitious_frequency():
    """ka = pi is an interior Dirichlet eigenvalue (j0(ka)=0): the plain
    CBIE degrades there and Burton-Miller recovers accuracy (the point of
    the reference's beta machinery, types.rs:64-216)."""
    ka = np.pi
    mesh = icosphere(1.0, 2)
    bc = BoundaryCondition.velocity(1.0, mesh.num_elements)
    exact = np.asarray(pulsating_sphere_3d(ka, 1.0, mesh.centers).pressure)
    scale = np.abs(exact).max()
    beta = PhysicsParams.from_wave_number(ka).burton_miller_beta()
    u_plain, _ = _solve(mesh, ka, bc, beta=0.0)
    u_bm, _ = _solve(mesh, ka, bc, beta=beta)
    err_plain = np.abs(u_plain - exact).max() / scale
    err_bm = np.abs(u_bm - exact).max() / scale
    assert err_bm < 0.10
    assert err_bm < err_plain


def test_dirichlet_recovers_surface_velocity():
    """Prescribe the analytic pulsating-sphere pressure (Dirichlet);
    the solved dp/dn must match i*omega*rho*v0."""
    ka = 1.0
    mesh = icosphere(1.0, 2)
    p_surf = complex(
        np.asarray(pulsating_sphere_3d(ka, 1.0, np.array([[1.0, 0, 0]])).pressure)[0]
    )
    bc = BoundaryCondition.pressure(p_surf, mesh.num_elements)
    q, unknown_p = _solve(mesh, ka, bc)
    assert not unknown_p.any()
    q_exact = 1j * ka * C * RHO
    rel = np.abs(q - q_exact).max() / abs(q_exact)
    assert rel < 0.06, f"rel err {rel}"


def test_mixed_velocity_pressure_hemispheres():
    """Velocity BC on z>0, consistent analytic pressure BC on z<0: both
    recovered unknowns must match the analytic radiating solution."""
    ka = 1.0
    mesh = icosphere(1.0, 2)
    n = mesh.num_elements
    exact = np.asarray(pulsating_sphere_3d(ka, 1.0, mesh.centers).pressure)
    types = np.where(mesh.centers[:, 2] > 0, 0, 1).astype(np.int32)
    values = np.where(types == 0, 1.0 + 0.0j, exact)
    bc = BoundaryCondition(types=types, values=values)
    u, unknown_p = _solve(mesh, ka, bc)
    q_exact = 1j * ka * C * RHO
    err_p = np.abs(u[unknown_p] - exact[unknown_p]).max() / np.abs(exact).max()
    err_q = np.abs(u[~unknown_p] - q_exact).max() / abs(q_exact)
    assert err_p < 0.06, f"pressure unknowns: {err_p}"
    assert err_q < 0.15, f"velocity unknowns: {err_q}"


def test_radiating_sphere_end_to_end_field():
    """High-level API: BemProblem.radiating_sphere -> BemSolver -> field
    evaluation with the single-layer term, vs the analytic field."""
    prob = BemProblem.radiating_sphere(1.0, subdivisions=2)
    sol = BemSolver(BemSolverConfig(burton_miller=True)).solve(prob)
    assert sol.info["mixed_bc"] and sol.info["converged"]
    assert sol.surface_q is not None
    pts = np.array([[2.0, 0.0, 0.0], [0.0, 0.0, 3.0], [0.0, -2.5, 0.5]])
    fr = sol.evaluate_pressure_field(pts, quad_order=4)
    exact = np.asarray(pulsating_sphere_3d(1.0, 1.0, pts).pressure)
    rel = np.abs(np.asarray(fr.p_total) - exact).max() / np.abs(exact).max()
    assert rel < 0.05, f"field rel err {rel}"
    assert np.abs(np.asarray(fr.p_inc)).max() == 0.0  # pure radiation


def test_zero_velocity_bc_matches_rigid_path():
    """bc = velocity(0) + incident must reproduce the dedicated rigid
    scattering assembly (regression tying the two formulations)."""
    prob = BemProblem.rigid_sphere(1.0, subdivisions=2)
    cfg = BemSolverConfig(burton_miller=False, quad_order=4)
    sol_rigid = BemSolver(cfg).solve(prob)
    prob_bc = dataclasses.replace(
        prob, bc=BoundaryCondition.velocity(0.0, prob.mesh.num_elements)
    )
    sol_bc = BemSolver(cfg).solve(prob_bc)
    ref = np.abs(np.asarray(sol_rigid.surface_pressure)).max()
    diff = np.abs(
        np.asarray(sol_rigid.surface_pressure) - np.asarray(sol_bc.surface_pressure)
    ).max()
    assert diff / ref < 1e-10
    # and the reconstructed q on a rigid surface is exactly zero
    assert np.abs(np.asarray(sol_bc.surface_q)).max() == 0.0


@pytest.mark.parametrize("beta", [0.3, 1.0, 2.0 + 0.5j])
def test_velocity_with_admittance_sphere(beta):
    """Locally-reacting pulsating sphere vs the impedance-sphere oracle
    (exceeds the reference: its dense assembly drops the admittance of
    VelocityWithAdmittance, tbem.rs:238)."""
    from mathaudio_tpu.wave.analytical.solutions_3d import impedance_sphere_3d

    ka = 1.0
    prob = BemProblem.radiating_sphere(ka, subdivisions=2)
    prob = dataclasses.replace(
        prob,
        bc=BoundaryCondition.velocity_with_admittance(
            1.0, beta, prob.mesh.num_elements
        ),
    )
    sol = BemSolver(BemSolverConfig(burton_miller=False)).solve(prob)
    ex = np.asarray(
        impedance_sphere_3d(ka, 1.0, prob.mesh.centers, admittance=beta).pressure
    )
    err = np.abs(np.asarray(sol.surface_pressure) - ex).max() / np.abs(ex).max()
    assert err < 0.05, f"beta={beta}: {err}"
    pts = np.array([[0.0, 0.0, 2.5]])
    f = np.asarray(sol.evaluate_pressure_field(pts, quad_order=4).p_total)[0]
    exf = np.asarray(impedance_sphere_3d(ka, 1.0, pts, admittance=beta).pressure)[0]
    assert abs(f - exf) / abs(exf) < 0.05


def test_admittance_zero_matches_pulsating_and_absorbs_with_beta():
    from mathaudio_tpu.wave.analytical.solutions_3d import impedance_sphere_3d

    pts = np.array([[1.0, 0.0, 0.0]])
    p0 = np.asarray(impedance_sphere_3d(1.0, 1.0, pts, admittance=0.0).pressure)[0]
    p_puls = np.asarray(pulsating_sphere_3d(1.0, 1.0, pts).pressure)[0]
    assert abs(p0 - p_puls) < 1e-12 * abs(p_puls)
    # monotone pressure reduction with growing real admittance
    mags = [
        abs(np.asarray(impedance_sphere_3d(1.0, 1.0, pts, admittance=b).pressure)[0])
        for b in (0.0, 0.5, 1.0, 4.0)
    ]
    assert all(a > b for a, b in zip(mags, mags[1:]))


def test_bc_factories():
    bc = BoundaryCondition.velocity(2.0 + 1.0j, 5)
    assert bc.types.shape == (5,) and (bc.types == 0).all()
    assert np.allclose(bc.values, 2.0 + 1.0j)
    bc2 = BoundaryCondition.pressure([1.0, 2.0, 3.0])
    assert (bc2.types == 1).all() and bc2.values.shape == (3,)
