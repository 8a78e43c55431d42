"""FEM validation vs analytical/manufactured solutions.

Mirrors math-fem/tests/analytical_validation.rs: MMS strip test
(L2 < 0.02), 2D plane wave (L2 < 0.01), h-convergence at ~O(h^2),
plus mesh/assembly unit checks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mathaudio_tpu.fem import (
    Mesh,
    rectangular_mesh_triangles,
    unit_square_triangles,
    unit_cube_tetrahedra,
    box_mesh_tetrahedra,
    annular_mesh_triangles,
    spherical_shell_mesh_tetrahedra,
    assemble_stiffness_mass,
    HelmholtzAssembler,
    HelmholtzProblem,
    solve_helmholtz,
    DirichletBC,
)
from mathaudio_tpu.fem.problem import l2_error_at_nodes
from mathaudio_tpu.solvers import KrylovConfig


class TestMesh:
    def test_rect_tri_counts(self):
        m = rectangular_mesh_triangles(0, 1, 0, 1, 4, 3)
        assert m.num_nodes == 5 * 4
        assert m.num_elements == 2 * 4 * 3
        np.testing.assert_allclose(m.element_measures().sum(), 1.0, atol=1e-12)

    def test_boundary_detection_square(self):
        m = unit_square_triangles(4)
        # 4 sides x 4 edges = 16 boundary edges
        assert len(m.boundary_faces) == 16
        assert set(np.unique(m.boundary_markers)) == {1, 2, 3, 4}

    def test_box_tets(self):
        m = unit_cube_tetrahedra(3)
        assert m.num_elements == 6 * 27
        np.testing.assert_allclose(m.element_measures().sum(), 1.0, atol=1e-12)
        assert set(np.unique(m.boundary_markers)) == {1, 2, 3, 4, 5, 6}

    def test_annulus(self):
        m = annular_mesh_triangles(1.0, 2.0, 8, 32)
        area = m.element_measures().sum()
        np.testing.assert_allclose(area, np.pi * 3.0, rtol=0.02)
        assert (m.boundary_markers > 0).all()

    def test_spherical_shell(self):
        m = spherical_shell_mesh_tetrahedra(1.0, 2.0, 4, subdivisions=1)
        vol = m.element_measures().sum()
        np.testing.assert_allclose(vol, 4 / 3 * np.pi * 7.0, rtol=0.15)
        assert set(np.unique(m.boundary_markers)) == {1, 2}
        assert (m.element_measures() > 1e-12).all()


class TestAssembly:
    def test_stiffness_nullspace(self):
        # K @ const = 0 (pure Neumann stiffness annihilates constants)
        m = unit_square_triangles(5)
        csr, k_vals, m_vals, meta = assemble_stiffness_mass(m)
        asm = HelmholtzAssembler(m)
        op = asm.operator_from_values(k_vals.astype(asm.cdtype))
        ones = jnp.ones(m.num_nodes, asm.cdtype)
        np.testing.assert_allclose(np.abs(np.asarray(op.matvec(ones))), 0.0, atol=1e-12)

    def test_mass_total(self):
        # sum_ij M_ij = domain measure
        m = unit_square_triangles(6)
        asm = HelmholtzAssembler(m)
        total = float(jnp.sum(asm.m_vals))
        np.testing.assert_allclose(total, 1.0, atol=1e-12)

    def test_mass_total_3d(self):
        m = unit_cube_tetrahedra(2)
        asm = HelmholtzAssembler(m)
        np.testing.assert_allclose(float(jnp.sum(asm.m_vals)), 1.0, atol=1e-12)

    def test_boundary_mass_total(self):
        # sum_ij B_ij = boundary length of that side (=1 for unit square)
        m = unit_square_triangles(5)
        asm = HelmholtzAssembler(m, robin_tags=[1])
        np.testing.assert_allclose(float(jnp.sum(asm.b_vals[1])), 1.0, atol=1e-12)

    def test_stiffness_patch_1d(self):
        # K applied to u=x on interior rows of a strip = 0 (linear exactness)
        m = rectangular_mesh_triangles(0, 1, 0, 1, 6, 6)
        asm = HelmholtzAssembler(m)
        op = asm.operator_from_values(asm.k_vals)
        u = jnp.asarray(m.nodes[:, 0])
        r = np.asarray(op.matvec(u))
        interior = ~np.isin(np.arange(m.num_nodes), m.boundary_nodes())
        np.testing.assert_allclose(r[interior], 0.0, atol=1e-12)


class TestHelmholtzValidation:
    def test_1d_mode_in_2d_strip(self):
        # analytical_validation.rs:63-119: u = sin(pi x), f = (pi^2-k^2) sin(pi x)
        k = 1.5
        mesh = rectangular_mesh_triangles(0.0, 1.0, 0.0, 0.05, 40, 2)
        coef = np.pi**2 - k**2

        def source(x):
            return coef * jnp.sin(np.pi * x[..., 0])

        def exact(x):
            return jnp.sin(np.pi * x[..., 0]) + 0j

        bcs = [DirichletBC(t, exact) for t in (1, 2, 3, 4)]
        prob = HelmholtzProblem(mesh, k, source_fn=source, dirichlet=bcs)
        u, info = solve_helmholtz(
            prob, "gmres_jacobi", KrylovConfig(max_iterations=500, restart=50, tolerance=1e-10)
        )
        assert info["converged"]
        err = float(l2_error_at_nodes(mesh, u, exact))
        assert err < 0.02, f"L2 error {err}"

    def test_2d_plane_wave(self):
        # analytical_validation.rs:167: u = exp(i(kx x + ky y)), f = 0
        k = 2.0
        kx, ky = k * np.cos(np.pi / 4), k * np.sin(np.pi / 4)
        mesh = unit_square_triangles(16)

        def exact(x):
            return jnp.exp(1j * (kx * x[..., 0] + ky * x[..., 1]))

        bcs = [DirichletBC(t, exact) for t in (1, 2, 3, 4)]
        prob = HelmholtzProblem(mesh, k, dirichlet=bcs)
        u, info = solve_helmholtz(
            prob, "gmres_jacobi", KrylovConfig(max_iterations=500, restart=50, tolerance=1e-10)
        )
        assert info["converged"]
        err = float(l2_error_at_nodes(mesh, u, exact))
        assert err < 0.01, f"L2 error {err}"

    def test_convergence_rate(self):
        # analytical_validation.rs:178: error drops ~O(h^2) under refinement
        k = 1.0
        kx, ky = 0.6, 0.8

        def exact(x):
            return jnp.exp(1j * (kx * x[..., 0] + ky * x[..., 1]))

        errors = []
        for n in [4, 8, 16]:
            mesh = unit_square_triangles(n)
            bcs = [DirichletBC(t, exact) for t in (1, 2, 3, 4)]
            prob = HelmholtzProblem(mesh, k, dirichlet=bcs)
            u, info = solve_helmholtz(prob, "direct")
            errors.append(float(l2_error_at_nodes(mesh, u, exact)))
        rate1 = errors[0] / errors[1]
        rate2 = errors[1] / errors[2]
        assert rate1 > 3.0, f"expected ~4x error drop, got {rate1} ({errors})"
        assert rate2 > 3.0, f"expected ~4x error drop, got {rate2} ({errors})"

    def test_3d_plane_wave_box(self):
        k = 1.0
        kv = k * np.asarray([0.6, 0.64, 0.48])

        def exact(x):
            return jnp.exp(1j * (x @ jnp.asarray(kv)))

        mesh = box_mesh_tetrahedra(0, 1, 0, 1, 0, 1, 6, 6, 6)
        bcs = [DirichletBC(t, exact) for t in (1, 2, 3, 4, 5, 6)]
        prob = HelmholtzProblem(mesh, k, dirichlet=bcs)
        u, info = solve_helmholtz(
            prob, "gmres_jacobi", KrylovConfig(max_iterations=1000, restart=50, tolerance=1e-10)
        )
        assert info["converged"]
        err = float(l2_error_at_nodes(mesh, u, exact))
        assert err < 0.02, f"L2 error {err}"

    def test_solver_variants_agree(self):
        k = 1.5
        mesh = unit_square_triangles(8)

        def exact(x):
            return jnp.exp(1j * k * x[..., 0])

        bcs = [DirichletBC(t, exact) for t in (1, 2, 3, 4)]
        prob = HelmholtzProblem(mesh, k, dirichlet=bcs)
        u_direct, _ = solve_helmholtz(prob, "direct")
        cfg = KrylovConfig(max_iterations=2000, restart=60, tolerance=1e-12)
        for s in ["gmres", "gmres_jacobi", "gmres_ilu", "gmres_ilu_colored",
                  "gmres_schwarz", "gmres_amg",
                  "gmres_pipelined", "gmres_shifted_laplacian", "bicgstab"]:
            u, info = solve_helmholtz(prob, s, cfg)
            assert info["converged"], s
            np.testing.assert_allclose(
                np.asarray(u), np.asarray(u_direct), atol=1e-7, err_msg=s
            )
