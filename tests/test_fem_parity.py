"""FEM parity tests mirroring reference in-crate checks not yet covered
elsewhere: quadrature exactness (quadrature/gauss.rs tests), basis
Kronecker/partition-of-unity for Q1 (basis/lagrange.rs), Helmholtz
assembly identities (assembly/helmholtz.rs: k=0 -> Laplacian, complex
wavenumber), stiffness symmetry / mass positivity / lumped mass
(mass.rs), circular mesh (mesh/generators.rs:171), and the MMS family
(tests/analytical_validation.rs: polynomial-exact, sin_cos, complex,
varying wavenumber)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mathaudio_tpu.fem import (
    assemble_lumped_mass,
    assemble_stiffness_mass,
)
from mathaudio_tpu.fem.assembly import HelmholtzAssembler, assemble_rhs
from mathaudio_tpu.fem.basis import shape_functions
from mathaudio_tpu.fem.boundary import DirichletBC
from mathaudio_tpu.fem.mesh import (
    HEX,
    QUAD,
    TET,
    TRIANGLE,
    circular_mesh_triangles,
    rectangular_mesh_triangles,
    unit_cube_hexahedra,
    unit_square_quads,
    unit_square_triangles,
)
from mathaudio_tpu.fem.problem import HelmholtzProblem, l2_error_at_nodes, solve_helmholtz
from mathaudio_tpu.fem.quadrature import (
    gauss_1d,
    hex_rule,
    quad_rule,
    segment_rule,
    tet_rule,
    triangle_rule,
)


class TestQuadratureExactness:
    def test_gauss_1d_integrates_polynomials(self):
        """n-point Gauss-Legendre on [-1,1] is exact through degree 2n-1
        (gauss.rs:53)."""
        for n in range(1, 6):
            pts, w = gauss_1d(n)
            for deg in range(2 * n):
                exact = 0.0 if deg % 2 else 2.0 / (deg + 1)
                got = float(np.sum(np.asarray(w) * np.asarray(pts) ** deg))
                assert abs(got - exact) < 1e-13, (n, deg)

    def test_triangle_rule_monomials(self):
        """int x^a y^b over the unit triangle = a! b! / (a+b+2)!
        (gauss.rs:105 triangle rules)."""
        import math

        for order in (1, 2, 3, 4):
            # order-4 (13-pt) rule constants are literature values
            # truncated to ~10 digits
            tol = 5e-9 if order >= 4 else 1e-12
            pts, w = triangle_rule(order)
            pts, w = np.asarray(pts), np.asarray(w)
            for a in range(order + 1):
                for b in range(order + 1 - a):
                    exact = (
                        math.factorial(a) * math.factorial(b) / math.factorial(a + b + 2)
                    )
                    got = float(np.sum(w * pts[:, 0] ** a * pts[:, 1] ** b))
                    assert abs(got - exact) < tol, (order, a, b)

    def test_tet_rule_monomials(self):
        """int x^a y^b z^c over the unit tet = a! b! c! / (a+b+c+3)!."""
        import math

        for order in (1, 2):
            pts, w = tet_rule(order)
            pts, w = np.asarray(pts), np.asarray(w)
            for a in range(order + 1):
                for b in range(order + 1 - a):
                    for c in range(order + 1 - a - b):
                        exact = (
                            math.factorial(a)
                            * math.factorial(b)
                            * math.factorial(c)
                            / math.factorial(a + b + c + 3)
                        )
                        got = float(
                            np.sum(w * pts[:, 0] ** a * pts[:, 1] ** b * pts[:, 2] ** c)
                        )
                        assert abs(got - exact) < 1e-12, (order, a, b, c)

    def test_tensor_rules_measure_and_quadratics(self):
        """quad/hex tensor rules: weights sum to the reference-cell
        measure and integrate x^2 exactly (gauss.rs:199 tensor rules)."""
        pts, w = quad_rule(2)
        assert abs(float(np.sum(w)) - 4.0) < 1e-13
        got = float(np.sum(np.asarray(w) * np.asarray(pts)[:, 0] ** 2))
        assert abs(got - 4.0 / 3.0) < 1e-13  # int_{[-1,1]^2} x^2 = 4/3
        pts, w = hex_rule(2)
        assert abs(float(np.sum(w)) - 8.0) < 1e-13
        got = float(np.sum(np.asarray(w) * np.asarray(pts)[:, 2] ** 2))
        assert abs(got - 8.0 / 3.0) < 1e-13
        pts, w = segment_rule(2)  # [0,1]
        got = float(np.sum(np.asarray(w) * np.asarray(pts) ** 3))
        assert abs(got - 0.25) < 1e-13


class TestBasisProperties:
    @pytest.mark.parametrize("etype,nodes", [
        (TRIANGLE, [[0, 0], [1, 0], [0, 1]]),
        (QUAD, [[-1, -1], [1, -1], [1, 1], [-1, 1]]),
        (TET, [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]),
        (HEX, [
            [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
        ]),
    ])
    def test_kronecker_delta_at_nodes(self, etype, nodes):
        """phi_i(x_j) = delta_ij for P1/Q1 (lagrange.rs Kronecker tests)."""
        phi, _ = shape_functions(etype, np.asarray(nodes, float))
        np.testing.assert_allclose(phi, np.eye(len(nodes)), atol=1e-13)

    @pytest.mark.parametrize("etype,dim,lo", [
        (TRIANGLE, 2, 0.0), (QUAD, 2, -1.0), (TET, 3, 0.0), (HEX, 3, -1.0),
    ])
    def test_partition_of_unity_and_gradient_sum(self, etype, dim, lo):
        """sum_i phi_i = 1 and sum_i grad phi_i = 0 at interior points."""
        rng = np.random.default_rng(3)
        if lo == 0.0:  # simplex: barycentric-interior sample
            pts = rng.dirichlet(np.ones(dim + 1), size=16)[:, :dim]
        else:
            pts = rng.uniform(-0.9, 0.9, size=(16, dim))
        phi, grad = shape_functions(etype, pts)
        np.testing.assert_allclose(phi.sum(axis=1), 1.0, atol=1e-12)
        np.testing.assert_allclose(grad.sum(axis=1), 0.0, atol=1e-12)


class TestAssemblyIdentities:
    def test_helmholtz_k_zero_equals_laplacian(self):
        """system_values(0) is exactly the stiffness values
        (helmholtz.rs test_helmholtz_k_zero_equals_laplacian)."""
        mesh = unit_square_triangles(6)
        asm = HelmholtzAssembler(mesh)
        vals = asm.system_values(0.0)
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(asm.k_vals).astype(complex), atol=0.0
        )

    def test_helmholtz_complex_wavenumber(self):
        """A complex (damped) wavenumber produces complex values with
        the -k^2 M imaginary signature (test_helmholtz_complex_wavenumber)."""
        mesh = unit_square_triangles(6)
        asm = HelmholtzAssembler(mesh)
        k = 2.0 + 0.3j
        vals = np.asarray(asm.system_values(jnp.asarray(k, asm.cdtype)))
        expect = np.asarray(asm.k_vals) - (k**2) * np.asarray(asm.m_vals)
        np.testing.assert_allclose(vals, expect, rtol=1e-12)
        assert np.abs(vals.imag).max() > 0

    def test_stiffness_symmetric_mass_spd(self):
        """K = K^T; M symmetric positive definite (stiffness.rs/mass.rs)."""
        mesh = unit_square_triangles(5)
        csr, k_vals, m_vals, meta = assemble_stiffness_mass(mesh)
        n = mesh.num_nodes
        rows = np.asarray(meta["row_of_slot"])
        cols = np.asarray(csr.indices)
        K = np.zeros((n, n))
        M = np.zeros((n, n))
        np.add.at(K, (rows, cols), np.asarray(k_vals))
        np.add.at(M, (rows, cols), np.asarray(m_vals))
        np.testing.assert_allclose(K, K.T, atol=1e-12)
        np.testing.assert_allclose(M, M.T, atol=1e-14)
        assert np.linalg.eigvalsh(M).min() > 0

    def test_lumped_mass_totals_and_positivity(self):
        """Lumped mass sums to the mesh measure and is positive
        (mass.rs:278)."""
        for mesh, measure in [
            (unit_square_triangles(5), 1.0),
            (unit_square_quads(5), 1.0),
            (unit_cube_hexahedra(3), 1.0),
        ]:
            lumped = np.asarray(assemble_lumped_mass(mesh))
            assert lumped.shape == (mesh.num_nodes,)
            assert abs(lumped.sum() - measure) < 1e-10
            assert lumped.min() > 0

    def test_rhs_of_unity_integrates_to_area(self):
        """int 1 * phi_i sums to the domain measure (helmholtz.rs RHS)."""
        mesh = rectangular_mesh_triangles(0.0, 2.0, 0.0, 3.0, 8, 12)
        rhs = np.asarray(assemble_rhs(mesh, lambda x: jnp.ones(x.shape[:-1])))
        assert abs(rhs.sum() - 6.0) < 1e-10


class TestCircularMesh:
    def test_circular_mesh(self):
        """All nodes inside radius, positive areas, total area ~ pi r^2,
        boundary detected (generators.rs:171)."""
        mesh = circular_mesh_triangles(2.0, 8)
        r = np.linalg.norm(mesh.nodes, axis=1)
        assert r.max() <= 2.0 + 1e-12
        area = 0.0
        for el in mesh.elements:
            a, b, c = mesh.nodes[el]
            area += 0.5 * abs(np.cross(b - a, c - a))
        assert abs(area - np.pi * 4.0) / (np.pi * 4.0) < 0.05
        assert len(mesh.boundary_faces) > 0
        # boundary nodes sit on the circle
        bnodes = np.unique(np.asarray(mesh.boundary_faces)[:, :2])
        np.testing.assert_allclose(np.linalg.norm(mesh.nodes[bnodes], axis=1), 2.0, rtol=1e-6)


def _mms_solve(mesh, k, u_exact, f_fn):
    prob = HelmholtzProblem(
        mesh,
        wave_number=k,
        source_fn=f_fn,
        dirichlet=[DirichletBC(tag=t, value=u_exact) for t in np.unique(
            np.asarray(mesh.boundary_faces)[:, -1]
        )],
    )
    u, info = solve_helmholtz(prob, solver="gmres_jacobi")
    assert info["converged"]
    return l2_error_at_nodes(mesh, u, u_exact)


class TestManufacturedSolutions:
    """Method of manufactured solutions family
    (analytical_validation.rs:63-119 and the mms_* battery)."""

    def test_mms_linear_exact(self):
        """u = 2x + 3y is in the P1 space: the discrete solution must be
        nodally exact to solver tolerance (test_mms_polynomial analog)."""
        mesh = unit_square_triangles(8)
        k = 1.5

        def u_exact(x):
            return 2.0 * x[..., 0] + 3.0 * x[..., 1]

        def f_fn(x):  # -lap(u) - k^2 u = -k^2 u
            return -(k**2) * u_exact(x)

        err = _mms_solve(mesh, k, u_exact, f_fn)
        assert err < 1e-8, err

    def test_mms_sin_cos(self):
        """u = sin(pi x) cos(pi y), f = (2 pi^2 - k^2) u
        (test_mms_sin_cos), L2 < 0.02 at n=24 per the reference gate."""
        mesh = unit_square_triangles(24)
        k = 2.0

        def u_exact(x):
            return jnp.sin(np.pi * x[..., 0]) * jnp.cos(np.pi * x[..., 1])

        def f_fn(x):
            return (2.0 * np.pi**2 - k**2) * u_exact(x)

        err = _mms_solve(mesh, k, u_exact, f_fn)
        assert err < 0.02, err

    def test_mms_complex_valued(self):
        """Complex u = e^{i pi x} sin(pi y) (test_mms_complex_valued)."""
        mesh = unit_square_triangles(24)
        k = 2.0

        def u_exact(x):
            return jnp.exp(1j * np.pi * x[..., 0]) * jnp.sin(np.pi * x[..., 1])

        def f_fn(x):
            return (2.0 * np.pi**2 - k**2) * u_exact(x)

        err = _mms_solve(mesh, k, u_exact, f_fn)
        assert err < 0.02, err

    def test_mms_varying_wavenumber(self):
        """Accuracy holds across k (test_mms_varying_wavenumber): the
        pollution-free low-k regime stays under the P1 gate."""
        def u_exact(x):
            return jnp.sin(np.pi * x[..., 0]) * jnp.sin(np.pi * x[..., 1])

        for k in (0.5, 2.0, 4.0):
            mesh = unit_square_triangles(24)

            def f_fn(x, k=k):
                return (2.0 * np.pi**2 - k**2) * u_exact(x)

            err = _mms_solve(mesh, k, u_exact, f_fn)
            assert err < 0.03, (k, err)
