"""FEM refinement + PML.

Mirrors refinement.rs tests (children partition parents, conformity)
and validates PML by absorbing an outgoing 1D-like wave in a strip.
"""

import jax.numpy as jnp
import numpy as np

from mathaudio_tpu.fem import rectangular_mesh_triangles, unit_square_triangles, unit_cube_tetrahedra
from mathaudio_tpu.fem.mesh import Mesh
from mathaudio_tpu.fem.pml import PmlRegion, assemble_pml_values, pml_box_regions
from mathaudio_tpu.fem.refinement import (
    adaptive_refine,
    dorfler_mark,
    residual_indicator,
    uniform_refine,
)
from mathaudio_tpu.solvers import lu_solve
from mathaudio_tpu.fem.boundary import DirichletBC, dirichlet_mask_and_values


def _conforming(mesh: Mesh) -> bool:
    """Every interior edge/face shared by exactly <= 2 elements and node
    set consistent (no hanging nodes for simplices = every edge of every
    element appears in the global unique edge set shared by its
    neighbors)."""
    from mathaudio_tpu.fem.refinement import _TET_EDGES, _TRI_EDGES

    edge_local = _TRI_EDGES if mesh.element_type == "triangle" else _TET_EDGES
    faces = np.sort(mesh.elements[:, edge_local].reshape(-1, 2), axis=1)
    uniq, counts = np.unique(faces, axis=0, return_counts=True)
    # for a conforming simplex mesh edges may be shared by many elements
    # (3D) — conformity check: midpoint of every edge is NOT a mesh node
    mids = 0.5 * (mesh.nodes[uniq[:, 0]] + mesh.nodes[uniq[:, 1]])
    key_nodes = {tuple(np.round(p, 9)) for p in mesh.nodes}
    hanging = sum(1 for m in mids if tuple(np.round(m, 9)) in key_nodes)
    return hanging == 0


class TestRefinement:
    def test_uniform_tri_counts_and_area(self):
        m = unit_square_triangles(3)
        r = uniform_refine(m)
        assert r.num_elements == 4 * m.num_elements
        np.testing.assert_allclose(r.element_measures().sum(), 1.0, atol=1e-12)
        assert _conforming(r)

    def test_uniform_tet_counts_and_volume(self):
        m = unit_cube_tetrahedra(2)
        r = uniform_refine(m)
        assert r.num_elements == 8 * m.num_elements
        np.testing.assert_allclose(r.element_measures().sum(), 1.0, atol=1e-12)
        assert (r.element_measures() > 1e-12).all()
        assert _conforming(r)

    def test_dorfler_marking(self):
        eta = np.array([10.0, 1.0, 1.0, 1.0, 0.5, 0.5])
        mask = dorfler_mark(eta, theta=0.6)
        assert mask[0] and mask.sum() <= 2

    def test_adaptive_refine_conforming(self):
        m = unit_square_triangles(4)
        eta = np.zeros(m.num_elements)
        eta[:4] = 1.0  # localized error
        r = adaptive_refine(m, eta, theta=0.9)
        assert r.num_elements > m.num_elements
        np.testing.assert_allclose(r.element_measures().sum(), 1.0, atol=1e-12)
        assert _conforming(r)

    def test_residual_indicator_shape(self):
        m = unit_square_triangles(4)
        u = jnp.ones(m.num_nodes)
        eta = residual_indicator(m, u, 2.0)
        assert eta.shape == (m.num_elements,)
        assert (np.asarray(eta) >= 0).all()


class TestPml:
    def test_pml_reduces_to_plain_outside_layer(self):
        m = unit_square_triangles(8)
        k = 3.0
        regions = [PmlRegion(0, +1, 0.75, 0.25, sigma_max=10.0)]
        csr, k_vals, m_vals = assemble_pml_values(m, regions, k)
        from mathaudio_tpu.fem.assembly import assemble_stiffness_mass

        csr0, k0, m0, _ = assemble_stiffness_mass(m)
        # entries whose row AND col nodes lie outside the layer are equal
        outside = m.nodes[:, 0] < 0.7
        rows = np.repeat(np.arange(m.num_nodes), np.diff(csr.indptr))
        sel = outside[rows] & outside[csr.indices]
        np.testing.assert_allclose(
            np.asarray(k_vals)[sel], np.asarray(k0)[sel], atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(m_vals)[sel], np.asarray(m0)[sel], atol=1e-12
        )

    def test_pml_absorbs_outgoing_wave(self):
        """1D waveguide: wave e^{ikx} launched at x=0 into a PML at the
        right end; with a good PML the reflected wave is tiny, so the
        solution stays close to a pure right-going wave in the interior.
        """
        k = 6.0
        m = rectangular_mesh_triangles(0.0, 3.0, 0.0, 0.1, 120, 2)
        regions = [PmlRegion(0, +1, 2.0, 1.0, sigma_max=4.0 * k, order=2)]
        csr, k_vals, m_vals = assemble_pml_values(m, regions, k)
        vals = np.asarray(k_vals) - k**2 * np.asarray(m_vals)

        n = m.num_nodes
        a = np.zeros((n, n), complex)
        rows = np.repeat(np.arange(n), np.diff(csr.indptr))
        a[rows, csr.indices] += vals

        # Dirichlet u=1 at x=0 (launch), u=0 at x=3 (deep in the PML)
        left = np.abs(m.nodes[:, 0]) < 1e-12
        right = np.abs(m.nodes[:, 0] - 3.0) < 1e-12
        g = np.zeros(n, complex)
        g[left] = 1.0
        fixed = left | right
        b = -a[:, fixed] @ g[fixed]
        b[fixed] = g[fixed]
        a[fixed, :] = 0.0
        a[:, fixed] = 0.0
        a[fixed, fixed] = 1.0

        u = np.asarray(lu_solve(jnp.asarray(a), jnp.asarray(b)))
        # in the physical region the solution should be ~ e^{ikx}:
        # |u| constant ~= 1 (standing-wave ripple = reflection measure)
        interior = (m.nodes[:, 0] > 0.2) & (m.nodes[:, 0] < 1.8)
        mags = np.abs(u[interior])
        ripple = (mags.max() - mags.min()) / mags.mean()
        assert ripple < 0.12, ripple  # < ~6% amplitude reflection
        np.testing.assert_allclose(mags.mean(), 1.0, atol=0.1)


class TestP2Elements:
    def test_p2_shape_partition_of_unity(self):
        from mathaudio_tpu.fem.basis import shape_functions
        import numpy as _np

        pts = _np.array([[0.2, 0.3], [0.1, 0.05], [1 / 3, 1 / 3]])
        phi, grad = shape_functions("triangle6", pts)
        _np.testing.assert_allclose(phi.sum(axis=1), 1.0, atol=1e-13)
        _np.testing.assert_allclose(grad.sum(axis=1), 0.0, atol=1e-13)
        pts3 = _np.array([[0.2, 0.3, 0.1], [0.25, 0.25, 0.25]])
        phi3, grad3 = shape_functions("tet10", pts3)
        _np.testing.assert_allclose(phi3.sum(axis=1), 1.0, atol=1e-13)
        _np.testing.assert_allclose(grad3.sum(axis=1), 0.0, atol=1e-13)

    def test_p2_mass_total(self):
        from mathaudio_tpu.fem.assembly import HelmholtzAssembler
        from mathaudio_tpu.fem.refinement import to_p2

        m2 = to_p2(unit_square_triangles(4))
        asm = HelmholtzAssembler(m2)
        np.testing.assert_allclose(float(jnp.sum(asm.m_vals)), 1.0, atol=1e-12)
        m3 = to_p2(unit_cube_tetrahedra(2))
        asm3 = HelmholtzAssembler(m3)
        np.testing.assert_allclose(float(jnp.sum(asm3.m_vals)), 1.0, atol=1e-10)

    def test_p2_beats_p1(self):
        """Quadratic elements cut the plane-wave L2 error by >~5x on the
        same mesh (analytical_validation.rs P2 expectations)."""
        from mathaudio_tpu.fem import HelmholtzProblem, solve_helmholtz
        from mathaudio_tpu.fem.boundary import DirichletBC
        from mathaudio_tpu.fem.problem import l2_error_at_nodes
        from mathaudio_tpu.fem.refinement import to_p2

        k = 2.0
        kx, ky = k * 0.6, k * 0.8

        def exact(x):
            return jnp.exp(1j * (kx * x[..., 0] + ky * x[..., 1]))

        errs = {}
        for name, mesh in [
            ("p1", unit_square_triangles(8)),
            ("p2", to_p2(unit_square_triangles(8))),
        ]:
            bcs = [DirichletBC(t, exact) for t in (1, 2, 3, 4)]
            prob = HelmholtzProblem(mesh, k, dirichlet=bcs)
            u, info = solve_helmholtz(prob, "direct")
            errs[name] = float(l2_error_at_nodes(mesh, u, exact))
        assert errs["p2"] < errs["p1"] / 5.0, errs


class TestP3Elements:
    def test_p3_partition_of_unity(self):
        from mathaudio_tpu.fem.basis import shape_functions
        pts = np.array([[0.2, 0.3], [0.05, 0.9], [1 / 3, 1 / 3]])
        phi, grad = shape_functions("triangle10", pts)
        np.testing.assert_allclose(phi.sum(axis=1), 1.0, atol=1e-12)
        np.testing.assert_allclose(grad.sum(axis=1), 0.0, atol=1e-12)

    def test_p3_nodal_property(self):
        # phi_i(node_j) = delta_ij on the reference element
        from mathaudio_tpu.fem.basis import shape_functions
        nodes = np.array(
            [[0, 0], [1, 0], [0, 1],
             [1/3, 0], [2/3, 0],
             [2/3, 1/3], [1/3, 2/3],
             [0, 2/3], [0, 1/3],
             [1/3, 1/3]], float,
        )
        phi, _ = shape_functions("triangle10", nodes)
        np.testing.assert_allclose(phi, np.eye(10), atol=1e-12)

    def test_p3_beats_p2(self):
        from mathaudio_tpu.fem import HelmholtzProblem, solve_helmholtz
        from mathaudio_tpu.fem.boundary import DirichletBC
        from mathaudio_tpu.fem.problem import l2_error_at_nodes
        from mathaudio_tpu.fem.refinement import to_p2, to_p3

        k = 2.0
        kx, ky = k * 0.6, k * 0.8

        def exact(x):
            return jnp.exp(1j * (kx * x[..., 0] + ky * x[..., 1]))

        errs = {}
        for name, mesh in [
            ("p2", to_p2(unit_square_triangles(6))),
            ("p3", to_p3(unit_square_triangles(6))),
        ]:
            bcs = [DirichletBC(t, exact) for t in (1, 2, 3, 4)]
            prob = HelmholtzProblem(mesh, k, dirichlet=bcs)
            u, info = solve_helmholtz(prob, "direct")
            errs[name] = float(l2_error_at_nodes(mesh, u, exact))
        assert errs["p3"] < errs["p2"] / 3.0, errs


class TestP3Tets:
    def test_tet20_nodal_and_unity(self):
        from mathaudio_tpu.fem.basis import shape_functions

        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
        nodes = list(verts)
        for a, b in [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]:
            nodes.append((2 * verts[a] + verts[b]) / 3)
            nodes.append((verts[a] + 2 * verts[b]) / 3)
        for a, b, c in [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]:
            nodes.append((verts[a] + verts[b] + verts[c]) / 3)
        phi, grad = shape_functions("tet20", np.asarray(nodes))
        np.testing.assert_allclose(phi, np.eye(20), atol=1e-12)
        pts = np.random.default_rng(0).random((6, 3)) * 0.25
        phi, grad = shape_functions("tet20", pts)
        np.testing.assert_allclose(phi.sum(axis=1), 1.0, atol=1e-12)
        np.testing.assert_allclose(grad.sum(axis=1), 0.0, atol=1e-12)

    def test_tet20_mass_and_stiffness(self):
        from mathaudio_tpu.fem.assembly import HelmholtzAssembler
        from mathaudio_tpu.fem.refinement import to_p3
        import scipy.sparse as sp

        m = to_p3(unit_cube_tetrahedra(2))
        asm = HelmholtzAssembler(m)
        np.testing.assert_allclose(float(jnp.sum(asm.m_vals)), 1.0, atol=1e-12)
        K = sp.csr_matrix(
            (np.asarray(asm.k_vals), np.asarray(asm.csr.indices), np.asarray(asm.csr.indptr))
        )
        assert np.abs(K @ np.ones(m.num_nodes)).max() < 1e-12

    def test_p3_beats_p2_3d(self):
        from mathaudio_tpu.fem import HelmholtzProblem, solve_helmholtz
        from mathaudio_tpu.fem.boundary import DirichletBC
        from mathaudio_tpu.fem.problem import l2_error_at_nodes
        from mathaudio_tpu.fem.refinement import to_p2, to_p3

        k = 2.0
        kd = k * np.array([0.48, 0.6, 0.64])

        def exact(x):
            return jnp.exp(
                1j * (kd[0] * x[..., 0] + kd[1] * x[..., 1] + kd[2] * x[..., 2])
            )

        errs = {}
        for name, mesh in [
            ("p2", to_p2(unit_cube_tetrahedra(3))),
            ("p3", to_p3(unit_cube_tetrahedra(3))),
        ]:
            bcs = [DirichletBC(t, exact) for t in (1, 2, 3, 4, 5, 6)]
            u, info = solve_helmholtz(HelmholtzProblem(mesh, k, dirichlet=bcs), "direct")
            errs[name] = float(l2_error_at_nodes(mesh, u, exact))
        assert errs["p3"] < errs["p2"] / 3.0, errs


class TestHighOrderBoundary:
    def test_boundary_mass_totals(self):
        """Robin/Neumann face mass on P2/P3 meshes: sum_ij B = |Gamma_tag|
        (unit side faces of the unit square/cube)."""
        from mathaudio_tpu.fem.assembly import HelmholtzAssembler, assemble_boundary_mass
        from mathaudio_tpu.fem.refinement import to_p2, to_p3

        cases = [
            to_p2(unit_square_triangles(4)),
            to_p3(unit_square_triangles(4)),
            to_p2(unit_cube_tetrahedra(2)),
            to_p3(unit_cube_tetrahedra(2)),
        ]
        for mesh in cases:
            asm = HelmholtzAssembler(mesh)
            b = assemble_boundary_mass(mesh, 1, asm.csr)
            np.testing.assert_allclose(float(jnp.sum(b)), 1.0, atol=1e-9)
