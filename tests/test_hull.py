"""Quickhull vs scipy.spatial.ConvexHull + geometric identities
(math-convex-hull/tests pattern)."""

import numpy as np
import pytest
from scipy.spatial import ConvexHull as SciHull

from mathaudio_tpu.hull import (
    quickhull_3d,
    cube_points,
    sphere_points,
    random_points,
    hull_to_obj,
    hull_to_html,
)


class TestQuickhull:
    def test_cube(self):
        hull = quickhull_3d(cube_points(extra_interior=30))
        assert len(hull.vertices) == 8
        np.testing.assert_allclose(hull.volume(), 1.0, rtol=1e-12)
        np.testing.assert_allclose(hull.surface_area(), 6.0, rtol=1e-12)

    def test_tetra(self):
        pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.0]])
        hull = quickhull_3d(pts)
        assert hull.num_faces == 4
        np.testing.assert_allclose(hull.volume(), 1 / 6, rtol=1e-12)

    @pytest.mark.parametrize("n,seed", [(50, 0), (200, 1), (500, 2)])
    def test_vs_scipy_random(self, n, seed):
        pts = np.random.default_rng(seed).standard_normal((n, 3))
        ours = quickhull_3d(pts)
        ref = SciHull(pts)
        np.testing.assert_allclose(ours.volume(), ref.volume, rtol=1e-10)
        np.testing.assert_allclose(ours.surface_area(), ref.area, rtol=1e-10)
        assert set(ours.vertices.tolist()) == set(ref.vertices.tolist())

    def test_sphere_points(self):
        pts = sphere_points(150)
        hull = quickhull_3d(pts)
        # all points on the sphere are hull vertices
        assert len(hull.vertices) == 150

    def test_contains(self):
        hull = quickhull_3d(cube_points())
        assert hull.contains([0.5, 0.5, 0.5])
        assert not hull.contains([1.5, 0.5, 0.5])

    def test_dedup(self):
        pts = np.vstack([cube_points(), cube_points()])
        hull = quickhull_3d(pts)
        assert len(hull.vertices) == 8

    def test_degenerate_raises(self):
        flat = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0.0]])
        with pytest.raises(ValueError):
            quickhull_3d(flat)

    def test_exports(self):
        hull = quickhull_3d(cube_points())
        obj = hull_to_obj(hull)
        assert obj.count("v ") >= 8 and obj.count("f ") == hull.num_faces
        html = hull_to_html(hull)
        assert "mesh3d" in html


class TestScaleRobustness:
    """Scale-aware epsilon (math-convex-hull lib.rs:56-100): identical
    topology and correctly scaled volume at extreme coordinate scales."""

    @pytest.mark.parametrize("scale", [1e-6, 1.0, 1e6])
    def test_volume_scales_correctly(self, scale):
        pts = cube_points() * scale  # unit cube scaled
        h = quickhull_3d(pts)
        assert h.num_faces == 12
        np.testing.assert_allclose(h.volume(), scale**3, rtol=1e-9)

    def test_octahedron_volume(self):
        pts = np.array([[1,0,0],[-1,0,0],[0,1,0],[0,-1,0],[0,0,1],[0,0,-1]], float)
        h = quickhull_3d(pts)
        assert h.num_faces == 8
        np.testing.assert_allclose(h.volume(), 4.0/3.0, rtol=1e-12)

    def test_interior_points_ignored(self):
        rng = np.random.default_rng(7)
        inner = rng.uniform(0.3, 0.7, (200, 3))  # strictly inside the unit cube
        pts = np.vstack([cube_points(), inner])
        h = quickhull_3d(pts)
        assert h.num_faces == 12
        np.testing.assert_allclose(h.volume(), 1.0, rtol=1e-9)


class TestHullParity:
    """Reference hull checks not covered above (math-convex-hull tests:
    icosahedron, coplanarity, insufficient vertices, surface area,
    dense-sphere vertex extremality)."""

    def test_icosahedron(self):
        from mathaudio_tpu.hull.testdata import icosahedron_points

        pts = icosahedron_points()
        hull = quickhull_3d(pts)
        assert len(hull.vertices) == 12
        assert hull.num_faces == 20

    def test_coplanar_input_raises(self):
        pts = np.column_stack([np.random.default_rng(0).random((20, 2)), np.zeros(20)])
        with pytest.raises(ValueError):
            quickhull_3d(pts)

    def test_insufficient_vertices(self):
        with pytest.raises(ValueError):
            quickhull_3d(np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]))

    def test_cube_surface_area(self):
        from mathaudio_tpu.hull.testdata import cube_points

        hull = quickhull_3d(cube_points())
        assert abs(hull.surface_area() - 6.0) < 1e-12
        assert abs(hull.volume() - 1.0) < 1e-12

    def test_fibonacci_sphere_all_points_extreme(self):
        from mathaudio_tpu.hull.testdata import fibonacci_sphere_points

        pts = fibonacci_sphere_points(180, radius=2.0)
        hull = quickhull_3d(pts)
        assert len(hull.vertices) == 180
        # Euler: V - E + F = 2 with triangulated surface -> F = 2V - 4
        assert hull.num_faces == 2 * 180 - 4
        # volume/area approach the sphere's from inside
        assert 0.95 * (4 / 3) * np.pi * 8 < hull.volume() < (4 / 3) * np.pi * 8
        assert 0.95 * 4 * np.pi * 4 < hull.surface_area() < 4 * np.pi * 4
