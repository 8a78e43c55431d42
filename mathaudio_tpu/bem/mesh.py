"""Surface meshes for BEM (math-bem/src/core/mesh/: element.rs,
generators.rs). Constant triangular elements, struct-of-arrays layout:
everything the kernels need (centers, normals, areas, quadrature points)
is precomputed into flat device-ready arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from mathaudio_tpu.fem.mesh import _icosphere_surface
from mathaudio_tpu.fem.quadrature import triangle_rule


@dataclasses.dataclass
class SurfaceMesh:
    """Triangulated closed surface; normals point away from the body
    (into the exterior acoustic domain)."""

    nodes: np.ndarray  # (Nn, 3)
    elements: np.ndarray  # (N, 3) int

    def __post_init__(self):
        pts = self.nodes[self.elements]  # (N, 3, 3)
        v1 = pts[:, 1] - pts[:, 0]
        v2 = pts[:, 2] - pts[:, 0]
        cr = np.cross(v1, v2)
        nrm = np.linalg.norm(cr, axis=1)
        self.areas = 0.5 * nrm
        self.normals = cr / np.maximum(nrm, 1e-300)[:, None]
        self.centers = pts.mean(axis=1)

    @property
    def num_elements(self) -> int:
        return len(self.elements)

    def avg_element_size(self) -> float:
        return float(np.sqrt(self.areas.mean()))

    def quad_points(self, order: int = 3):
        """Gauss points/weights on every element: returns
        (points (N, nq, 3), weights (N, nq)) with weights including the
        2*area Jacobian (so sum(w) = element area)."""
        ref_pts, ref_w = triangle_rule(order)
        pts = self.nodes[self.elements]  # (N, 3, 3)
        l1 = ref_pts[:, 0]
        l2 = ref_pts[:, 1]
        l0 = 1.0 - l1 - l2
        shape = np.stack([l0, l1, l2], axis=1)  # (nq, 3)
        qp = np.einsum("qv,nvd->nqd", shape, pts)
        qw = (2.0 * self.areas)[:, None] * ref_w[None, :]
        return qp, qw

    def orient_outward(self, interior_point=(0.0, 0.0, 0.0)) -> "SurfaceMesh":
        """Flip elements whose normal points toward the interior point."""
        to_center = self.centers - np.asarray(interior_point)[None, :]
        flip = np.einsum("nd,nd->n", to_center, self.normals) < 0
        elems = self.elements.copy()
        elems[flip] = elems[flip][:, [0, 2, 1]]
        return SurfaceMesh(self.nodes, elems)


def icosphere(radius: float = 1.0, subdivisions: int = 2) -> SurfaceMesh:
    """Icosphere (mesh/generators.rs:110 analog): 20 * 4^s triangles."""
    verts, faces = _icosphere_surface(subdivisions)
    return SurfaceMesh(radius * verts, faces).orient_outward()


def uv_sphere(radius: float = 1.0, n_theta: int = 12, n_phi: int = 24) -> SurfaceMesh:
    """Latitude-longitude sphere (mesh/generators.rs:29)."""
    nodes = [np.array([0.0, 0.0, radius]), np.array([0.0, 0.0, -radius])]
    ring_ids = []
    for i in range(1, n_theta):
        theta = np.pi * i / n_theta
        ring = []
        for j in range(n_phi):
            phi = 2 * np.pi * j / n_phi
            ring.append(len(nodes))
            nodes.append(
                radius
                * np.array(
                    [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)]
                )
            )
        ring_ids.append(ring)
    faces = []
    top, bottom = 0, 1
    for j in range(n_phi):
        faces.append([top, ring_ids[0][j], ring_ids[0][(j + 1) % n_phi]])
        faces.append([bottom, ring_ids[-1][(j + 1) % n_phi], ring_ids[-1][j]])
    for i in range(len(ring_ids) - 1):
        for j in range(n_phi):
            a, b = ring_ids[i][j], ring_ids[i][(j + 1) % n_phi]
            c, d = ring_ids[i + 1][j], ring_ids[i + 1][(j + 1) % n_phi]
            faces.append([a, c, d])
            faces.append([a, d, b])
    return SurfaceMesh(np.asarray(nodes), np.asarray(faces, np.int64)).orient_outward()


def cylinder_mesh(
    radius: float = 1.0,
    height: float = 2.0,
    n_circ: int = 24,
    n_height: int = 8,
    closed: bool = True,
) -> SurfaceMesh:
    """Open/closed cylinder along z (mesh/generators.rs:242,287)."""
    nodes = []
    rings = []
    for i in range(n_height + 1):
        z = -height / 2 + height * i / n_height
        ring = []
        for j in range(n_circ):
            phi = 2 * np.pi * j / n_circ
            ring.append(len(nodes))
            nodes.append([radius * np.cos(phi), radius * np.sin(phi), z])
        rings.append(ring)
    faces = []
    for i in range(n_height):
        for j in range(n_circ):
            a, b = rings[i][j], rings[i][(j + 1) % n_circ]
            c, d = rings[i + 1][j], rings[i + 1][(j + 1) % n_circ]
            faces.append([a, b, d])
            faces.append([a, d, c])
    if closed:
        top_c = len(nodes)
        nodes.append([0.0, 0.0, height / 2])
        bot_c = len(nodes)
        nodes.append([0.0, 0.0, -height / 2])
        for j in range(n_circ):
            faces.append([top_c, rings[-1][j], rings[-1][(j + 1) % n_circ]])
            faces.append([bot_c, rings[0][(j + 1) % n_circ], rings[0][j]])
    return SurfaceMesh(np.asarray(nodes, float), np.asarray(faces, np.int64)).orient_outward()
