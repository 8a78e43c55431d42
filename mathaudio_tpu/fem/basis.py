"""Lagrange shape functions tabulated at quadrature points.

Counterpart of math-fem/src/basis/lagrange.rs:56-171 and shape.rs. The
TPU build keeps shape values/gradients as small constant tensors so the
vmapped element kernel is pure tensor algebra; P1 simplices, bilinear
quads, trilinear hexes (P2/P3 via the same tabulation interface).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from mathaudio_tpu.fem.mesh import HEX, QUAD, TET, TRIANGLE
from mathaudio_tpu.fem.quadrature import hex_rule, quad_rule, tet_rule, triangle_rule


def shape_functions(element_type: str, pts: np.ndarray):
    """phi (nq, nv) and grad (nq, nv, dim) at reference points."""
    pts = np.atleast_2d(np.asarray(pts, float))
    nq = pts.shape[0]
    if element_type == TRIANGLE:
        x, y = pts[:, 0], pts[:, 1]
        phi = np.stack([1 - x - y, x, y], axis=1)
        grad = np.broadcast_to(
            np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]]), (nq, 3, 2)
        ).copy()
    elif element_type == TET:
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        phi = np.stack([1 - x - y - z, x, y, z], axis=1)
        grad = np.broadcast_to(
            np.array(
                [[-1.0, -1.0, -1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
            ),
            (nq, 4, 3),
        ).copy()
    elif element_type == QUAD:
        x, y = pts[:, 0], pts[:, 1]
        phi = 0.25 * np.stack(
            [(1 - x) * (1 - y), (1 + x) * (1 - y), (1 + x) * (1 + y), (1 - x) * (1 + y)],
            axis=1,
        )
        grad = 0.25 * np.stack(
            [
                np.stack([-(1 - y), -(1 - x)], axis=1),
                np.stack([(1 - y), -(1 + x)], axis=1),
                np.stack([(1 + y), (1 + x)], axis=1),
                np.stack([-(1 + y), (1 - x)], axis=1),
            ],
            axis=1,
        )
    elif element_type == HEX:
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        signs = np.array(
            [
                [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
                [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
            ],
            float,
        )
        phi = np.stack(
            [
                0.125 * (1 + sx * x) * (1 + sy * y) * (1 + sz * z)
                for sx, sy, sz in signs
            ],
            axis=1,
        )
        grad = np.stack(
            [
                np.stack(
                    [
                        0.125 * sx * (1 + sy * y) * (1 + sz * z),
                        0.125 * sy * (1 + sx * x) * (1 + sz * z),
                        0.125 * sz * (1 + sx * x) * (1 + sy * y),
                    ],
                    axis=1,
                )
                for sx, sy, sz in signs
            ],
            axis=1,
        )
    else:
        raise ValueError(element_type)
    return phi, grad


class ElementTable(NamedTuple):
    """Quadrature + tabulated shapes for one element type."""

    element_type: str
    dim: int
    nv: int
    points: np.ndarray  # (nq, dim)
    weights: np.ndarray  # (nq,)
    phi: np.ndarray  # (nq, nv)
    grad: np.ndarray  # (nq, nv, dim)


_RULES = {
    TRIANGLE: (triangle_rule, 2, 3, 2),
    TET: (tet_rule, 2, 4, 3),
    QUAD: (quad_rule, 2, 4, 2),
    HEX: (hex_rule, 2, 8, 3),
}


def element_tables(element_type: str, order: int = 2) -> ElementTable:
    rule_fn, _, nv, dim = _RULES[element_type]
    pts, w = rule_fn(order)
    phi, grad = shape_functions(element_type, pts)
    return ElementTable(element_type, dim, nv, pts, w, phi, grad)
