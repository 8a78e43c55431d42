"""Quasi-singular quadrature accuracy (VERDICT r1 items 5-6).

Quantifies what the reference handles with distance-adaptive quadrature
order (math-bem/src/core/integration/regular.rs:275) and what our static
design does instead:

1. The fixed Gauss rule's *per-entry* error on edge-adjacent pairs is
   large (~9% at quad_order 3, measured vs a depth-4 subdivided
   reference) — this is real and measured here.
2. The assembly's exact static row-sum regularization
   (bem/assembly._assemble_rows) absorbs almost all of it at the
   *solution* level: recomputing every near pair with a subdivided rule
   while preserving the row sums (apply_near_pair_upgrade) moves the
   sphere-scattering error by only a few percent relative.
3. Sphere-scattering accuracy is therefore gated far tighter than the
   reference's rel<0.5 acceptance (test_bem_sphere_integration.rs:110):
   0.01 / 0.03 / 0.10 at ka = 0.5 / 2 / 5 on the 320-element mesh.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mathaudio_tpu.bem import plane_wave
from mathaudio_tpu.bem.assembly import (
    _near_pairs,
    _pair_kernels,
    apply_near_pair_upgrade,
    assemble_burton_miller,
    assemble_collocation_matrix,
)
from mathaudio_tpu.bem.mesh import SurfaceMesh, icosphere
from mathaudio_tpu.solvers.direct import lu_solve
from mathaudio_tpu.wave.analytical.solutions_3d import sphere_scattering_3d


def _exact_surface(ka, surf, num_terms=40):
    """Mie oracle at the element centers, grouped by (near-identical)
    center radius so the series evaluates vectorized per radius class."""
    c = surf.centers
    r = np.linalg.norm(c, axis=1)
    th = np.arccos(np.clip(c[:, 2] / r, -1, 1))
    out = np.empty(len(c), complex)
    for rv in np.unique(np.round(r, 9)):
        m = np.abs(r - rv) < 1e-8
        vals = np.asarray(
            sphere_scattering_3d(ka, 1.0, num_terms, [rv], th[m]).pressure
        ).reshape(-1)
        out[m] = vals
    return out


def _entry(surf, i, j, qp, qw, k):
    """Production off-diagonal kernel entry sum_q w dG/dn_y (and hyper)."""
    x = jnp.asarray(surf.centers[i])[None, None, None, :]
    nx = jnp.asarray(surf.normals[i])[None, None, None, :]
    y = jnp.asarray(qp[j])[None, None, :, :]
    ny = jnp.asarray(surf.normals[j])[None, None, None, :]
    dg, hyp = _pair_kernels(x, nx, y, ny, k)
    w = jnp.asarray(qw[j])[None, None, :]
    return complex(jnp.sum(dg * w)), complex(jnp.sum(hyp * w))


@pytest.fixture(scope="module")
def sphere320():
    return icosphere(1.0, 2)


def _adjacent_pair(surf):
    from collections import defaultdict

    edge_map = defaultdict(list)
    for ei, tri in enumerate(surf.elements):
        for a in range(3):
            e = tuple(sorted((int(tri[a]), int(tri[(a + 1) % 3]))))
            edge_map[e].append(ei)
    return next(v for v in edge_map.values() if len(v) == 2)


class TestAdjacentPairEntryError:
    """Edge-adjacent element-pair integration error vs a refined
    (depth-4 subdivided, 256 sub-triangles) reference, quad_order 3/4
    (the reference's adaptive orders are 4/7/13 by distance)."""

    def test_entry_error_quantified(self, sphere320):
        surf, k = sphere320, 2.0
        i, j = _adjacent_pair(surf)
        qpr, qwr = surf.quad_points_refined(order=3, depth=4)
        ref_d, ref_t = _entry(surf, i, j, qpr, qwr, k)

        errs = {}
        for order in (3, 4):
            qp, qw = surf.quad_points(order)
            d, t = _entry(surf, i, j, qp, qw, k)
            errs[order] = (abs(d - ref_d) / abs(ref_d), abs(t - ref_t) / abs(ref_t))
        # measured: ~8.7% / 8.3% at order 3; ~2.6% at order 4
        assert errs[3][0] < 0.15 and errs[3][1] < 0.15
        assert errs[4][0] < 0.05 and errs[4][1] < 0.05
        assert errs[4][0] < errs[3][0]

    def test_refined_rule_converges(self, sphere320):
        """Subdivision depth is the convergence knob: depth-3 agrees
        with depth-5 to < 0.2% on the adjacent-pair entry."""
        surf, k = sphere320, 2.0
        i, j = _adjacent_pair(surf)
        vals = []
        for depth in (3, 5):
            qp, qw = surf.quad_points_refined(order=3, depth=depth)
            vals.append(_entry(surf, i, j, qp, qw, k)[0])
        assert abs(vals[0] - vals[1]) / abs(vals[1]) < 2e-3


class TestRowSumAbsorption:
    """The exact-row-sum regularization absorbs near-pair quadrature
    error at the solution level: the (row-sum preserving) near-pair
    upgrade changes the sphere solution error only marginally."""

    @pytest.mark.parametrize("ka", [0.5, 2.0])
    def test_upgrade_is_marginal(self, sphere320, ka):
        surf = sphere320
        inc = plane_wave((0.0, 0.0, 1.0))
        ex = _exact_surface(ka, surf)
        a0 = assemble_collocation_matrix(surf, ka)
        rhs = inc.pressure(jnp.asarray(surf.centers), ka)
        e0 = np.linalg.norm(np.asarray(lu_solve(a0, rhs)) - ex) / np.linalg.norm(ex)
        a1 = apply_near_pair_upgrade(a0, surf, ka)
        e1 = np.linalg.norm(np.asarray(lu_solve(a1, rhs)) - ex) / np.linalg.norm(ex)
        # both tight, and the upgrade does not move the error much:
        # quadrature is NOT the accuracy bottleneck (discretization is)
        assert e0 < 0.03 and e1 < 0.03
        assert abs(e1 - e0) < 0.5 * max(e0, 1e-4)

    def test_near_pairs_found(self, sphere320):
        pi, pj = _near_pairs(sphere320)
        per_elem = len(pi) / sphere320.num_elements
        assert 6 <= per_elem <= 20  # edge + vertex neighbors, both directions


class TestSphereConvergenceTight:
    """Sphere scattering across regimes with gates ~50x tighter than the
    reference's rel<0.5 coarse-mesh acceptance."""

    @pytest.mark.parametrize("ka,gate", [(0.5, 0.01), (2.0, 0.03), (5.0, 0.10)])
    def test_burton_miller_accuracy(self, sphere320, ka, gate):
        surf = sphere320
        inc = plane_wave((0.0, 0.0, 1.0))
        beta = 0.3j / (ka + 1.0)
        a = assemble_burton_miller(surf, ka, beta)
        centers = jnp.asarray(surf.centers)
        normals = jnp.asarray(surf.normals)
        rhs = inc.pressure(centers, ka) - beta * inc.normal_derivative(
            centers, normals, ka
        )
        p = np.asarray(lu_solve(a, rhs))
        ex = _exact_surface(ka, surf)
        rel = np.linalg.norm(p - ex) / np.linalg.norm(ex)
        assert rel < gate, f"ka={ka}: rel {rel:.4f} >= {gate}"

    def test_quad_order_insensitive(self, sphere320):
        """Solution error at quad_order 3 vs 6 differs by < 25% relative:
        the error is discretization-dominated, validating the fixed-rule
        design against the reference's adaptive orders."""
        surf, ka = sphere320, 2.0
        inc = plane_wave((0.0, 0.0, 1.0))
        ex = _exact_surface(ka, surf)
        errs = []
        for q in (3, 6):
            a = assemble_collocation_matrix(surf, ka, quad_order=q)
            rhs = inc.pressure(jnp.asarray(surf.centers), ka)
            p = np.asarray(lu_solve(a, rhs))
            errs.append(np.linalg.norm(p - ex) / np.linalg.norm(ex))
        assert abs(errs[0] - errs[1]) < 0.25 * max(errs)

    def test_h_convergence(self):
        """Error decreases with mesh refinement at ka=2 (subdiv 2 -> 3)."""
        inc = plane_wave((0.0, 0.0, 1.0))
        ka = 2.0
        errs = []
        for subdiv in (2, 3):
            surf = icosphere(1.0, subdiv)
            a = assemble_collocation_matrix(surf, ka)
            rhs = inc.pressure(jnp.asarray(surf.centers), ka)
            p = np.asarray(lu_solve(a, rhs))
            ex = _exact_surface(ka, surf)
            errs.append(np.linalg.norm(p - ex) / np.linalg.norm(ex))
        assert errs[1] < 0.6 * errs[0], errs
