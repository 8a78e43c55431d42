"""Kirchhoff–Helmholtz field evaluation
(math-bem/src/core/postprocess/pressure.rs): exterior field from surface
pressure via the representation formula, as a second pairwise kernel.

For a rigid scatterer (dp/dn = 0 on the surface):
    p(x) = p_inc(x) + int_Gamma p(y) dG/dn_y(x, y) dS(y),  x exterior.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from mathaudio_tpu.bem.incident import IncidentField
from mathaudio_tpu.bem.mesh import SurfaceMesh
from mathaudio_tpu.xtypes import complex_dtype_for, default_float, pressure_to_spl


@dataclasses.dataclass
class FieldResult:
    """pressure.rs FieldPoint analog, vectorized."""

    points: jnp.ndarray
    p_inc: jnp.ndarray
    p_scat: jnp.ndarray

    @property
    def p_total(self):
        return self.p_inc + self.p_scat

    @property
    def spl_db(self):
        return pressure_to_spl(jnp.abs(self.p_total))


@jax.jit
def _scattered_at(points, qp, qw, normals, p_surf, k):
    cd = p_surf.dtype
    x = points[:, None, None, :]  # (M, 1, 1, 3)
    y = qp[None, :, :, :]  # (1, N, nq, 3)
    rv = y - x
    r = jnp.sqrt(jnp.sum(rv * rv, axis=-1))
    rs = jnp.where(r < 1e-15, 1.0, r)
    g = jnp.exp(1j * (k * rs).astype(cd)) / (4.0 * jnp.pi * rs)
    ik = jnp.asarray(1j * k, cd)
    r_dot_ny = jnp.sum(rv * normals[None, :, None, :], axis=-1)
    dg = (ik - 1.0 / rs) * g * r_dot_ny / rs
    # integral over each element, then weighted by surface pressure
    d_me = jnp.sum(dg * qw[None, :, :].astype(cd), axis=-1)  # (M, N)
    return d_me @ p_surf


def evaluate_field(
    mesh: SurfaceMesh,
    p_surf,
    points,
    k: float,
    incident: IncidentField,
    quad_order: int = 3,
    dtype=None,
) -> FieldResult:
    """Total/scattered pressure at exterior points (compute_total_field)."""
    dtype = dtype or default_float()
    points = jnp.asarray(points, dtype)
    qp, qw = mesh.quad_points(quad_order)
    p_scat = _scattered_at(
        points,
        jnp.asarray(qp, dtype),
        jnp.asarray(qw, dtype),
        jnp.asarray(mesh.normals, dtype),
        jnp.asarray(p_surf),
        k,
    )
    p_inc = incident.pressure(points, k)
    return FieldResult(points=points, p_inc=p_inc, p_scat=p_scat)
