"""Incident fields (math-bem/src/core/incident.rs:17-317): plane waves
and point sources with pressure + normal-derivative evaluation, for the
RHS of the (Burton–Miller) collocation system."""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax.numpy as jnp

from mathaudio_tpu.xtypes import complex_dtype_for, default_float


@dataclasses.dataclass
class IncidentField:
    """kind: 'plane' (direction) or 'point' (position, amplitude)."""

    kind: str
    direction: Optional[np.ndarray] = None  # unit propagation direction
    position: Optional[np.ndarray] = None
    amplitude: complex = 1.0

    def pressure(self, points, k):
        points = jnp.asarray(points, default_float())
        cd = complex_dtype_for(points.dtype)
        if self.kind == "plane":
            d = jnp.asarray(self.direction, points.dtype)
            return jnp.asarray(self.amplitude, cd) * jnp.exp(
                1j * (k * (points @ d)).astype(cd)
            )
        src = jnp.asarray(self.position, points.dtype)
        rv = points - src
        r = jnp.linalg.norm(rv, axis=-1)
        rs = jnp.where(r < 1e-15, 1.0, r)
        return (
            jnp.asarray(self.amplitude, cd)
            * jnp.exp(1j * (k * rs).astype(cd))
            / (4.0 * jnp.pi * rs)
        )

    def normal_derivative(self, points, normals, k):
        """dp_inc/dn at the points (incident.rs:93)."""
        points = jnp.asarray(points, default_float())
        normals = jnp.asarray(normals, points.dtype)
        cd = complex_dtype_for(points.dtype)
        if self.kind == "plane":
            d = jnp.asarray(self.direction, points.dtype)
            p = self.pressure(points, k)
            return 1j * k * (normals @ d).astype(cd) * p
        src = jnp.asarray(self.position, points.dtype)
        rv = points - src
        r = jnp.linalg.norm(rv, axis=-1)
        rs = jnp.where(r < 1e-15, 1.0, r)
        p = self.pressure(points, k)
        r_dot_n = jnp.sum(rv * normals, axis=-1) / rs
        return (1j * k - 1.0 / rs).astype(cd) * p * r_dot_n.astype(cd)


def plane_wave(direction=(0.0, 0.0, 1.0), amplitude: complex = 1.0) -> IncidentField:
    d = np.asarray(direction, float)
    return IncidentField("plane", direction=d / np.linalg.norm(d), amplitude=amplitude)


def point_source(position, amplitude: complex = 1.0) -> IncidentField:
    return IncidentField("point", position=np.asarray(position, float), amplitude=amplitude)
