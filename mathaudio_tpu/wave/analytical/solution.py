"""AnalyticalSolution container + error metrics.

Counterpart of math-wave/src/analytical/mod.rs:104-190; positions and
pressures are device arrays rather than Vec<Point>/Vec<Complex64>.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax.numpy as jnp

from mathaudio_tpu.xtypes import SPEED_OF_SOUND


def l2_error(p, p_ref):
    """sqrt(sum |p - p_ref|^2) (analytical/mod.rs:163)."""
    d = jnp.asarray(p) - jnp.asarray(p_ref)
    return jnp.sqrt(jnp.sum(jnp.abs(d) ** 2))


def relative_l2_error(p, p_ref):
    """l2_error / ||p_ref||, falling back to absolute for tiny norms
    (analytical/mod.rs:176)."""
    err = l2_error(p, p_ref)
    norm = jnp.sqrt(jnp.sum(jnp.abs(jnp.asarray(p_ref)) ** 2))
    return jnp.where(norm < 1e-15, err, err / jnp.where(norm < 1e-15, 1.0, norm))


def linf_error(p, p_ref):
    """max |p - p_ref| (analytical/mod.rs:184)."""
    return jnp.max(jnp.abs(jnp.asarray(p) - jnp.asarray(p_ref)))


def from_spherical(r, theta, phi):
    """(r, theta, phi) -> (x, y, z), theta = polar angle from +z
    (analytical/mod.rs Point::from_spherical)."""
    r, theta, phi = jnp.asarray(r), jnp.asarray(theta), jnp.asarray(phi)
    st = jnp.sin(theta)
    return jnp.stack(
        [r * st * jnp.cos(phi), r * st * jnp.sin(phi), r * jnp.cos(theta)], axis=-1
    )


def from_polar(r, theta):
    """(r, theta) -> (x, y)."""
    r, theta = jnp.asarray(r), jnp.asarray(theta)
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


@dataclasses.dataclass
class AnalyticalSolution:
    """Named analytical solution on a set of evaluation points."""

    name: str
    dimensions: int
    positions: jnp.ndarray  # (N, dims)
    pressure: jnp.ndarray  # (N,) complex
    wave_number: float
    frequency: float
    metadata: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def magnitude(self):
        return jnp.abs(self.pressure)

    def phase(self):
        return jnp.angle(self.pressure)

    def real(self):
        return jnp.real(self.pressure)

    def imag(self):
        return jnp.imag(self.pressure)

    def l2_error(self, other: "AnalyticalSolution"):
        return l2_error(self.pressure, other.pressure)

    def relative_l2_error(self, other: "AnalyticalSolution"):
        return relative_l2_error(self.pressure, other.pressure)

    def linf_error(self, other: "AnalyticalSolution"):
        return linf_error(self.pressure, other.pressure)


def frequency_of(wave_number: float, c: float = SPEED_OF_SOUND) -> float:
    return float(wave_number) * c / (2.0 * jnp.pi)
