"""Scalar/dtype policy and shared physical constants.

Mirrors the role of the reference's ``ComplexField`` scalar abstraction
(math-solvers/src/traits.rs:28) and the physical constants in
math-xem-common/src/types.rs:263-312 — but as a dtype policy: every
numerical routine in this package is written dtype-generically and picks
its working precision from the enabled JAX x64 mode unless the caller
passes an explicit ``dtype``.

TPU guidance: f32/c64 for performance kernels (MXU/VPU native), f64/c128
for validation oracles (runs on CPU or emulated on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Physical constants (math-xem-common/src/types.rs:263-312)
SPEED_OF_SOUND = 343.0  # m/s at 20C
AIR_DENSITY = 1.204  # kg/m^3 at 20C
REFERENCE_PRESSURE = 20e-6  # Pa (0 dB SPL)


def x64_enabled() -> bool:
    return jax.config.jax_enable_x64


def default_float() -> jnp.dtype:
    """float64 when x64 is enabled (validation mode), else float32."""
    return jnp.dtype(jnp.float64) if x64_enabled() else jnp.dtype(jnp.float32)


def default_complex() -> jnp.dtype:
    return jnp.dtype(jnp.complex128) if x64_enabled() else jnp.dtype(jnp.complex64)


def complex_dtype_for(real_dtype) -> jnp.dtype:
    """Complex dtype matching a real dtype's precision."""
    real_dtype = jnp.dtype(real_dtype)
    if real_dtype in (jnp.dtype(jnp.float64),):
        return jnp.dtype(jnp.complex128)
    return jnp.dtype(jnp.complex64)


def real_dtype_for(complex_dtype) -> jnp.dtype:
    complex_dtype = jnp.dtype(complex_dtype)
    if complex_dtype == jnp.dtype(jnp.complex128):
        return jnp.dtype(jnp.float64)
    return jnp.dtype(jnp.float32)


def is_complex(x) -> bool:
    return jnp.issubdtype(jnp.asarray(x).dtype, jnp.complexfloating)


def wavenumber(frequency, speed_of_sound: float = SPEED_OF_SOUND):
    """k = 2*pi*f / c (math-xem-common/src/types.rs:289)."""
    return 2.0 * jnp.pi * jnp.asarray(frequency) / speed_of_sound


def pressure_to_spl(pressure_magnitude, p_ref: float = REFERENCE_PRESSURE):
    """SPL dB = 20 log10(|p| / p_ref) (math-xem-common/src/types.rs:296)."""
    p = jnp.maximum(jnp.asarray(pressure_magnitude), 1e-30)
    return 20.0 * jnp.log10(p / p_ref)


def log_space(start: float, stop: float, num: int, dtype=None):
    """Logarithmically spaced grid, endpoints inclusive (types.rs:303)."""
    dtype = dtype or default_float()
    return jnp.logspace(jnp.log10(start), jnp.log10(stop), num, dtype=dtype)


def lin_space(start: float, stop: float, num: int, dtype=None):
    dtype = dtype or default_float()
    return jnp.linspace(start, stop, num, dtype=dtype)
