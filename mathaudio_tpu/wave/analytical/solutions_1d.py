"""1D analytical solutions (math-wave/src/analytical/solutions_1d.rs)."""

from __future__ import annotations

import jax.numpy as jnp

from mathaudio_tpu.wave.analytical.solution import AnalyticalSolution, frequency_of
from mathaudio_tpu.xtypes import default_complex, default_float


def _grid(x_min: float, x_max: float, num_points: int):
    return jnp.linspace(x_min, x_max, num_points, dtype=default_float())


def plane_wave_1d(wave_number: float, x_min: float, x_max: float, num_points: int):
    """p(x) = exp(ikx) (solutions_1d.rs:34)."""
    x = _grid(x_min, x_max, num_points)
    p = jnp.exp(1j * jnp.asarray(wave_number * x, default_complex()))
    return AnalyticalSolution(
        name=f"1D Plane Wave (k={wave_number})",
        dimensions=1,
        positions=x[:, None],
        pressure=p,
        wave_number=wave_number,
        frequency=frequency_of(wave_number),
        metadata={"x_min": x_min, "x_max": x_max},
    )


def standing_wave_1d(wave_number: float, x_min: float, x_max: float, num_points: int):
    """p(x) = i sin(kx) (solutions_1d.rs:97 stores sin(kx) in Im)."""
    x = _grid(x_min, x_max, num_points)
    p = (1j * jnp.sin(wave_number * x)).astype(default_complex())
    return AnalyticalSolution(
        name=f"1D Standing Wave (k={wave_number})",
        dimensions=1,
        positions=x[:, None],
        pressure=p,
        wave_number=wave_number,
        frequency=frequency_of(wave_number),
        metadata={"x_min": x_min, "x_max": x_max},
    )


def damped_wave_1d(
    wave_number: float, absorption: float, x_min: float, x_max: float, num_points: int
):
    """p(x) = exp(-alpha x) exp(ikx) (solutions_1d.rs:162)."""
    x = _grid(x_min, x_max, num_points)
    p = jnp.exp(-absorption * x) * jnp.exp(
        1j * jnp.asarray(wave_number * x, default_complex())
    )
    return AnalyticalSolution(
        name=f"1D Damped Wave (k={wave_number}, alpha={absorption})",
        dimensions=1,
        positions=x[:, None],
        pressure=p,
        wave_number=wave_number,
        frequency=frequency_of(wave_number),
        metadata={
            "absorption": absorption,
            "penetration_depth": (1.0 / absorption) if absorption > 0 else float("inf"),
            "quality_factor": wave_number / (2.0 * absorption) if absorption > 0 else float("inf"),
        },
    )


def helmholtz_1d_mode(wave_number: float, length: float, mode_number: int, num_points: int):
    """u'' + k^2 u = sin(n pi x / L), u(0)=u(L)=0
    => u = sin(n pi x/L) / (k^2 - (n pi/L)^2) (solutions_1d.rs:221)."""
    assert mode_number >= 1
    kn = mode_number * jnp.pi / length
    denom = wave_number**2 - float(kn) ** 2
    assert abs(denom) > 1e-10, "Resonance: k ~= n pi / L"
    x = _grid(0.0, length, num_points)
    u = jnp.sin(mode_number * jnp.pi * x / length) / denom
    return AnalyticalSolution(
        name=f"1D Helmholtz Mode (k={wave_number}, n={mode_number})",
        dimensions=1,
        positions=x[:, None],
        pressure=u.astype(default_complex()),
        wave_number=wave_number,
        frequency=frequency_of(wave_number),
        metadata={"length": length, "mode_number": mode_number},
    )
