"""2D analytical solutions (math-wave/src/analytical/solutions_2d.rs).

The rigid-cylinder plane-wave scattering series is evaluated as a single
contraction over orders (the all-order Bessel arrays come stacked), so
the whole oracle is one fused XLA computation.
"""

from __future__ import annotations

import jax.numpy as jnp

from mathaudio_tpu.wave.analytical.solution import (
    AnalyticalSolution,
    frequency_of,
    from_polar,
)
from mathaudio_tpu.wave.special.bessel import bessel_derivative_all, bessel_jn_yn_all
from mathaudio_tpu.xtypes import default_complex, default_float


def rigid_cylinder_coefficients(ka, num_terms: int, max_arg: float = 120.0):
    """a_n = -J_n'(ka)/H_n^(1)'(ka) * i^n for a rigid cylinder
    (solutions_2d.rs:138). Returns (num_terms,) complex."""
    ka = jnp.asarray(ka, default_float())
    j_all, y_all = bessel_jn_yn_all(num_terms, ka, max_arg=max_arg)
    jp = bessel_derivative_all(j_all, ka)[:num_terms]
    yp = bessel_derivative_all(y_all, ka)[:num_terms]
    hp = jp + 1j * yp
    n = jnp.arange(num_terms, dtype=default_float())
    i_pow_n = jnp.exp(1j * jnp.asarray(n * jnp.pi / 2.0, default_complex()))
    return -jp / hp * i_pow_n


def cylinder_scattering_2d(
    wave_number: float,
    radius: float,
    num_terms: int,
    r_points,
    theta_points,
    max_arg: float = 120.0,
):
    """Total field around a rigid cylinder hit by a +x plane wave:
    p = exp(ikr cos theta) + sum_n eps_n a_n H_n^(1)(kr) cos(n theta)
    (solutions_2d.rs:53). Grid = cartesian product r x theta."""
    r_points = jnp.asarray(r_points, default_float())
    theta_points = jnp.asarray(theta_points, default_float())
    ka = wave_number * radius
    a_n = rigid_cylinder_coefficients(ka, num_terms, max_arg=max_arg)

    kr = wave_number * r_points  # (R,)
    j_all, y_all = bessel_jn_yn_all(num_terms - 1, kr, max_arg=max_arg)
    h_all = (j_all + 1j * y_all)  # (num_terms, R)

    n = jnp.arange(num_terms, dtype=default_float())
    eps = jnp.where(n == 0, 1.0, 2.0)
    cosn = jnp.cos(n[:, None] * theta_points[None, :])  # (num_terms, T)

    # scattered(r, theta) = sum_n [eps_n a_n H_n(kr)] cos(n theta)
    weighted = (eps * a_n)[:, None] * h_all  # (num_terms, R)
    scattered = jnp.einsum("nr,nt->rt", weighted, cosn.astype(weighted.dtype))

    incident = jnp.exp(
        1j
        * jnp.asarray(
            kr[:, None] * jnp.cos(theta_points)[None, :], default_complex()
        )
    )
    total = (incident + scattered).reshape(-1)

    rr, tt = jnp.meshgrid(r_points, theta_points, indexing="ij")
    positions = from_polar(rr.reshape(-1), tt.reshape(-1))
    return AnalyticalSolution(
        name=f"2D Cylinder Scattering (ka={ka:.2f})",
        dimensions=2,
        positions=positions,
        pressure=total,
        wave_number=wave_number,
        frequency=frequency_of(wave_number),
        metadata={
            "radius": radius,
            "ka": ka,
            "num_terms": num_terms,
            "boundary_condition": "rigid",
            "regime": classify_regime_2d(ka),
        },
    )


def classify_regime_2d(ka: float) -> str:
    if ka < 0.3:
        return "Rayleigh (ka << 1)"
    if ka < 3.0:
        return "Resonance (ka ~ 1)"
    return "Geometric (ka >> 1)"


def cylinder_directivity_2d(
    wave_number: float, radius: float, num_terms: int, theta_points, max_arg: float = 120.0
):
    """D(theta) = sum_n eps_n a_n cos(n theta) (solutions_2d.rs:194)."""
    theta_points = jnp.asarray(theta_points, default_float())
    a_n = rigid_cylinder_coefficients(wave_number * radius, num_terms, max_arg=max_arg)
    n = jnp.arange(num_terms, dtype=default_float())
    eps = jnp.where(n == 0, 1.0, 2.0)
    cosn = jnp.cos(n[:, None] * theta_points[None, :])
    return jnp.einsum("n,nt->t", eps * a_n, cosn.astype(a_n.dtype))


def cylinder_scattering_cross_section_2d(
    wave_number: float, radius: float, num_terms: int, max_arg: float = 120.0
):
    """sigma = (4/k) sum_n eps_n |a_n|^2 (solutions_2d.rs:227)."""
    a_n = rigid_cylinder_coefficients(wave_number * radius, num_terms, max_arg=max_arg)
    n = jnp.arange(num_terms)
    eps = jnp.where(n == 0, 1.0, 2.0)
    return 4.0 / wave_number * jnp.sum(eps * jnp.abs(a_n) ** 2)


def plane_wave_2d(wave_number: float, direction: float, x_points, y_points):
    """p(x, y) = exp(ik (x cos t + y sin t)), grid = x cross y
    (solutions_2d.rs:254)."""
    x = jnp.asarray(x_points, default_float())
    y = jnp.asarray(y_points, default_float())
    xx, yy = jnp.meshgrid(x, y, indexing="ij")
    phase = wave_number * (xx * jnp.cos(direction) + yy * jnp.sin(direction))
    p = jnp.exp(1j * phase.reshape(-1).astype(default_complex()))
    positions = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)
    return AnalyticalSolution(
        name=f"2D Plane Wave (k={wave_number}, theta={direction:.2f})",
        dimensions=2,
        positions=positions,
        pressure=p,
        wave_number=wave_number,
        frequency=frequency_of(wave_number),
        metadata={"direction": direction, "wavelength": 2.0 * jnp.pi / wave_number},
    )
