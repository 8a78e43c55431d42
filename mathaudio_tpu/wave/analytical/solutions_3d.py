"""3D analytical solutions — Mie sphere scattering and friends
(math-wave/src/analytical/solutions_3d.rs)."""

from __future__ import annotations

import jax.numpy as jnp

from mathaudio_tpu.wave.analytical.solution import (
    AnalyticalSolution,
    frequency_of,
    from_spherical,
)
from mathaudio_tpu.wave.special.legendre import legendre_all
from mathaudio_tpu.wave.special.spherical import (
    spherical_bessel_derivative,
    spherical_jn_yn_all,
)
from mathaudio_tpu.xtypes import default_complex, default_float


def rigid_sphere_coefficients(ka, num_terms: int, max_arg: float = 120.0):
    """a_n = j_n'(ka) / h_n^(1)'(ka) for a rigid sphere
    (solutions_3d.rs:147). Returns (num_terms,) complex."""
    ka = jnp.asarray(ka, default_float())
    j_all, y_all = spherical_jn_yn_all(num_terms, ka, max_arg=max_arg)
    jp = spherical_bessel_derivative(j_all, ka)[:num_terms]
    yp = spherical_bessel_derivative(y_all, ka)[:num_terms]
    hp = jp + 1j * yp
    return jp / hp


def classify_regime(ka: float) -> str:
    """Rayleigh / Mie / geometric (solutions_3d.rs:131)."""
    if ka < 0.3:
        return "Rayleigh (ka << 1)"
    if ka < 3.0:
        return "Mie (ka ~ 1)"
    return "Geometric (ka >> 1)"


def _sphere_series(wave_number, num_terms, kr, cos_theta, a_n, scattered_only, max_arg):
    """sum_n (2n+1) i^n [j_n(kr) - a_n h_n(kr)] P_n(cos theta) on the
    cartesian product kr x theta."""
    j_all, y_all = spherical_jn_yn_all(num_terms - 1, kr, max_arg=max_arg)
    h_all = j_all + 1j * y_all  # (num_terms, R)
    p_all = legendre_all(num_terms - 1, cos_theta)  # (num_terms, T)

    n = jnp.arange(num_terms, dtype=default_float())
    i_pow_n = jnp.exp(1j * jnp.asarray(n * jnp.pi / 2.0, default_complex()))
    pref = (2.0 * n + 1.0) * i_pow_n  # (num_terms,)

    radial = -a_n[:, None] * h_all
    if not scattered_only:
        radial = radial + j_all
    return jnp.einsum("nr,nt->rt", pref[:, None] * radial, p_all.astype(radial.dtype))


def sphere_scattering_3d(
    wave_number: float,
    radius: float,
    num_terms: int,
    r_points,
    theta_points,
    max_arg: float = 120.0,
):
    """Total field around a rigid sphere hit by a +z plane wave:
    p = sum_n (2n+1) i^n [j_n(kr) - a_n h_n^(1)(kr)] P_n(cos theta)
    (solutions_3d.rs:56). Grid = cartesian product r x theta, phi = 0."""
    r_points = jnp.asarray(r_points, default_float())
    theta_points = jnp.asarray(theta_points, default_float())
    ka = wave_number * radius
    a_n = rigid_sphere_coefficients(ka, num_terms, max_arg=max_arg)

    total = _sphere_series(
        wave_number,
        num_terms,
        wave_number * r_points,
        jnp.cos(theta_points),
        a_n,
        scattered_only=False,
        max_arg=max_arg,
    ).reshape(-1)

    rr, tt = jnp.meshgrid(r_points, theta_points, indexing="ij")
    positions = from_spherical(rr.reshape(-1), tt.reshape(-1), jnp.zeros_like(rr).reshape(-1))
    return AnalyticalSolution(
        name=f"3D Sphere Scattering (ka={ka:.2f})",
        dimensions=3,
        positions=positions,
        pressure=total,
        wave_number=wave_number,
        frequency=frequency_of(wave_number),
        metadata={
            "radius": radius,
            "ka": ka,
            "num_terms": num_terms,
            "boundary_condition": "rigid",
            "regime": classify_regime(ka),
        },
    )


def sphere_scattered_pressure_3d(
    wave_number: float,
    radius: float,
    num_terms: int,
    points,
    max_arg: float = 120.0,
):
    """Scattered-only field p_s at arbitrary (N, 3) points for a rigid
    sphere at the origin, incident plane wave along +z. Used by the BEM
    validation tests (math-bem/tests/test_bem_sphere_integration.rs)."""
    points = jnp.asarray(points, default_float())
    r = jnp.linalg.norm(points, axis=-1)
    safe_r = jnp.where(r < 1e-30, 1.0, r)
    cos_theta = points[:, 2] / safe_r
    ka = wave_number * radius
    a_n = rigid_sphere_coefficients(ka, num_terms, max_arg=max_arg)

    j_all, y_all = spherical_jn_yn_all(num_terms - 1, wave_number * r, max_arg=max_arg)
    h_all = j_all + 1j * y_all  # (num_terms, N)
    p_all = legendre_all(num_terms - 1, cos_theta)  # (num_terms, N)
    n = jnp.arange(num_terms, dtype=default_float())
    i_pow_n = jnp.exp(1j * jnp.asarray(n * jnp.pi / 2.0, default_complex()))
    pref = (2.0 * n + 1.0) * i_pow_n
    terms = pref[:, None] * (-a_n[:, None]) * h_all * p_all.astype(h_all.dtype)
    return jnp.sum(terms, axis=0)


def sphere_rcs_3d(wave_number: float, radius: float, num_terms: int, max_arg: float = 120.0):
    """sigma = (4 pi / k^2) sum_n (2n+1) |a_n|^2 (solutions_3d.rs:278)."""
    a_n = rigid_sphere_coefficients(wave_number * radius, num_terms, max_arg=max_arg)
    n = jnp.arange(num_terms)
    return 4.0 * jnp.pi / wave_number**2 * jnp.sum((2 * n + 1) * jnp.abs(a_n) ** 2)


def sphere_scattering_efficiency_3d(
    wave_number: float, radius: float, num_terms: int, max_arg: float = 120.0
):
    """Q = sigma / (pi a^2) (solutions_3d.rs:293)."""
    return sphere_rcs_3d(wave_number, radius, num_terms, max_arg=max_arg) / (
        jnp.pi * radius**2
    )


def plane_wave_3d(wave_number: float, theta: float, phi: float, points):
    """p = exp(i k . r), direction (theta, phi) (solutions_3d.rs:308)."""
    points = jnp.asarray(points, default_float())
    kvec = wave_number * jnp.asarray(
        [
            jnp.sin(theta) * jnp.cos(phi),
            jnp.sin(theta) * jnp.sin(phi),
            jnp.cos(theta),
        ],
        default_float(),
    )
    phase = points @ kvec
    p = jnp.exp(1j * phase.astype(default_complex()))
    return AnalyticalSolution(
        name=f"3D Plane Wave (k={wave_number})",
        dimensions=3,
        positions=points,
        pressure=p,
        wave_number=wave_number,
        frequency=frequency_of(wave_number),
        metadata={"theta": theta, "phi": phi},
    )


def pulsating_sphere_3d(
    wave_number: float,
    radius: float,
    points,
    velocity: complex = 1.0,
    density: float = 1.204,
    speed_of_sound: float = 343.0,
):
    """Radiating (breathing-mode) sphere: uniform radial surface velocity
    v0 on r = a. With e^{-i omega t} and outgoing e^{+ikr}/r waves,

        p(r) = i rho c v0 * (ka/(i ka - 1)) * (a/r) * e^{ik(r-a)},

    so the surface pressure is i ka rho c v0 / (i ka - 1)
    (math-bem/bin/qa_suite.rs:328 run_pulsating_sphere_test oracle)."""
    points = jnp.asarray(points, default_float())
    r = jnp.linalg.norm(points, axis=-1)
    ka = wave_number * radius
    cdt = default_complex()
    coef = (
        1j
        * jnp.asarray(density * speed_of_sound * velocity, cdt)
        * ka
        / (1j * ka - 1.0)
    )
    p = coef * (radius / r) * jnp.exp(1j * (wave_number * (r - radius)).astype(cdt))
    return AnalyticalSolution(
        name=f"3D Pulsating Sphere (ka={ka})",
        dimensions=3,
        positions=points,
        pressure=p,
        wave_number=wave_number,
        frequency=frequency_of(wave_number),
        metadata={"radius": radius, "velocity": complex(velocity)},
    )


def impedance_sphere_3d(
    wave_number: float,
    radius: float,
    points,
    velocity: complex = 1.0,
    admittance: complex = 0.0,
    density: float = 1.204,
    speed_of_sound: float = 343.0,
):
    """Pulsating sphere with a locally-reacting surface of normalized
    admittance beta: dp/dn = i omega rho v0 - i k beta p on r = a
    (same -ik beta convention as the FEM absorbing Robin BC). Outgoing
    monopole ansatz p = A e^{ikr}/r gives the surface pressure

        p(a) = i rho c ka v0 / (i ka (1 + beta) - 1),

    reducing to the rigid-driven pulsating sphere at beta = 0 and to a
    pressure-release surface (p -> 0) as |beta| -> inf."""
    points = jnp.asarray(points, default_float())
    r = jnp.linalg.norm(points, axis=-1)
    ka = wave_number * radius
    cdt = default_complex()
    p_a = (
        1j
        * jnp.asarray(density * speed_of_sound * velocity, cdt)
        * ka
        / (1j * ka * (1.0 + jnp.asarray(admittance, cdt)) - 1.0)
    )
    p = p_a * (radius / r) * jnp.exp(1j * (wave_number * (r - radius)).astype(cdt))
    return AnalyticalSolution(
        name=f"3D Impedance Sphere (ka={ka}, beta={admittance})",
        dimensions=3,
        positions=points,
        pressure=p,
        wave_number=wave_number,
        frequency=frequency_of(wave_number),
        metadata={
            "radius": radius,
            "velocity": complex(velocity),
            "admittance": complex(admittance),
        },
    )


def point_source_3d(wave_number: float, source, points):
    """Monopole G(r) = exp(ikr)/(4 pi r) (solutions_3d.rs:357)."""
    from mathaudio_tpu.wave.special.helmholtz import greens_function_3d

    points = jnp.asarray(points, default_float())
    source = jnp.asarray(source, default_float())
    r = jnp.linalg.norm(points - source, axis=-1)
    p = greens_function_3d(r, wave_number)
    return AnalyticalSolution(
        name=f"3D Point Source (k={wave_number})",
        dimensions=3,
        positions=points,
        pressure=p,
        wave_number=wave_number,
        frequency=frequency_of(wave_number),
        metadata={"source": [float(source[0]), float(source[1]), float(source[2])]},
    )
