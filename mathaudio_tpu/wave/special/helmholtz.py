"""Helmholtz Green's function kernels (the BEM integrand family).

Counterpart of math-wave/src/special/helmholtz.rs:33-270, with the same
conventions (time convention e^{-i omega t}, outgoing G = e^{ikr}/(4 pi r)):

- G(x, y)            = exp(ik r) / (4 pi r),        r = |x - y|
- dG/dn_y            = (ik - 1/r) G (y-x).n_y / r     (double layer)
- dG/dn_x            = -(ik - 1/r) G (y-x).n_x / r    (adjoint double layer)
- d2G/dn_x dn_y      = [ ((ik)^2 - 3ik/r + 3/r^2)(r.n_x)(r.n_y)/r^2
                         - (ik - 1/r)(n_x.n_y)/r ] G  (hypersingular)

All functions broadcast over leading batch dimensions; points are arrays
with trailing dimension 3. Everything is jit/vmap-safe (no branches on
data; the r -> 0 singularity is masked to +inf like the reference).
"""

from __future__ import annotations

import jax.numpy as jnp

from mathaudio_tpu.xtypes import complex_dtype_for

_PI4 = 4.0 * jnp.pi
_RMIN = 1e-15


def _safe_r(r):
    return jnp.where(r < _RMIN, 1.0, r)


def greens_function_3d(r, k):
    """G = exp(ikr)/(4 pi r) (helmholtz.rs:33)."""
    r = jnp.asarray(r)
    rs = _safe_r(r)
    kr = k * rs
    g = jnp.exp(1j * kr.astype(complex_dtype_for(rs.dtype))) / (_PI4 * rs)
    return jnp.where(r < _RMIN, jnp.inf + 0j, g)


def greens_function_2d(r, k, max_arg: float = 120.0):
    """G = (i/4) H_0^(1)(kr) (helmholtz.rs:52)."""
    from mathaudio_tpu.wave.special.bessel import hankel1_all

    r = jnp.asarray(r)
    rs = _safe_r(r)
    h0 = hankel1_all(0, k * rs, max_arg=max_arg)[0]
    return jnp.where(r < _RMIN, jnp.inf + 0j, 0.25j * h0)


def _r_vec(source, field):
    source = jnp.asarray(source)
    field = jnp.asarray(field)
    rv = field - source
    r2 = jnp.sum(rv * rv, axis=-1)
    r = jnp.sqrt(r2)
    return rv, r, r2


def greens_function_gradient_3d(source, field, k):
    """grad_y G = (ik - 1/r) G (y-x)/r, trailing axis 3 (helmholtz.rs:80)."""
    rv, r, _ = _r_vec(source, field)
    g = greens_function_3d(r, k)
    factor = (1j * k - 1.0 / _safe_r(r)) * g
    return factor[..., None] * rv / _safe_r(r)[..., None]


def greens_function_normal_derivative_3d(source, field, normal_field, k):
    """dG/dn_y = (ik - 1/r) G (y-x).n_y / r (helmholtz.rs:114)."""
    rv, r, _ = _r_vec(source, field)
    g = greens_function_3d(r, k)
    r_dot_n = jnp.sum(rv * jnp.asarray(normal_field), axis=-1)
    return (1j * k - 1.0 / _safe_r(r)) * g * r_dot_n / _safe_r(r)


def greens_function_adjoint_derivative_3d(source, field, normal_source, k):
    """dG/dn_x = (1/r - ik) G (y-x).n_x / r (helmholtz.rs:146)."""
    rv, r, _ = _r_vec(source, field)
    g = greens_function_3d(r, k)
    r_dot_n = jnp.sum(rv * jnp.asarray(normal_source), axis=-1)
    return (1.0 / _safe_r(r) - 1j * k) * g * r_dot_n / _safe_r(r)


def greens_function_hypersingular_3d(source, field, normal_source, normal_field, k):
    """d2G/(dn_x dn_y) (helmholtz.rs:176)."""
    rv, r, r2 = _r_vec(source, field)
    rs, r2s = _safe_r(r), _safe_r(r2)
    g = greens_function_3d(r, k)
    ik = 1j * k
    r_dot_nx = jnp.sum(rv * jnp.asarray(normal_source), axis=-1)
    r_dot_ny = jnp.sum(rv * jnp.asarray(normal_field), axis=-1)
    nx_dot_ny = jnp.sum(jnp.asarray(normal_source) * jnp.asarray(normal_field), axis=-1)
    coef1 = ik * ik - 3.0 * ik / rs + 3.0 / r2s
    term1 = coef1 * r_dot_nx * r_dot_ny / r2s
    term2 = (ik - 1.0 / rs) * nx_dot_ny / rs
    return (term1 - term2) * g


def all_kernels_3d(source, field, normal_source, normal_field, k):
    """Fused (G, dG/dn_y, dG/dn_x, d2G/dn_x dn_y) (helmholtz.rs:216).

    One r/exp evaluation shared by all four kernels — this is the inner
    integrand of the TBEM assembly kernel, so it broadcasts over arbitrary
    (collocation x quadrature-point) batch shapes.
    """
    rv, r, r2 = _r_vec(source, field)
    rs, r2s = _safe_r(r), _safe_r(r2)
    kr = k * rs
    cdtype = complex_dtype_for(rs.dtype)
    g = jnp.exp(1j * kr.astype(cdtype)) / (_PI4 * rs)

    nx = jnp.asarray(normal_source)
    ny = jnp.asarray(normal_field)
    r_dot_nx = jnp.sum(rv * nx, axis=-1)
    r_dot_ny = jnp.sum(rv * ny, axis=-1)
    nx_dot_ny = jnp.sum(nx * ny, axis=-1)

    ik = jnp.asarray(1j * k, cdtype)
    factor_dg = ik - 1.0 / rs
    dg_dny = factor_dg * g * r_dot_ny / rs
    dg_dnx = -factor_dg * g * r_dot_nx / rs
    coef1 = ik * ik - 3.0 * ik / rs + 3.0 / r2s
    d2g = (coef1 * r_dot_nx * r_dot_ny / r2s - factor_dg * nx_dot_ny / rs) * g
    return g, dg_dny, dg_dnx, d2g


def laplace_greens_function_3d(r):
    """k = 0 limit: 1/(4 pi r) (helmholtz.rs:270)."""
    r = jnp.asarray(r)
    return jnp.where(r < _RMIN, jnp.inf, 1.0 / (_PI4 * _safe_r(r)))


def laplace_greens_function_2d(r):
    """-ln(r)/(2 pi)."""
    r = jnp.asarray(r)
    return jnp.where(r < _RMIN, jnp.inf, -jnp.log(_safe_r(r)) / (2.0 * jnp.pi))
