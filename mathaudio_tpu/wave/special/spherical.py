"""Spherical Bessel j_n, y_n and spherical Hankel h_n^(1), pure JAX.

Counterpart of math-wave/src/special/spherical.rs:49-278 (up-recurrence
with downward fallback there). Here j_n always uses Miller's downward
recurrence (stable for every (n, x) in-domain) normalized with the exact
identity ``sum_n (2n+1) j_n(x)^2 = 1`` — which, unlike normalizing by
j_0 = sin(x)/x, has no zeros. y_n uses the stable upward recurrence.
All-order stacked outputs, shape (nmax+1, *x.shape).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mathaudio_tpu.wave.special.bessel import _miller_downward
from mathaudio_tpu.xtypes import default_float


def spherical_jn_all(nmax: int, x, max_arg: float = 120.0):
    """j_n(x) for n = 0..nmax, shape (nmax+1, *x.shape)."""
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(default_float())
    dtype = x.dtype

    # Spherical recurrence: f_{k-1} = ((2k+1)/x) f_k - f_{k+1}.
    rel = _miller_downward(nmax, x, max_arg, coeff_offset=1.0)
    m_total = rel.shape[0] - 1
    orders = jnp.arange(m_total + 1, dtype=dtype)
    w = (2.0 * orders + 1.0).reshape((-1,) + (1,) * x.ndim)
    # sum (2n+1) j_n^2 = 1  ->  positive-definite normalization. The
    # identity is scale-invariant, so pre-scale by the per-point max to
    # keep the squares finite (|rel| can reach the 1e250 renorm bound).
    scale = jnp.max(jnp.abs(rel), axis=0)
    rel = rel / jnp.where(scale < 1e-300, 1.0, scale)
    norm = jnp.sqrt(jnp.sum(w * rel * rel, axis=0))
    # Miller's seed is positive and j_M(x) > 0 for x < first zero of j_M
    # (guaranteed since M > 1.2*max_arg >= x), so the scale is positive.
    j_all = (rel / norm)[: nmax + 1]

    tiny_x = jnp.abs(x) < 1e-30
    ob = jnp.arange(nmax + 1).reshape((-1,) + (1,) * x.ndim)
    return jnp.where(tiny_x[None], jnp.where(ob == 0, 1.0, 0.0), j_all)


def spherical_yn_all(nmax: int, x):
    """y_n(x) for n = 0..nmax via stable upward recurrence."""
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(default_float())
    dtype = x.dtype
    safe_x = jnp.where(jnp.abs(x) < 1e-30, 1.0, x)
    y0 = -jnp.cos(safe_x) / safe_x
    if nmax == 0:
        y_all = y0[None]
    else:
        y1 = -jnp.cos(safe_x) / safe_x**2 - jnp.sin(safe_x) / safe_x

        def step(carry, n):
            y_nm1, y_n = carry
            # y_{n+1} = ((2n+1)/x) y_n - y_{n-1}
            y_np1 = (2.0 * n + 1.0) / safe_x * y_n - y_nm1
            return (y_n, y_np1), y_np1

        ns = jnp.arange(1, nmax, dtype=dtype)
        _, y_rest = jax.lax.scan(step, (y0, y1), ns)
        y_all = jnp.concatenate([y0[None], y1[None], y_rest], axis=0)
    tiny_x = jnp.abs(x) < 1e-30
    return jnp.where(tiny_x[None], -jnp.inf, y_all)


def spherical_jn_yn_all(nmax: int, x, max_arg: float = 120.0):
    return spherical_jn_all(nmax, x, max_arg=max_arg), spherical_yn_all(nmax, x)


def spherical_hankel1_all(nmax: int, x, max_arg: float = 120.0):
    """h_n^(1)(x) = j_n(x) + i y_n(x) (math-wave special/spherical.rs:256)."""
    j_all, y_all = spherical_jn_yn_all(nmax, x, max_arg=max_arg)
    return jax.lax.complex(j_all, y_all)


def spherical_bessel_derivative(f_all, x):
    """f_n'(x) = f_{n-1}(x) - ((n+1)/x) f_n(x) for stacked spherical
    Bessel-family values; order 0 uses f_0' = -f_1. Works for j, y, h.
    """
    x = jnp.asarray(x)
    safe_x = jnp.where(jnp.abs(x) < 1e-30, 1.0, x)
    n = jnp.arange(f_all.shape[0], dtype=safe_x.dtype)
    n = n.reshape((-1,) + (1,) * x.ndim)
    d_rest = f_all[:-1] - ((n[1:] + 1.0) / safe_x) * f_all[1:]
    d0 = -f_all[1][None]
    return jnp.concatenate([d0, d_rest], axis=0)
