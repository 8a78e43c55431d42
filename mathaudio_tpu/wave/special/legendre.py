"""Legendre polynomials and associated Legendre functions, pure JAX.

Counterpart of math-wave/src/special/legendre.rs:30-193 (same
recurrences), but returning all orders stacked: (nmax+1, *x.shape).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mathaudio_tpu.xtypes import default_float


def legendre_all(nmax: int, x):
    """P_n(x), n = 0..nmax via (n+1) P_{n+1} = (2n+1) x P_n - n P_{n-1}."""
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(default_float())
    dtype = x.dtype
    p0 = jnp.ones_like(x)
    if nmax == 0:
        return p0[None]
    p1 = x

    def step(carry, n):
        p_nm1, p_n = carry
        p_np1 = ((2.0 * n + 1.0) * x * p_n - n * p_nm1) / (n + 1.0)
        return (p_n, p_np1), p_np1

    ns = jnp.arange(1, nmax, dtype=dtype)
    _, p_rest = jax.lax.scan(step, (p0, p1), ns)
    return jnp.concatenate([p0[None], p1[None], p_rest], axis=0)


def legendre_p(n: int, x):
    """Single-order P_n(x)."""
    return legendre_all(n, x)[n]


def legendre_derivative_all(nmax: int, x):
    """P_n'(x) via (1-x^2) P_n' = n (P_{n-1} - x P_n); endpoints via
    P_n'(+-1) = (+-1)^{n+1} n(n+1)/2."""
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(default_float())
    p_all = legendre_all(nmax, x)
    n = jnp.arange(nmax + 1, dtype=x.dtype).reshape((-1,) + (1,) * x.ndim)
    one_m_x2 = 1.0 - x * x
    at_end = jnp.abs(one_m_x2) < 1e-12
    safe = jnp.where(at_end, 1.0, one_m_x2)
    p_prev = jnp.concatenate([jnp.zeros_like(x)[None], p_all[:-1]], axis=0)
    d_interior = n * (p_prev - x * p_all) / safe
    sign = jnp.where(x >= 0.0, 1.0, jnp.where(n % 2 == 1, 1.0, -1.0))
    d_end = sign * n * (n + 1.0) / 2.0
    return jnp.where(at_end[None], d_end, d_interior)


def associated_legendre_all(nmax: int, m: int, x):
    """P_n^m(x) for n = 0..nmax (zero for n < m), Condon–Shortley phase.

    P_m^m = (-1)^m (2m-1)!! (1-x^2)^{m/2};
    P_{m+1}^m = x (2m+1) P_m^m;
    (n-m) P_n^m = x (2n-1) P_{n-1}^m - (n+m-1) P_{n-2}^m.
    """
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(default_float())
    dtype = x.dtype
    if m > nmax:
        return jnp.zeros((nmax + 1,) + x.shape, dtype)

    somx2 = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
    # (2m-1)!! with Condon–Shortley phase
    pmm = jnp.ones_like(x)
    for i in range(1, m + 1):
        pmm = pmm * (-(2.0 * i - 1.0)) * somx2

    rows = [jnp.zeros_like(x) for _ in range(m)] + [pmm]
    if nmax > m:
        pmmp1 = x * (2.0 * m + 1.0) * pmm
        rows.append(pmmp1)
        if nmax > m + 1:
            def step(carry, n):
                p_nm2, p_nm1 = carry
                p_n = (x * (2.0 * n - 1.0) * p_nm1 - (n + m - 1.0) * p_nm2) / (n - m)
                return (p_nm1, p_n), p_n

            ns = jnp.arange(m + 2, nmax + 1, dtype=dtype)
            _, rest = jax.lax.scan(step, (pmm, pmmp1), ns)
            return jnp.concatenate([jnp.stack(rows), rest], axis=0)
    return jnp.stack(rows)


def normalized_associated_legendre_all(nmax: int, m: int, x):
    """Orthonormalized: sqrt((2n+1)/(4 pi) * (n-m)!/(n+m)!) P_n^m(x)
    (math-wave special/legendre.rs normalized variant)."""
    import math

    p = associated_legendre_all(nmax, m, x)
    norms = []
    for n in range(nmax + 1):
        if n < m:
            norms.append(0.0)
        else:
            norms.append(
                math.sqrt(
                    (2 * n + 1)
                    / (4.0 * math.pi)
                    * math.factorial(n - m)
                    / math.factorial(n + m)
                )
            )
    norms = jnp.asarray(norms, p.dtype).reshape((-1,) + (1,) * (p.ndim - 1))
    return norms * p
