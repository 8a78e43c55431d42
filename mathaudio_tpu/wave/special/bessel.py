"""Cylindrical Bessel functions J_n, Y_n and Hankel H_n^(1), pure JAX.

The reference delegates to the ``spec_math`` crate
(math-wave/src/special/helmholtz.rs:52-64, solutions_2d.rs). On TPU we
instead compute *all orders at once* with scan-based recurrences so the
result feeds series summations as one contraction:

- J_n via Miller's downward recurrence with periodic renormalization
  (log-scale carried through the scan to avoid overflow for small x),
  normalized by the Neumann identity  J_0 + 2*sum_{k>=1} J_{2k} = 1.
- Y_0, Y_1 via the exact Neumann log-series built from the J_n array
  (machine-precision identities, no rational approximations), then the
  (stable) upward recurrence for Y_n.

Valid for 0 <= x <= ``max_arg`` (static; sets the scan length) and the
accuracy degrades gracefully with slowly-growing cancellation in the Y
series for large x. This covers the acoustics use cases (kr up to ~100).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mathaudio_tpu.xtypes import default_float

EULER_GAMMA = 0.5772156649015329


def _miller_downward(nmax: int, x, max_arg: float, coeff_offset: float = 0.0):
    """Unnormalized downward recurrence values f_k, k = 0..M, as
    ``rel[k] = f_k * exp(g_k - g_0)`` — true values relative to order 0's
    scale, safe against overflow. Returns rel with shape (M+1, *x.shape).

    The recurrence F_{k-1} = (2k/x) F_k - F_{k+1} is shared by J_n and
    spherical j_n (with 2k -> 2k+1), so the coefficient is a parameter.
    """
    x = jnp.asarray(x)
    dtype = x.dtype
    f64 = dtype == jnp.dtype(jnp.float64)
    big = 1e250 if f64 else 1e30
    log_big = jnp.log(jnp.asarray(big, dtype))
    shape = x.shape

    m_start = nmax + int(1.2 * max_arg) + 22
    safe_x = jnp.where(jnp.abs(x) < 1e-30, 1.0, x)
    inv_x = 1.0 / safe_x

    def step(carry, k):
        f_k, f_k1, g = carry
        f_km1 = (2.0 * k + coeff_offset) * inv_x * f_k - f_k1
        over = jnp.abs(f_km1) > big
        scale = jnp.where(over, 1.0 / big, 1.0)
        f_km1 = f_km1 * scale
        f_k = f_k * scale
        g = g + jnp.where(over, log_big, 0.0)
        return (f_km1, f_k, g), (f_km1, g)

    ks = jnp.arange(m_start, 0, -1, dtype=dtype)
    seed = jnp.full(shape, 1e-30, dtype)
    zero = jnp.zeros(shape, dtype)
    (_, _, _), (fs, gs) = jax.lax.scan(step, (seed, zero, zero), ks)
    # fs[i] is order m_start-1-i; flip to order ascending, prepend seed at M.
    fs = jnp.concatenate([fs[::-1], seed[None]], axis=0)  # orders 0..M
    gs = jnp.concatenate([gs[::-1], zero[None]], axis=0)
    g0 = gs[0]
    rel = fs * jnp.exp(gs - g0)  # g0 is the max scale -> exponents <= 0
    return rel


def bessel_jn_all(nmax: int, x, max_arg: float = 120.0):
    """J_n(x) for n = 0..nmax, shape (nmax+1, *x.shape)."""
    return bessel_jn_yn_all(nmax, x, max_arg=max_arg, with_y=False)[0]


def bessel_jn_yn_all(nmax: int, x, max_arg: float = 120.0, with_y: bool = True):
    """(J_n(x), Y_n(x)) for n = 0..nmax, each shape (nmax+1, *x.shape).

    ``max_arg`` must statically bound max(|x|); it fixes the scan length.
    """
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(default_float())
    dtype = x.dtype

    rel = _miller_downward(nmax, x, max_arg)  # orders 0..M
    m_total = rel.shape[0] - 1

    # Neumann normalization: J_0 + 2 sum_{k>=1} J_{2k} = 1.
    orders = jnp.arange(m_total + 1)
    even_w = jnp.where(orders == 0, 1.0, jnp.where(orders % 2 == 0, 2.0, 0.0))
    norm = jnp.tensordot(even_w.astype(dtype), rel, axes=1)
    j_all_full = rel / norm

    tiny_x = jnp.abs(x) < 1e-30
    orders_b = orders.reshape((-1,) + (1,) * x.ndim)
    j_all_full = jnp.where(tiny_x[None], jnp.where(orders_b == 0, 1.0, 0.0), j_all_full)
    j_all = j_all_full[: nmax + 1]
    if not with_y:
        return j_all, None

    # Y_0 via the exact Neumann log-series:
    #   Y_0 = (2/pi) [ (ln(x/2) + gamma) J_0 - 2 sum_{k>=1} (-1)^k J_{2k} / k ]
    safe_x = jnp.where(tiny_x, 1.0, x)
    log_term = jnp.log(safe_x / 2.0) + EULER_GAMMA
    n_even = (m_total - 1) // 2  # even orders 2..2K with 2K+1 <= m_total (Y_1 needs J_{2K+1})
    k_idx = jnp.arange(1, n_even + 1, dtype=dtype)
    j_even = j_all_full[2 : 2 * n_even + 1 : 2]  # J_2, J_4, ...
    alt = jnp.where(jnp.arange(1, n_even + 1) % 2 == 1, -1.0, 1.0).astype(dtype)
    s0 = jnp.tensordot(alt / k_idx, j_even, axes=1)
    y0 = (2.0 / jnp.pi) * (log_term * j_all_full[0] - 2.0 * s0)

    # Y_1 = -Y_0' expanded through the same series (d/dx of each term):
    #   Y_1 = (2/pi) [ (ln(x/2)+gamma) J_1 - J_0/x
    #                  + sum_{k>=1} (-1)^k (J_{2k-1} - J_{2k+1}) / k ]
    j_odd_lo = j_all_full[1 : 2 * n_even : 2]  # J_1, J_3, ..., J_{2K-1}
    j_odd_hi = j_all_full[3 : 2 * n_even + 2 : 2]  # J_3, J_5, ..., J_{2K+1}
    s1 = jnp.tensordot(alt / k_idx, j_odd_lo - j_odd_hi, axes=1)
    y1 = (2.0 / jnp.pi) * (log_term * j_all_full[1] - j_all_full[0] / safe_x + s1)

    if nmax == 0:
        y_all = y0[None]
    else:
        # Upward recurrence (stable for Y): Y_{n+1} = (2n/x) Y_n - Y_{n-1}.
        def step(carry, n):
            y_nm1, y_n = carry
            y_np1 = (2.0 * n) / safe_x * y_n - y_nm1
            return (y_n, y_np1), y_np1

        ns = jnp.arange(1, nmax, dtype=dtype)
        _, y_rest = jax.lax.scan(step, (y0, y1), ns)
        y_all = jnp.concatenate([y0[None], y1[None], y_rest], axis=0)

    neg_inf = jnp.asarray(-jnp.inf, dtype)
    y_all = jnp.where(tiny_x[None], neg_inf, y_all)
    return j_all, y_all


def hankel1_all(nmax: int, x, max_arg: float = 120.0):
    """H_n^(1)(x) = J_n(x) + i Y_n(x), shape (nmax+1, *x.shape), complex."""
    j_all, y_all = bessel_jn_yn_all(nmax, x, max_arg=max_arg)
    return jax.lax.complex(j_all, y_all)


def bessel_j0(x, max_arg: float = 120.0):
    return bessel_jn_all(0, x, max_arg=max_arg)[0]


def bessel_j1(x, max_arg: float = 120.0):
    return bessel_jn_all(1, x, max_arg=max_arg)[1]


def bessel_y0(x, max_arg: float = 120.0):
    return bessel_jn_yn_all(0, x, max_arg=max_arg)[1][0]


def bessel_y1(x, max_arg: float = 120.0):
    return bessel_jn_yn_all(1, x, max_arg=max_arg)[1][1]


def bessel_derivative_all(c_all, x):
    """C_n'(x) = C_{n-1}(x) - (n/x) C_n(x) for cylindrical Bessel-family
    values stacked over orders 0..nmax. Returns the same stacked shape;
    order 0 uses C_0' = -C_1. Needs nmax >= 1."""
    x = jnp.asarray(x)
    safe_x = jnp.where(jnp.abs(x) < 1e-30, 1.0, x)
    n = jnp.arange(c_all.shape[0], dtype=safe_x.dtype)
    n = n.reshape((-1,) + (1,) * x.ndim)
    d_rest = c_all[:-1] - (n[1:] / safe_x) * c_all[1:]
    d0 = -c_all[1][None]
    return jnp.concatenate([d0, d_rest], axis=0)
