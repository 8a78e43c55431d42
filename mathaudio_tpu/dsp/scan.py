"""Biquad filtering as an associative scan — the TPU IIR kernel.

The Direct-Form-I recurrence (iir.rs:324-341)

    y[n] = d[n] - a1 y[n-1] - a2 y[n-2],
    d[n] = b0 x[n] + b1 x[n-1] + b2 x[n-2]

is an affine map on the state s[n] = (y[n], y[n-1]):

    s[n] = A s[n-1] + c[n],   A = [[-a1, -a2], [1, 0]],  c[n] = (d[n], 0)

Affine maps compose associatively, so the whole block is one
``jax.lax.associative_scan`` over (A, c) pairs: O(log T) depth instead of
a T-step serial loop, with each combine a batch of 2x2 matmuls on the
VPU. The feed-forward part d[n] is a width-3 correlation, done with two
shifts. A cascade applies stages sequentially (each stage is one scan).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _feedforward(x, b0, b1, b2, x1, x2):
    # slicing (not x[:-2]) keeps the result length == len(x) for blocks
    # shorter than the delay line (t < 2), where x[:-2] under-shrinks
    # and broadcasting would silently widen d
    t = x.shape[0]
    xm1 = jnp.concatenate([jnp.asarray([x1], x.dtype), x])[:t]
    xm2 = jnp.concatenate([jnp.asarray([x2, x1], x.dtype), x])[:t]
    return b0 * x + b1 * xm1 + b2 * xm2


def biquad_process_block(x, coeffs, state=None):
    """Filter a 1-D block through one biquad.

    coeffs: (b0, b1, b2, a1, a2); state: (x1, x2, y1, y2) or None.
    Returns (y, new_state) with identical semantics to the reference's
    Direct Form I process_block (iir.rs:341).
    """
    b0, b1, b2, a1, a2 = [jnp.asarray(c, x.dtype) for c in coeffs]
    if state is None:
        x1 = x2 = y1 = y2 = jnp.zeros((), x.dtype)
    else:
        x1, x2, y1, y2 = [jnp.asarray(s, x.dtype) for s in state]

    d = _feedforward(x, b0, b1, b2, x1, x2)

    t = x.shape[0]
    a_mat = jnp.array([[-a1, -a2], [1.0, 0.0]], x.dtype)
    a_el = jnp.broadcast_to(a_mat, (t, 2, 2))
    c_el = jnp.stack([d, jnp.zeros_like(d)], axis=1)  # (T, 2)
    # fold the initial recurrence state into the first element
    s0 = jnp.array([y1, y2], x.dtype)
    c_el = c_el.at[0].add(a_mat @ s0)

    def combine(left, right):
        a1_, c1_ = left
        a2_, c2_ = right
        return a2_ @ a1_, jnp.einsum("...ij,...j->...i", a2_, c1_) + c2_

    _, s = jax.lax.associative_scan(combine, (a_el, c_el))
    y = s[:, 0]
    new_state = (x[-1], x[-2] if t >= 2 else x1, y[-1], y[-2] if t >= 2 else y1)
    return y, new_state


def peq_coeff_matrix(peq, dtype=jnp.float32):
    """Stack a Peq's biquad coefficients into (S, 5) [b0 b1 b2 a1 a2]
    (weights are applied in the dB domain by response functions; for
    sample processing all stages run in series like the reference)."""
    rows = [(bq.b0, bq.b1, bq.b2, bq.a1, bq.a2) for _, bq in peq]
    return jnp.asarray(np.asarray(rows), dtype)


def biquad_cascade_block(x, coeff_matrix):
    """Run a (S, 5) cascade over a block; stages in series, each one an
    associative scan. Zero initial state."""

    def stage(carry_x, cf):
        y, _ = biquad_process_block(carry_x, (cf[0], cf[1], cf[2], cf[3], cf[4]))
        return y, None

    y, _ = jax.lax.scan(stage, x, coeff_matrix)
    return y
