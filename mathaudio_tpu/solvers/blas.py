"""Vector kernel helpers (math-solvers/src/blas_helpers.rs:21-130).

On TPU these all fuse into surrounding computations under jit; they exist
for API parity and for the complex-aware inner product convention
(conjugate-linear in the first argument, matching BLAS zdotc and the
reference's ComplexField::conj usage in gmres.rs).
"""

from __future__ import annotations

import jax.numpy as jnp


def inner_product(x, y):
    """<x, y> = sum conj(x) * y."""
    return jnp.sum(jnp.conj(x) * y)


def vector_norm(x):
    """||x||_2 as a real scalar (safe for complex x)."""
    return jnp.sqrt(jnp.sum(jnp.abs(x) ** 2).real)


def axpy(alpha, x, y):
    """y + alpha x."""
    return alpha * x + y


def axpby(alpha, x, beta, y):
    return alpha * x + beta * y
