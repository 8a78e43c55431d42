"""Dense direct solvers (math-solvers/src/direct/lu.rs:27-142).

The reference binds LAPACK zgesv. On TPU, complex LU is handled by the
real 2N x 2N embedding  [[Ar, -Ai], [Ai, Ar]] — four real GEMM-shaped
blocks that XLA maps straight onto the MXU — selectable vs the native
complex path (fine on CPU) via ``method``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _embed(a, b):
    ar, ai = jnp.real(a), jnp.imag(a)
    top = jnp.concatenate([ar, -ai], axis=1)
    bot = jnp.concatenate([ai, ar], axis=1)
    a2 = jnp.concatenate([top, bot], axis=0)
    b2 = jnp.concatenate([jnp.real(b), jnp.imag(b)], axis=0)
    return a2, b2


def complex_solve(a, b, method: str = "auto"):
    """Solve A x = b for complex A via real embedding or native complex.

    method: 'embed' | 'native' | 'auto' (embed on TPU, native elsewhere).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if not jnp.issubdtype(a.dtype, jnp.complexfloating):
        return jnp.linalg.solve(a, b)
    if method == "auto":
        method = "embed" if jax.default_backend() == "tpu" else "native"
    if method == "native":
        return jnp.linalg.solve(a, b)
    n = a.shape[0]
    a2, b2 = _embed(a, b)
    x2 = jnp.linalg.solve(a2, b2)
    return jax.lax.complex(x2[:n], x2[n:]).astype(a.dtype)


def lu_solve(a, b, method: str = "auto"):
    """One-shot dense solve (direct/lu.rs:142 lu_solve)."""
    return complex_solve(a, b, method=method)


class LuFactorization(NamedTuple):
    """Reusable LU factors (direct/lu.rs:27 LuFactorization).

    For complex input the factorization stores the real-embedded system
    when ``embed`` is set (TPU path).
    """

    lu: jnp.ndarray
    piv: jnp.ndarray
    embedded: bool
    n: int

    @classmethod
    def factor(cls, a, method: str = "auto"):
        a = jnp.asarray(a)
        n = a.shape[0]
        is_c = jnp.issubdtype(a.dtype, jnp.complexfloating)
        if method == "auto":
            method = "embed" if jax.default_backend() == "tpu" else "native"
        if is_c and method == "embed":
            ar, ai = jnp.real(a), jnp.imag(a)
            a2 = jnp.block([[ar, -ai], [ai, ar]])
            lu, piv = jax.scipy.linalg.lu_factor(a2)
            return cls(lu, piv, True, n)
        lu, piv = jax.scipy.linalg.lu_factor(a)
        return cls(lu, piv, False, n)

    def solve(self, b):
        b = jnp.asarray(b)
        if self.embedded:
            b2 = jnp.concatenate([jnp.real(b), jnp.imag(b)], axis=0)
            x2 = jax.scipy.linalg.lu_solve((self.lu, self.piv), b2)
            return jax.lax.complex(x2[: self.n], x2[self.n :])
        return jax.scipy.linalg.lu_solve((self.lu, self.piv), b)
