"""Identity and Jacobi preconditioners
(math-solvers/src/traits.rs:379, preconditioners/diagonal.rs:20)."""

from __future__ import annotations

import jax.numpy as jnp

from mathaudio_tpu.solvers.operators import DiagonalOperator, LinearOperator


def identity_preconditioner() -> LinearOperator:
    class _Identity(LinearOperator):
        def matvec(self, x):
            return x

        def rmatvec(self, x):
            return x

    return _Identity()


def jacobi_preconditioner(diag) -> DiagonalOperator:
    """M^{-1} = diag(A)^{-1}; zero diagonal entries pass through unchanged
    (diagonal.rs:20 semantics)."""
    diag = jnp.asarray(diag)
    inv = jnp.where(jnp.abs(diag) > 1e-300, 1.0 / jnp.where(jnp.abs(diag) > 1e-300, diag, 1.0), 1.0)
    return DiagonalOperator(inv)
