"""Linear operators as pytrees with a matvec protocol.

Counterpart of the reference's ``LinearOperator`` trait
(math-solvers/src/traits.rs:316-370: apply / apply_transpose /
apply_hermitian). Operators here are registered pytrees so they flow
through jit/vmap/shard_map; Krylov solvers accept either an operator
object or a bare ``x -> Ax`` callable (matrix-free, the preferred form
on TPU where the fastest "SpMV" is often an element-local action).
"""

from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp


class LinearOperator:
    """Protocol: subclasses implement matvec; optionally rmatvec/hmatvec."""

    def matvec(self, x):
        raise NotImplementedError

    def rmatvec(self, x):
        """A^T x."""
        raise NotImplementedError

    def hmatvec(self, x):
        """A^H x."""
        return jnp.conj(self.rmatvec(jnp.conj(x)))

    def __call__(self, x):
        return self.matvec(x)


def as_matvec(a: Union[LinearOperator, Callable, jnp.ndarray]) -> Callable:
    """Normalize operator-ish inputs to a ``x -> Ax`` callable."""
    if isinstance(a, LinearOperator):
        return a.matvec
    if callable(a):
        return a
    arr = jnp.asarray(a)
    if arr.ndim == 2:
        return lambda x: arr @ x
    raise TypeError(f"cannot interpret {type(a)} as a linear operator")


@jax.tree_util.register_pytree_node_class
class DenseOperator(LinearOperator):
    """Dense matrix operator (traits.rs DenseMatrixOperator analog)."""

    def __init__(self, a):
        self.a = jnp.asarray(a)

    def matvec(self, x):
        return self.a @ x

    def rmatvec(self, x):
        return self.a.T @ x

    def hmatvec(self, x):
        return jnp.conj(self.a).T @ x

    def tree_flatten(self):
        return (self.a,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        # bypass __init__: unflatten must not coerce children (they may
        # be tracers or structured leaves like fmm_chip.Planes pairs —
        # jnp.asarray would silently STACK a Planes tuple into an array)
        obj = object.__new__(cls)
        obj.a = children[0]
        return obj


@jax.tree_util.register_pytree_node_class
class DiagonalOperator(LinearOperator):
    def __init__(self, d):
        self.d = jnp.asarray(d)

    def matvec(self, x):
        return self.d * x

    def rmatvec(self, x):
        return self.d * x

    def hmatvec(self, x):
        return jnp.conj(self.d) * x

    def tree_flatten(self):
        return (self.d,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)  # no coercion (see DenseOperator)
        obj.d = children[0]
        return obj


@jax.tree_util.register_pytree_node_class
class EllOperator(LinearOperator):
    """Padded-row (ELLPACK) sparse operator — the TPU-friendly layout.

    ``indices``/``values`` are (n, max_nnz_per_row); padding entries point
    at row 0 with value 0. The matvec is one gather plus one contraction,
    both vectorizable on the VPU — unlike CSR's per-row variable-length
    loops (sparse/csr.rs:240), which don't map to fixed-shape tiles.
    """

    def __init__(self, indices, values, num_cols=None):
        self.indices = jnp.asarray(indices)
        self.values = jnp.asarray(values)
        self.num_cols = int(num_cols) if num_cols is not None else self.indices.shape[0]

    def matvec(self, x):
        gathered = jnp.take(x, self.indices, axis=0)  # (n, max_nnz)
        return jnp.sum(self.values * gathered, axis=1)

    def rmatvec(self, x):
        n = self.indices.shape[0]
        contrib = self.values * x[:, None]
        return jnp.zeros((self.num_cols,), self.values.dtype).at[self.indices].add(contrib)

    def tree_flatten(self):
        return (self.indices, self.values), self.num_cols

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)  # no coercion (see DenseOperator)
        obj.indices, obj.values = children
        obj.num_cols = aux
        return obj
