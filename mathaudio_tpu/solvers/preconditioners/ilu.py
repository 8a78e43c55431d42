"""ILU(0) with fixed-point triangular applies.

Factorization: host-side IKJ ILU(0) on the CSR sparsity
(math-solvers/src/preconditioners/ilu.rs:16). Apply: Jacobi fixed-point
sweeps on L and U (ilu_parallel.rs:374 IluFixedPointPreconditioner) —
each sweep is one ELL matvec, so the whole apply is a handful of fused
gather+FMA passes on device. Convergence of the sweeps is geometric in
the strictly-triangular spectral radius; the reference defaults to a
fixed sweep count, as do we.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mathaudio_tpu.solvers.operators import EllOperator, LinearOperator
from mathaudio_tpu.solvers.sparse import CsrMatrix


def ilu0_factor(csr: CsrMatrix):
    """In-place ILU(0): returns (L_csr strictly-lower with unit diag
    implied, U_csr upper incl. diagonal) on the input sparsity.

    Uses the native C++ kernel (mathaudio_tpu.native) when a toolchain is
    available; otherwise the pure-Python IKJ loop below."""
    n = csr.shape[0]
    indptr, indices = csr.indptr, csr.indices

    from mathaudio_tpu import native

    was_real = not np.iscomplexobj(csr.data)
    data_c = np.ascontiguousarray(csr.data, np.complex128).copy()
    if native.ilu0_factor_inplace(indptr, indices, data_c):
        data = data_c.real.astype(csr.data.dtype) if was_real else data_c
        return _split_lu(csr, data)

    data = csr.data.copy()

    # Column position lookup per row for O(1) access.
    col_pos = [dict() for _ in range(n)]
    for i in range(n):
        for p in range(indptr[i], indptr[i + 1]):
            col_pos[i][int(indices[p])] = p

    for i in range(1, n):
        row = list(range(indptr[i], indptr[i + 1]))
        for p in row:
            k = int(indices[p])
            if k >= i:
                continue
            dk = col_pos[k].get(k)
            if dk is None or data[dk] == 0:
                continue
            data[p] = data[p] / data[dk]
            lik = data[p]
            for q in range(indptr[k], indptr[k + 1]):
                j = int(indices[q])
                if j <= k:
                    continue
                pij = col_pos[i].get(j)
                if pij is not None:
                    data[pij] -= lik * data[q]
    return _split_lu(csr, data)


def _split_lu(csr: CsrMatrix, data: np.ndarray):
    n = csr.shape[0]
    indptr, indices = csr.indptr, csr.indices
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    lower = indices < rows
    l_csr = CsrMatrix.from_triplets(
        rows[lower], indices[lower].astype(np.int64), data[lower], csr.shape
    )
    u_csr = CsrMatrix.from_triplets(
        rows[~lower], indices[~lower].astype(np.int64), data[~lower], csr.shape
    )
    return l_csr, u_csr


@jax.tree_util.register_pytree_node_class
class IluFixedPoint(LinearOperator):
    """M^{-1} r by fixed-point sweeps:  L z = r  then  U x = z.

    z <- r - L_strict z   (unit lower)
    x <- D^{-1}(z - U_strict x)
    """

    def __init__(self, l_op: EllOperator, u_strict_op: EllOperator, u_diag_inv, sweeps: int = 6):
        self.l_op = l_op
        self.u_strict_op = u_strict_op
        self.u_diag_inv = u_diag_inv
        self.sweeps = int(sweeps)

    @classmethod
    def from_csr(cls, csr: CsrMatrix, sweeps: int = 6):
        l_csr, u_csr = ilu0_factor(csr)
        diag = u_csr.diagonal()
        # strip the diagonal out of U
        rows = np.repeat(np.arange(u_csr.shape[0]), np.diff(u_csr.indptr))
        mask = rows != u_csr.indices
        u_strict = CsrMatrix.from_triplets(
            rows[mask], u_csr.indices[mask], u_csr.data[mask], u_csr.shape
        )
        l_ell = l_csr.to_ell().operator()
        u_ell = u_strict.to_ell().operator()
        safe = np.where(np.abs(diag) > 1e-300, diag, 1.0)
        return cls(l_ell, u_ell, jnp.asarray(1.0 / safe), sweeps)

    def matvec(self, r):
        z = r
        for _ in range(self.sweeps):
            z = r - self.l_op.matvec(z)
        x = self.u_diag_inv * z
        for _ in range(self.sweeps):
            x = self.u_diag_inv * (z - self.u_strict_op.matvec(x))
        return x

    def tree_flatten(self):
        return (self.l_op, self.u_strict_op, self.u_diag_inv), self.sweeps

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux)


def greedy_coloring(csr: CsrMatrix) -> np.ndarray:
    """Greedy multicoloring of the (symmetrized) sparsity graph
    (ilu_parallel.rs graph-coloring setup). Adjacent rows get different
    colors, so within a color the triangular factors have no couplings."""
    import scipy.sparse as sp

    n = csr.shape[0]
    a = sp.csr_matrix(
        (np.ones_like(csr.data, dtype=np.int8), csr.indices, csr.indptr), shape=csr.shape
    )
    s = (a + a.T).tocsr()

    from mathaudio_tpu import native

    colors = native.greedy_coloring(s.indptr, s.indices)
    if colors is not None:
        return colors

    colors = np.full(n, -1, np.int32)
    for i in range(n):
        nbr = s.indices[s.indptr[i] : s.indptr[i + 1]]
        used = set(colors[nbr[colors[nbr] >= 0]].tolist())
        c = 0
        while c in used:
            c += 1
        colors[i] = c
    return colors


@jax.tree_util.register_pytree_node_class
class IluColored(LinearOperator):
    """Graph-coloring ILU(0) (ilu_parallel.rs coloring variant, TPU
    shape): rows are permuted by color, making the strictly-triangular
    factors nilpotent of degree n_colors — so n_colors Jacobi sweeps
    solve L and U EXACTLY, each sweep one ELL matvec. The TPU pays
    n_colors fused matvecs instead of a serialized level-scheduled
    solve."""

    def __init__(self, inner: IluFixedPoint, perm, inv_perm):
        self.inner = inner
        self.perm = perm
        self.inv_perm = inv_perm

    @classmethod
    def from_csr(cls, csr: CsrMatrix):
        import scipy.sparse as sp

        colors = greedy_coloring(csr)
        n_colors = int(colors.max()) + 1
        perm = np.argsort(colors, kind="stable")
        a = sp.csr_matrix((csr.data, csr.indices, csr.indptr), shape=csr.shape)
        ap = a[perm][:, perm].tocsr()
        ap.sort_indices()
        csr_p = CsrMatrix(
            ap.indptr.astype(np.int64), ap.indices.astype(np.int64), ap.data, csr.shape
        )
        inner = IluFixedPoint.from_csr(csr_p, sweeps=n_colors)
        inv_perm = np.argsort(perm)
        return cls(inner, jnp.asarray(perm), jnp.asarray(inv_perm))

    @property
    def n_colors(self) -> int:
        return self.inner.sweeps

    def matvec(self, r):
        return self.inner.matvec(r[self.perm])[self.inv_perm]

    def tree_flatten(self):
        return (self.inner, self.perm, self.inv_perm), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)
