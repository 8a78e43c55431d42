"""Algebraic multigrid preconditioner
(math-solvers/src/preconditioners/amg.rs:1-1267, BoomerAMG-style).

Setup (host, scipy.sparse): classical strength-of-connection, PMIS
coarsening, direct interpolation, Galerkin RAP coarse operators —
the graph algorithms stay on CPU. Apply (device): the resulting
hierarchy is emitted as fem.multigrid.MgParams (padded-ELL operators and
transfer stencils), so the damped-Jacobi V-cycle and solve_multigrid are
shared verbatim with geometric MG. Presets mirror amg.rs:173-206.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from mathaudio_tpu.solvers.operators import LinearOperator
from mathaudio_tpu.solvers.sparse import CsrMatrix
from mathaudio_tpu.xtypes import complex_dtype_for, default_float


@dataclasses.dataclass
class AmgConfig:
    """amg.rs:41-106 AmgConfig."""

    strength_threshold: float = 0.25
    max_levels: int = 10
    coarse_size: int = 64
    omega: float = 2.0 / 3.0
    nu: int = 2
    max_interp_points: int = 4

    @classmethod
    def for_fem(cls) -> "AmgConfig":
        return cls(strength_threshold=0.25)

    @classmethod
    def for_bem(cls) -> "AmgConfig":
        return cls(strength_threshold=0.5, max_interp_points=6)

    @classmethod
    def for_parallel(cls) -> "AmgConfig":
        return cls(strength_threshold=0.25, nu=1)

    @classmethod
    def for_difficult_problems(cls) -> "AmgConfig":
        return cls(strength_threshold=0.5, nu=3, max_interp_points=8)


def _strength_graph(a: sp.csr_matrix, theta: float) -> sp.csr_matrix:
    """Classical strength: |a_ij| >= theta * max_{l != i} |a_il|."""
    a = a.tocsr()
    abs_a = abs(a)
    abs_a.setdiag(0)
    row_max = abs_a.max(axis=1).toarray().ravel()
    rows = np.repeat(np.arange(a.shape[0]), np.diff(a.indptr))
    strong = (np.abs(a.data) >= theta * np.maximum(row_max[rows], 1e-300)) & (
        rows != a.indices
    )
    # copy the index structure: eliminate_zeros() mutates in place and the
    # caller's matrix must not share arrays with the strength graph
    s = sp.csr_matrix(
        (strong.astype(np.int8), a.indices.copy(), a.indptr.copy()), shape=a.shape
    )
    s.eliminate_zeros()
    return s


def _pmis(s: sp.csr_matrix, seed: int = 0) -> np.ndarray:
    """PMIS coarsening (amg.rs PMIS variant): returns bool is_coarse.
    Uses the native C++ kernel when available."""
    n = s.shape[0]
    sym = ((s + s.T) > 0).astype(np.int8)
    rng = np.random.default_rng(seed)
    weight = sym.sum(axis=1).A.ravel().astype(float) + rng.random(n)
    indptr, indices = sym.indptr, sym.indices

    from mathaudio_tpu import native

    is_coarse = native.pmis_coarsen(indptr, indices, weight)
    if is_coarse is not None:
        return is_coarse

    state = np.zeros(n, np.int8)  # 0 undecided, 1 coarse, -1 fine
    undecided = n
    while undecided > 0:
        new_coarse = []
        for i in np.where(state == 0)[0]:
            nbrs = indices[indptr[i]: indptr[i + 1]]
            wmax = True
            for j in nbrs:
                if state[j] == 0 and weight[j] > weight[i]:
                    wmax = False
                    break
            if wmax:
                new_coarse.append(i)
        if not new_coarse:
            # tie-break stall: promote the max-weight undecided node
            new_coarse = [int(np.where(state == 0)[0][np.argmax(weight[state == 0])])]
        for i in new_coarse:
            state[i] = 1
            for j in indices[indptr[i]: indptr[i + 1]]:
                if state[j] == 0:
                    state[j] = -1
        undecided = int((state == 0).sum())
    return state == 1


def _direct_interpolation(a: sp.csr_matrix, s: sp.csr_matrix, is_coarse, max_pts: int):
    """Classical direct interpolation (amg.rs standard interpolation)."""
    n = a.shape[0]
    coarse_id = np.cumsum(is_coarse) - 1
    nc = int(is_coarse.sum())
    rows, cols, vals = [], [], []
    ai, aj, av = a.indptr, a.indices, a.data
    si, sj = s.indptr, s.indices
    for i in range(n):
        if is_coarse[i]:
            rows.append(i)
            cols.append(coarse_id[i])
            vals.append(1.0)
            continue
        strong = sj[si[i]: si[i + 1]]
        strong_c = [j for j in strong if is_coarse[j]]
        if not strong_c:
            continue  # isolated fine point: injected as zero (smoother fixes)
        row_cols = aj[ai[i]: ai[i + 1]]
        row_vals = av[ai[i]: ai[i + 1]]
        diag = 0.0
        sum_all = 0.0
        sum_c = 0.0
        a_ij = {}
        for j, v in zip(row_cols, row_vals):
            if j == i:
                diag += v
            else:
                sum_all += v
                if j in strong_c:
                    a_ij[j] = a_ij.get(j, 0.0) + v
                    sum_c += v
        if abs(sum_c) < 1e-300 or abs(diag) < 1e-300:
            continue
        if len(a_ij) > max_pts:
            keep = sorted(a_ij, key=lambda j: -abs(a_ij[j]))[:max_pts]
            dropped = sum(v for j, v in a_ij.items() if j not in keep)
            a_ij = {j: a_ij[j] for j in keep}
            sum_c -= dropped
            if abs(sum_c) < 1e-300:
                continue
        alpha = sum_all / sum_c
        for j, v in a_ij.items():
            rows.append(i)
            cols.append(coarse_id[j])
            vals.append(-alpha * v / diag)
    p = sp.csr_matrix((vals, (rows, cols)), shape=(n, nc))
    return p


def _to_padded_ell(a: sp.csr_matrix, dtype):
    a = a.tocsr()
    n = a.shape[0]
    width = max(int(np.diff(a.indptr).max()), 1)
    idx = np.zeros((n, width), np.int32)
    val = np.zeros((n, width), a.dtype)
    for i in range(n):
        sl = slice(a.indptr[i], a.indptr[i + 1])
        c = sl.stop - sl.start
        idx[i, :c] = a.indices[sl]
        val[i, :c] = a.data[sl]
    return jnp.asarray(idx), jnp.asarray(val, dtype)


class AmgPreconditioner(LinearOperator):
    """M^{-1} r = one AMG V-cycle. Also usable as a stand-alone solver
    via .solve() (amg.rs AmgPreconditioner + diagnostics)."""

    def __init__(self, a, config: Optional[AmgConfig] = None):
        # deferred: fem.multigrid imports fem.assembly which imports the
        # solvers package (this module's parent) — lazy to break the cycle
        from mathaudio_tpu.fem.multigrid import MgLevel, MgParams

        cfg = config or AmgConfig()
        self.config = cfg
        if isinstance(a, CsrMatrix):
            a_sp = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)
        elif sp.issparse(a):
            a_sp = a.tocsr()
        else:
            a_sp = sp.csr_matrix(np.asarray(a))
        cdtype = complex_dtype_for(default_float())
        a_sp = a_sp.astype(np.complex128)

        levels: List[MgLevel] = []
        sizes = [a_sp.shape[0]]
        ops = []
        cur = a_sp
        for _ in range(cfg.max_levels - 1):
            if cur.shape[0] <= cfg.coarse_size:
                break
            s = _strength_graph(cur, cfg.strength_threshold)
            is_coarse = _pmis(s)
            nc = int(is_coarse.sum())
            if nc == 0 or nc >= cur.shape[0]:
                break
            p = _direct_interpolation(cur, s, is_coarse, cfg.max_interp_points)
            coarse = (p.conj().T @ cur @ p).tocsr()
            ops.append((cur, p))
            sizes.append(coarse.shape[0])
            cur = coarse

        for a_l, p in ops:
            ell_idx, ell_val = _to_padded_ell(a_l, cdtype)
            diag = np.asarray(a_l.diagonal())
            inv_diag = np.where(np.abs(diag) > 1e-300, 1.0 / np.where(diag == 0, 1, diag), 1.0)
            p_csr = p.tocsr()
            width = max(int(np.diff(p_csr.indptr).max()), 1)
            n = p_csr.shape[0]
            p_idx = np.zeros((n, width), np.int32)
            p_w = np.zeros((n, width))
            for i in range(n):
                sl = slice(p_csr.indptr[i], p_csr.indptr[i + 1])
                c = sl.stop - sl.start
                p_idx[i, :c] = p_csr.indices[sl]
                p_w[i, :c] = p_csr.data[sl].real
            from mathaudio_tpu.fem.multigrid import transpose_transfer

            r_idx, r_w = transpose_transfer(p_idx, p_w, p_csr.shape[1])
            levels.append(
                MgLevel(
                    ell_idx,
                    ell_val,
                    jnp.asarray(inv_diag, cdtype),
                    jnp.asarray(p_idx),
                    jnp.asarray(p_w, default_float()),
                    jnp.asarray(r_idx),
                    jnp.asarray(r_w, default_float()),
                )
            )

        dense = np.asarray(cur.todense())
        ar, ai = dense.real, dense.imag
        embedded = np.block([[ar, -ai], [ai, ar]])
        inv = jnp.linalg.inv(jnp.asarray(embedded, default_float()))
        self.mgp = MgParams(tuple(levels), inv)
        self.grid_complexity = sum(sizes) / sizes[0]
        self.operator_complexity = (
            sum(op.nnz for op, _ in ops) + cur.nnz
        ) / max(a_sp.nnz, 1)
        self.level_sizes = sizes

    def matvec(self, r):
        from mathaudio_tpu.fem.multigrid import vcycle

        cdtype = (
            self.mgp.levels[0].ell_values.dtype
            if self.mgp.levels
            else complex_dtype_for(default_float())
        )
        out = vcycle(self.mgp, r.astype(cdtype), omega=self.config.omega, nu=self.config.nu)
        if not jnp.issubdtype(jnp.asarray(r).dtype, jnp.complexfloating):
            return out.real.astype(r.dtype)
        return out

    def solve(self, b, tol: float = 1e-8, max_cycles: int = 100):
        from mathaudio_tpu.fem.multigrid import solve_multigrid

        return solve_multigrid(self.mgp, b.astype(self.mgp.levels[0].ell_values.dtype),
                               tol=tol, max_cycles=max_cycles)
