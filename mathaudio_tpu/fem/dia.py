"""DIA (diagonal-offset) operator form for structured-grid FEM levels.

On the box meshes of the headline room sweep (fem.mesh.unit_cube_tetrahedra
and every coarser level of multigrid.box_hierarchy), the P1 stiffness/mass
sparsity is a fixed 15-point stencil: every nonzero sits on one of D=15
constant diagonals (col - row ∈ {0, ±1, ±(n+1), ±(n+1)², ± mixed}).
Stored by diagonal, the matvec over a node-major frequency batch

    y[n, f] = sum_d A_d[n] * x[n + off_d, f]

is D static sublane-shifted reads of one padded (N+2B, F) buffer — pure
streaming, no gather. Measured on the bench chip at headline shape
(N=9344, F=2048, f32): 716 GB/s effective vs 142 GB/s for the ELL
lane-gather form the frequency-major sweep uses — the round-1
"stencil variants are 14-17x slower" verdict (ARCHITECTURE.md §10) was an
artifact of shifting along the *lane* (minor) axis; with the frequency
axis minor, diagonal shifts are address offsets on the major axis.

Better still, the Helmholtz system K - k²M - ikαB is a 3-term combine
with *frequency-scalar* coefficients, so the per-frequency value table —
(F, N, W) complex, 2.3 GB at bench scale, rebuilt every sweep — never
needs to exist in this form: the matvec streams the three small
frequency-shared (D, N) real tables and applies the scalars per lane.

Reference analog: the CSR SpMV inside math-solvers/src/iterative/gmres.rs
and the rayon frequency loop of math-fem/bin/room_simulator_fem.rs:941.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def dia_pattern(row_of_slot, col_of_slot) -> Tuple[Tuple[int, ...], np.ndarray]:
    """Host-side: distinct diagonal offsets and the per-slot diagonal id.

    Returns (offsets, d_of_slot) with offsets a sorted python tuple
    (static under jit) and d_of_slot (nnz,) int32.
    """
    row = np.asarray(row_of_slot)
    col = np.asarray(col_of_slot)
    off = col - row
    offsets, d_of_slot = np.unique(off, return_inverse=True)
    return tuple(int(o) for o in offsets), d_of_slot.astype(np.int32)


def scatter_dia(vals, d_of_slot, row_of_slot, n_dia: int, n_rows: int):
    """CSR-ordered nnz values -> zero-padded DIA table (D, N).

    Entry (d, n) holds A[n, n + off_d] (zero where the diagonal leaves
    the band). Duplicate slots accumulate, matching scatter_ell/CSR
    dedup semantics.
    """
    flat = d_of_slot * n_rows + row_of_slot
    return (
        jnp.zeros(n_dia * n_rows, vals.dtype).at[flat].add(vals).reshape(n_dia, n_rows)
    )


class DiaTables(NamedTuple):
    """Frequency-shared DIA tables of one Helmholtz level (arrays only;
    the static offsets travel separately — see DiaOperator)."""

    k: jnp.ndarray  # (D, N) stiffness diagonals
    m: jnp.ndarray  # (D, N) mass diagonals
    b: jnp.ndarray  # (D, N) summed boundary-mass diagonals
    dk: jnp.ndarray  # (N,) main-diagonal stiffness
    dm: jnp.ndarray  # (N,)
    db: jnp.ndarray  # (N,)


def dia_tables_of(asm, b_sum) -> Tuple[Tuple[int, ...], DiaTables]:
    """Build (offsets, DiaTables) from a HelmholtzAssembler (host+device).

    ``b_sum``: summed boundary-mass nnz values (zeros when no Robin walls).
    """
    offsets, d_of_slot = dia_pattern(asm.row_of_slot, asm.col_of_slot)
    d_slot = jnp.asarray(d_of_slot)
    n, nd = asm.num_nodes, len(offsets)
    d0 = offsets.index(0)

    def tab(vals):
        return scatter_dia(vals, d_slot, asm.row_of_slot, nd, n)

    tk, tm, tb = tab(asm.k_vals), tab(asm.m_vals), tab(b_sum)
    return offsets, DiaTables(tk, tm, tb, tk[d0], tm[d0], tb[d0])


def _pad_amount(offsets: Tuple[int, ...]) -> int:
    b = max(abs(o) for o in offsets) if offsets else 0
    return (b + 7) // 8 * 8  # sublane-aligned padding


def dia_matvec(offsets: Tuple[int, ...], tables: DiaTables, cm, cb, x):
    """y = (K - cm M + cb B) x over a node-major batch.

    x: (N, F) complex; cm, cb: (F,) frequency scalars (cm real-valued as
    a complex array is fine); returns (N, F).

    Three real-table accumulators share each shifted read of x, then the
    frequency scalars combine them — per-frequency operator values are
    never materialized.
    """
    n = x.shape[0]
    pad = _pad_amount(offsets)
    xp = jnp.pad(x, ((pad, pad), (0, 0)))
    acc_k = jnp.zeros_like(x)
    acc_m = jnp.zeros_like(x)
    acc_b = jnp.zeros_like(x)
    for d, off in enumerate(offsets):
        xs = jax.lax.dynamic_slice_in_dim(xp, pad + off, n, axis=0)
        acc_k = acc_k + tables.k[d][:, None] * xs
        acc_m = acc_m + tables.m[d][:, None] * xs
        acc_b = acc_b + tables.b[d][:, None] * xs
    return acc_k - cm[None, :] * acc_m + cb[None, :] * acc_b


def dia_diag(tables: DiaTables, cm, cb):
    """Main diagonal (N, F) of K - cm M + cb B."""
    return (
        tables.dk[:, None].astype(cm.dtype)
        - cm[None, :] * tables.dm[:, None]
        + cb[None, :] * tables.db[:, None]
    )
