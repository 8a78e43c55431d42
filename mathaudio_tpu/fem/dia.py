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


def _use_dia_pallas(n: int, dtype) -> bool:
    """Route large c64 matvecs through the halo-tiled Pallas kernel when
    MATHAUDIO_DIA_PALLAS=1. Opt-in stays OFF: chip-measured at headline
    shape (N=9261, F=2048, examples/dia_matvec_ab.py) the kernel LOSES —
    13.1 ms/matvec (128x512 tiles) vs 3.1 ms for the XLA shifted-slice
    form, and 256x512/512x256 tiles exceed the 16M scoped-VMEM limit.
    XLA already fuses the D dynamic slices into one near-streaming pass;
    the Pallas form pays a sublane rotate per unaligned diagonal offset
    inside VMEM plus an unpipelined tile+halo DMA. Kept for the record
    (same measured-decision treatment as gmres_pipelined)."""
    import os

    return (
        os.environ.get("MATHAUDIO_DIA_PALLAS") == "1"
        and jax.default_backend() == "tpu"
        and jnp.dtype(dtype) == jnp.complex64
        and n >= 4096
    )


def dia_matvec(offsets: Tuple[int, ...], tables: DiaTables, cm, cb, x):
    """y = (K - cm M + cb B) x over a node-major batch.

    x: (N, F) complex; cm, cb: (F,) frequency scalars (cm real-valued as
    a complex array is fine); returns (N, F).

    SINGLE-accumulator form: the per-diagonal complex coefficient
    k_d[n] - cm_f m_d[n] + cb_f b_d[n] is computed in-register and one
    fused accumulation reads each shifted slice of x exactly once —
    15 slice reads + 1 write. The original three-real-accumulator form
    (one per table, combined at the end) let XLA split the fusion into
    per-table passes that re-read the slices: 3.97 ms vs 2.55 ms per
    matvec at headline shape (N=9261, F=2048, chip, round 4,
    examples/vcycle_breakdown.py). Same linear operator; association
    differs by ~1e-4 relative in f32 (within every solver gate — GMRES
    convergence is residual-gated, and the f64 validation tests pass at
    1e-10).
    """
    n = x.shape[0]
    if _use_dia_pallas(n, x.dtype):
        return dia_matvec_pallas(offsets, tables, cm, cb, x)
    pad = _pad_amount(offsets)
    xp = jnp.pad(x, ((pad, pad), (0, 0)))
    y = jnp.zeros_like(x)
    for d, off in enumerate(offsets):
        xs = jax.lax.dynamic_slice_in_dim(xp, pad + off, n, axis=0)
        coef = (
            tables.k[d][:, None]
            - cm[None, :] * tables.m[d][:, None]
            + cb[None, :] * tables.b[d][:, None]
        )
        y = y + coef * xs
    return y


def dia_diag(tables: DiaTables, cm, cb):
    """Main diagonal (N, F) of K - cm M + cb B."""
    return (
        tables.dk[:, None].astype(cm.dtype)
        - cm[None, :] * tables.dm[:, None]
        + cb[None, :] * tables.db[:, None]
    )


# ---------------------------------------------------------------------------
# Pallas halo-tiled DIA matvec: one pass over x instead of D shifted passes.
#
# The XLA form above reads x once per diagonal (D=15 dynamic slices of the
# padded buffer) — ~2.3 GB of HBM traffic per bench-shape matvec, measured
# at ~70% of copy bandwidth for that traffic (3.4 ms). The kernel below
# DMAs each node tile PLUS ITS HALO into VMEM once and applies all D
# diagonals from there, aiming to cut x traffic (tile + 2H)/tile-fold.
#
# MEASURED OUTCOME (chip, examples/dia_matvec_ab.py, N=9261 F=2048): the
# kernel LOSES 4.2x — 13.1 ms/matvec (128x512) vs 3.1 ms XLA. Two causes:
# every non-multiple-of-8 diagonal offset makes xs_ref[pl.ds(...)] a
# sublane rotate of the whole tile (15 of them, x3 tables), and the
# manual start/wait DMA never overlaps compute. XLA meanwhile fuses the
# 15 shifted reads into one near-streaming loop on its own. The kernel
# stays as an opt-in record; the XLA form is the production path.
#
# Complex handling with REAL tables is free: x.view(float32) interleaves
# re/im in the lane dimension (lane 2f = Re f, 2f+1 = Im f), and the three
# accumulators are real linear maps, so they act on the interleaved view
# unchanged. Only the final frequency-scalar combine mixes the lanes: a
# complex multiply on interleaved lanes is s1*m + s2*roll(m, -1) +
# s3*roll(m, +1) with parity-masked scalar lane vectors (see
# _combine_scalars) — two lane rolls per accumulator, no relayout.
# ---------------------------------------------------------------------------


def _combine_scalars(cm, cb, rdtype):
    """(6, 2F) parity-masked lane vectors of the interleaved combine
    y = acc_k - cm*acc_m + cb*acc_b. Row order: s1m, s2m, s3m, s1b,
    s2b, s3b, where term = s1*acc + s2*roll(acc,-1) + s3*roll(acc,+1)."""
    a, b = jnp.real(cm).astype(rdtype), jnp.imag(cm).astype(rdtype)
    c, d = jnp.real(cb).astype(rdtype), jnp.imag(cb).astype(rdtype)
    z = jnp.zeros_like(a)

    def interleave(ev, od):
        return jnp.stack([ev, od], axis=-1).reshape(-1)

    # -cm * m: even (re) lanes -a*m[2f] + b*m[2f+1]; odd -a*m[2f+1] - b*m[2f]
    s1m = interleave(-a, -a)
    s2m = interleave(b, z)  # roll(-1) brings lane 2f+1 to 2f
    s3m = interleave(z, -b)  # roll(+1) brings lane 2f to 2f+1
    # +cb * b: (c+di)(u+vi) = (cu - dv) + (cv + du)i
    s1b = interleave(c, c)
    s2b = interleave(-d, z)
    s3b = interleave(z, d)
    return jnp.stack([s1m, s2m, s3m, s1b, s2b, s3b])


def _dia_kernel(offsets, halo, tile_n, scal_ref, tabk_ref, tabm_ref, tabb_ref,
                x_hbm, y_ref, xs_ref, sem):
    """One (node-tile, lane-tile) program: DMA the tile+halo rows of the
    interleaved x view into VMEM, accumulate the three real stencils with
    static in-VMEM offsets, combine with the parity-masked scalars."""
    import jax.experimental.pallas.tpu as pltpu
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    j = pl.program_id(1)
    lt = xs_ref.shape[1]
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * tile_n, tile_n + 2 * halo),
                 pl.ds(j * lt, lt)],
        xs_ref,
        sem,
    )
    dma.start()
    dma.wait()

    acc_k = jnp.zeros(y_ref.shape, y_ref.dtype)
    acc_m = jnp.zeros(y_ref.shape, y_ref.dtype)
    acc_b = jnp.zeros(y_ref.shape, y_ref.dtype)
    for dd, off in enumerate(offsets):  # static unroll over diagonals
        xs = xs_ref[pl.ds(halo + off, tile_n), :]
        acc_k += tabk_ref[dd, :][:, None] * xs
        acc_m += tabm_ref[dd, :][:, None] * xs
        acc_b += tabb_ref[dd, :][:, None] * xs

    import jax.experimental.pallas.tpu as _pt

    def cmul(acc, s1, s2, s3):
        # pltpu.roll wants non-negative shifts: -1 == lt-1 (circular)
        return (
            s1[None, :] * acc
            + s2[None, :] * _pt.roll(acc, lt - 1, 1)
            + s3[None, :] * _pt.roll(acc, 1, 1)
        )

    y_ref[:] = (
        acc_k
        + cmul(acc_m, scal_ref[0, :], scal_ref[1, :], scal_ref[2, :])
        + cmul(acc_b, scal_ref[3, :], scal_ref[4, :], scal_ref[5, :])
    )


def dia_matvec_pallas(offsets: Tuple[int, ...], tables: DiaTables, cm, cb, x,
                      tile_n: int = 128, lane_tile: int = 512):
    """Pallas form of :func:`dia_matvec` — identical semantics.

    x (N, F) complex64/128 -> (N, F); complex128 falls back to the XLA
    form (no f64 on the TPU vector units). Default tiles are the best
    measured config (128x512: 13.1 ms at headline shape — still 4.2x
    SLOWER than the XLA form, see _use_dia_pallas; tile_n*lane_tile
    beyond ~64K f32 with the D-way unroll exceeds scoped VMEM)."""
    from functools import partial

    import jax.experimental.pallas.tpu as pltpu
    from jax.experimental import pallas as pl

    if x.dtype != jnp.complex64:
        return dia_matvec(offsets, tables, cm, cb, x)
    n, f = x.shape
    rdt = jnp.float32
    halo = _pad_amount(offsets)
    pad_n = (-n) % tile_n
    xv = x.view(rdt)  # (N, 2F) interleaved — free reinterpret
    lanes = 2 * f
    pad_l = (-lanes) % lane_tile
    xp = jnp.pad(xv, ((halo, halo + pad_n), (0, pad_l)))
    nt = (n + pad_n) // tile_n
    lt_count = (lanes + pad_l) // lane_tile

    scal = _combine_scalars(cm.astype(jnp.complex64), cb.astype(jnp.complex64), rdt)
    scal = jnp.pad(scal, ((0, 0), (0, pad_l)))
    tabs = [
        jnp.pad(t.astype(rdt), ((0, 0), (0, pad_n)))
        for t in (tables.k, tables.m, tables.b)
    ]
    d_count = tabs[0].shape[0]

    out = pl.pallas_call(
        partial(_dia_kernel, tuple(offsets), halo, tile_n),
        grid=(nt, lt_count),
        in_specs=[
            pl.BlockSpec((6, lane_tile), lambda i, j: (0, j)),
            pl.BlockSpec((d_count, tile_n), lambda i, j: (0, i)),
            pl.BlockSpec((d_count, tile_n), lambda i, j: (0, i)),
            pl.BlockSpec((d_count, tile_n), lambda i, j: (0, i)),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM, DMA'd
        ],
        out_specs=pl.BlockSpec((tile_n, lane_tile), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n + pad_n, lanes + pad_l), rdt),
        scratch_shapes=[
            pltpu.VMEM((tile_n + 2 * halo, lane_tile), rdt),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=jax.default_backend() == "cpu",
    )(scal, tabs[0], tabs[1], tabs[2], xp)
    return out[:n, :lanes].view(x.dtype)
