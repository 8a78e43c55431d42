"""Node-major batched geometric multigrid: one trace preconditioning all
F frequencies at once, with every level operator in DIA form.

The vmapped mg_cycle (fem/multigrid.py) is frequency-major: level
matvecs lane-gather and each frequency carries its own (N, W) complex
value table (built per sweep, 2.3 GB at bench scale). Here vectors are
(N_l, F) node-major, level matvecs are DIA streaming shifts over
frequency-shared real tables (fem/dia.py), per-frequency operator values
are never materialized, and the anchored coarse solve is a plain
(2Nc, 2Nc) x (2Nc, chunk) MXU matmul per anchor.

Reference analog: math-fem/src/solver/multigrid/cycle.rs V/W/F cycles,
restructured for a lane-resident frequency batch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mathaudio_tpu.fem.dia import DiaTables, dia_diag, dia_matvec


class DiaLevel(NamedTuple):
    """Arrays of one smoothing level (static offsets travel separately)."""

    tables: DiaTables  # frequency-shared (D, N_l) real tables
    p_idx: jnp.ndarray  # (N_l, 2^d) prolongation from level l+1
    p_w: jnp.ndarray  # (N_l, 2^d)
    r_idx: jnp.ndarray  # (N_{l+1}, K) transposed (restriction) stencil
    r_w: jnp.ndarray  # (N_{l+1}, K)


class DiaMg(NamedTuple):
    """Batched-cycle state: levels + per-level frequency scalars +
    optionally precomputed inverse diagonals (empty when fused — the
    make_dia_mg fuse_diag default) + anchored coarse inverses."""

    levels: Tuple[DiaLevel, ...]
    cms: Tuple[jnp.ndarray, ...]  # per-level (F,) mass coefficients
    cbs: Tuple[jnp.ndarray, ...]  # per-level (F,) boundary coefficients
    # Per-level (N_l, F) precomputed inverse diagonals, or () to compute
    # them on the fly inside each smoothing expression from the three
    # per-node real diagonal tables (dk/dm/db) + frequency scalars —
    # trading a fused broadcast+reciprocal recompute for the (N, F)
    # complex reads (the default; see make_dia_mg fuse_diag).
    inv_diags: Tuple[jnp.ndarray, ...]
    anchor_inv: jnp.ndarray  # (n_anchor, 2Nc, 2Nc) real-embedded inverses
    # Per-level separable transfer: () to use the gather stencil, or
    # (pz, py, px) 1D prolongation matrices, each (n_f_ax+1, n_c_ax+1).
    tp: Tuple[tuple, ...] = ()
    # Per-MESH (nx, ny, nz) node counts (len(levels)+1 entries, static
    # Python ints) to apply the transfers as streaming per-axis
    # interleaves/decimations (_prolong_stream/_restrict_stream) — no
    # gather, no matmul padding. () keeps the gather/tp dispatch.
    dims: Tuple[Tuple[int, int, int], ...] = ()
    # With dims set: route the streaming transfers through bf16 re/im
    # planes (half the HBM bytes; preconditioner-internal ~4e-3 rounding
    # — the cycle stays a fixed linear-to-rounding map, GMRES convergence
    # is still gated on the Givens/true residuals). MEASURED LOSER on
    # the bench band: the rounding triples iteration counts (5.5 -> 18.1
    # avg) — see models/room_sweep_nm.py sweep_fn for the full record.
    transfer_bf16: bool = False


def make_dia_mg(
    offsets: Tuple[Tuple[int, ...], ...],
    levels: Tuple[DiaLevel, ...],
    ks,
    absorption: float,
    anchor_inv,
    shift: Tuple[float, float] = (1.0, 0.5),
    tp: Tuple[tuple, ...] = (),
    fuse_diag: bool = True,
    dims: Tuple[Tuple[int, int, int], ...] = (),
    transfer_bf16: bool = False,
) -> DiaMg:
    """Per-frequency scalars + inverse diagonals for one solve batch.

    Level 0 smooths on the TRUE operator (cm = k², the fine system);
    deeper levels use the shifted-Laplacian operator cm = (b1+ib2) k²
    (matching models.helmholtz_room.sweep_pressure's level-0 reuse).

    ``fuse_diag`` (default): skip precomputing the per-level (N_l, F)
    inverse diagonals; the cycle recomputes them inside each smoothing
    expression from the three per-node real tables + frequency scalars,
    so the smoother reads 3 (N,) vectors instead of one (N, F) complex
    array per application. Pass False to precompute (the original form).
    """
    del offsets  # shape bookkeeping only; kept in the signature for parity
    cd = levels[0].tables.k.dtype
    cd = jnp.result_type(cd, jnp.complex64)
    k = ks.astype(cd)
    b1, b2 = shift
    zshift = jnp.asarray(b1 + 1j * b2, cd)
    cb = jnp.asarray(-1j * absorption, cd) * k  # (F,), all levels
    cms, cbs, inv_diags = [], [], []
    for l, lvl in enumerate(levels):
        cm = (k * k) if l == 0 else zshift * (k * k)
        if not fuse_diag:
            diag = dia_diag(lvl.tables, cm, cb)
            inv_diags.append(jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 1.0))
        cms.append(cm)
        cbs.append(cb)
    return DiaMg(tuple(levels), tuple(cms), tuple(cbs), tuple(inv_diags),
                 anchor_inv, tuple(tp), tuple(dims), transfer_bf16)


def _real_view(x):
    """(N, F) complex -> ((N, 2F) real lane-interleaved view, undo).

    The transfers are real linear maps over nodes, so they apply to the
    re/im-interleaved float view unchanged — all matmuls stay real."""
    rdt = jnp.float32 if x.dtype == jnp.complex64 else jnp.float64
    return x.view(rdt), lambda y: y.view(x.dtype)


def _prolong_tp(tp, xc):
    """Separable prolongation on a lexicographic box grid (x fastest):
    P = Pz (x) Py (x) Px applied as three streamed per-axis matmuls —
    no gathers at all. Exact same operator as the stencil path
    (fem.multigrid.structured_prolongation is separable trilinear).
    ~6x faster than the 2^d-point row gather in isolation, but SLOWER
    inside the full sweep (relayouts around the 4D einsum views), so the
    gather path stays the default — see room_sweep_nm.sweep_fn."""
    pz, py, px = tp
    cz, cy, cx = pz.shape[1], py.shape[1], px.shape[1]
    xr, undo = _real_view(xc)
    x4 = xr.reshape(cz, cy, cx, xr.shape[1])
    rdt = x4.dtype
    x4 = jnp.einsum("zyxl,Xx->zyXl", x4, px.astype(rdt))
    x4 = jnp.einsum("zyxl,Yy->zYxl", x4, py.astype(rdt))
    x4 = jnp.einsum("zyxl,Zz->Zyxl", x4, pz.astype(rdt))
    return undo(x4.reshape(pz.shape[0] * py.shape[0] * px.shape[0], -1))


def _restrict_tp(tp, rf):
    """Separable restriction R = P^T: the same three per-axis matmuls
    with the 1D factors transposed (largest axis contracted first so the
    intermediate shrinks fastest)."""
    pz, py, px = tp
    fz, fy, fx = pz.shape[0], py.shape[0], px.shape[0]
    xr, undo = _real_view(rf)
    x4 = xr.reshape(fz, fy, fx, xr.shape[1])
    rdt = x4.dtype
    x4 = jnp.einsum("zyxl,zZ->Zyxl", x4, pz.astype(rdt))
    x4 = jnp.einsum("zyxl,yY->zYxl", x4, py.astype(rdt))
    x4 = jnp.einsum("zyxl,xX->zyXl", x4, px.astype(rdt))
    return undo(x4.reshape(pz.shape[1] * py.shape[1] * px.shape[1], -1))


def _interp_axis(x, n: int):
    """1D linear interpolation along axis 1 of (pre, n, post):
    even output rows copy the input, odd rows average neighbours —
    exactly prolongation_1d's rows (fem/multigrid.py:129)."""
    pre, _, post = x.shape
    mid = 0.5 * (x[:, :-1, :] + x[:, 1:, :])
    core = jnp.stack([x[:, :-1, :], mid], axis=2).reshape(pre, 2 * (n - 1), post)
    return jnp.concatenate([core, x[:, -1:, :]], axis=1)


def _decimate_axis(x, n_c: int):
    """Transpose of :func:`_interp_axis` along axis 1 of (pre, n_f, post):
    r[c] = f[2c] + 0.5 (f[2c-1] + f[2c+1]) via two strided row slices —
    no gather, no matmul padding."""
    even = x[:, ::2, :]
    oddp = jnp.pad(x[:, 1::2, :], ((0, 0), (1, 1), (0, 0)))
    return even + 0.5 * (oddp[:, :-1, :] + oddp[:, 1:, :])


def _prolong_stream(dims_c, xc):
    """Separable streaming prolongation on a lexicographic box grid:
    (N_c, F) -> (N_f, F) as three per-axis interleaves (x fastest axis
    last in memory-major order z, y, x). Same operator as the gather
    stencil and the TP matmuls; unlike the matmuls it never pads the
    tiny grid axes to MXU tiles — every pass is VPU slice/add traffic.
    ``dims_c`` = (nx_c, ny_c, nz_c) node counts (static)."""
    nxc, nyc, nzc = dims_c
    f = xc.shape[1]
    x = _interp_axis(xc.reshape(nzc * nyc, nxc, f), nxc)
    nxf = 2 * nxc - 1
    x = _interp_axis(x.reshape(nzc, nyc, nxf * f), nyc)
    nyf = 2 * nyc - 1
    x = _interp_axis(x.reshape(1, nzc, nyf * nxf * f), nzc)
    return x.reshape((2 * nzc - 1) * nyf * nxf, f)


def _restrict_stream(dims_f, rf):
    """Separable streaming restriction R = P^T: (N_f, F) -> (N_c, F) as
    three per-axis decimations, largest (outermost) axis first so the
    fine-grained x pass runs on the smallest intermediate."""
    nxf, nyf, nzf = dims_f
    f = rf.shape[1]
    x = _decimate_axis(rf.reshape(1, nzf, nyf * nxf * f), (nzf + 1) // 2)
    nzc = (nzf + 1) // 2
    x = _decimate_axis(x.reshape(nzc, nyf, nxf * f), (nyf + 1) // 2)
    nyc = (nyf + 1) // 2
    x = _decimate_axis(x.reshape(nzc * nyc, nxf, f), (nxf + 1) // 2)
    return x.reshape(nzc * nyc * ((nxf + 1) // 2), f)


def _prolong_stream16(dims_c, xc):
    """Streaming prolongation with the traffic in bfloat16 planes:
    complex-bf16 does not exist, so the (N, F) complex vector is split
    into re/im bf16 planes, each prolonged by :func:`_prolong_stream`,
    and recombined in the caller's dtype. Half the HBM bytes of the
    native form (probe: 2x0.71 ms vs 2.25 ms at bench shape,
    examples/bf16_vcycle_probe.py). Only for preconditioner-internal
    transfers: the planes carry ~4e-3 relative rounding."""
    pr = _prolong_stream(dims_c, jnp.real(xc).astype(jnp.bfloat16))
    pi = _prolong_stream(dims_c, jnp.imag(xc).astype(jnp.bfloat16))
    return jax.lax.complex(pr.astype(jnp.float32), pi.astype(jnp.float32)).astype(xc.dtype)


def _restrict_stream16(dims_f, rf):
    """Streaming restriction on bf16 re/im planes (see _prolong_stream16;
    probe: 2x0.70 ms vs 3.92 ms native at bench shape)."""
    rr = _restrict_stream(dims_f, jnp.real(rf).astype(jnp.bfloat16))
    ri = _restrict_stream(dims_f, jnp.imag(rf).astype(jnp.bfloat16))
    return jax.lax.complex(rr.astype(jnp.float32), ri.astype(jnp.float32)).astype(rf.dtype)


def _prolong_b(lvl: DiaLevel, xc, tp=(), dims_c=(), bf16: bool = False):
    """(N_c, F) -> (N_f, F): streaming per-axis interleave when the
    coarse grid dims are known, separable matmuls when the level carries
    1D factors, row-gather interpolation otherwise. Stream beats gather
    1.44x in isolation at bench shape (examples/mg_transfer_ab.py) but
    LOSES in the full chip sweep (8.59e7 vs 9.0e7 DoF-solves/s) — gather
    stays the production default."""
    if dims_c:
        return _prolong_stream16(dims_c, xc) if bf16 else _prolong_stream(dims_c, xc)
    if tp:
        return _prolong_tp(tp, xc)
    w = lvl.p_w.astype(xc.dtype)[:, :, None]
    return jnp.sum(w * jnp.take(xc, lvl.p_idx, axis=0), axis=1)


def _restrict_b(lvl: DiaLevel, rf, n_coarse: int, tp=(), dims_f=(), bf16: bool = False):
    """(N_f, F) -> (N_c, F): R = P^T — streaming per-axis decimation when
    the fine grid dims are known (1.23x vs gather, mg_transfer_ab.py),
    separable matmuls when 1D factors are available, else a coarse-side
    row gather (fem.multigrid.transpose_transfer). The scatter-add form
    this replaces serialized on TPU: 22 ms vs 0.9 ms per pass at bench
    scale (examples/fem_roofline_nm.py)."""
    del n_coarse  # shape comes from the transposed stencil
    if dims_f:
        return _restrict_stream16(dims_f, rf) if bf16 else _restrict_stream(dims_f, rf)
    if tp:
        return _restrict_tp(tp, rf)
    w = lvl.r_w.astype(rf.dtype)[:, :, None]
    return jnp.sum(w * jnp.take(rf, lvl.r_idx, axis=0), axis=1)


def _coarse_solve_b(anchor_inv, r):
    """Anchored real-embedded coarse solve: r (Nc, F) with F laid out as
    n_anchor contiguous chunks -> (Nc, F). One MXU matmul per anchor."""
    nc, nf = r.shape
    na = anchor_inv.shape[0]
    chunk = nf // na
    r2 = jnp.concatenate([jnp.real(r), jnp.imag(r)], axis=0)  # (2Nc, F)
    r3 = r2.reshape(2 * nc, na, chunk)
    x3 = jnp.einsum("aij,jac->iac", anchor_inv.astype(r2.dtype), r3)
    x2 = x3.reshape(2 * nc, nf)
    return jax.lax.complex(x2[:nc], x2[nc:]).astype(r.dtype)


def mg_cycle_batched(
    mgp: DiaMg,
    offsets: Tuple[Tuple[int, ...], ...],
    r,
    omega: float = 2.0 / 3.0,
    nu: int = 1,
    level: int = 0,
    cycle: str = "v",
    nu_post: Optional[int] = None,
):
    """One batched multigrid cycle: x ~ P^{-1} r, r (N_l, F).

    Same recursion as fem.multigrid.mg_cycle (V/W/F, Jacobi smoothing,
    trace-time unrolled levels), node-major and DIA throughout.
    """
    if cycle not in ("v", "w", "f"):
        raise ValueError(f"unknown multigrid cycle type {cycle!r}")
    if level == len(mgp.levels):
        return _coarse_solve_b(mgp.anchor_inv, r)
    if nu_post is None:
        nu_post = nu
    # per-level smoothing counts: a tuple/list gives each level its own
    # nu (e.g. (1, 2): single fine smooth, double level-1 smooth — the
    # cheap way to strengthen the coarse correction without the
    # W-cycle's doubled transfers)
    nu_here = nu[level] if isinstance(nu, (tuple, list)) else nu
    nu_post_here = nu_post[level] if isinstance(nu_post, (tuple, list)) else nu_post
    lvl = mgp.levels[level]
    cm, cb = mgp.cms[level], mgp.cbs[level]
    if mgp.inv_diags:
        inv_diag = mgp.inv_diags[level]
    else:  # fused: recomputed per use from 3 (N,) tables (make_dia_mg)
        diag = dia_diag(lvl.tables, cm, cb)
        inv_diag = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 1.0)
    mv = lambda v: dia_matvec(offsets[level], lvl.tables, cm, cb, v)
    om = jnp.asarray(omega, r.dtype)
    if nu_here == 0:  # V(0, nu_post): no pre-smoothing — saves one fine
        # matvec per cycle (chip: 4.0 ms at bench shape); the coarse
        # grid corrects the raw residual, post-smoothing cleans up.
        x = jnp.zeros_like(r)
        res = r
    else:
        x = om * inv_diag * r
        for _ in range(nu_here - 1):
            x = x + om * inv_diag * (r - mv(x))
        res = r - mv(x)
    n_coarse = (
        mgp.levels[level + 1].tables.dk.shape[0]
        if level + 1 < len(mgp.levels)
        else mgp.anchor_inv.shape[1] // 2
    )
    tp_l = mgp.tp[level] if level < len(mgp.tp) else ()
    dims_f = mgp.dims[level] if level < len(mgp.dims) else ()
    dims_c = mgp.dims[level + 1] if level + 1 < len(mgp.dims) else ()
    rc = _restrict_b(lvl, res, n_coarse, tp_l, dims_f, mgp.transfer_bf16)
    xc = mg_cycle_batched(mgp, offsets, rc, omega, nu, level + 1, cycle, nu_post)
    if cycle in ("w", "f") and level + 1 < len(mgp.levels):
        nxt = mgp.levels[level + 1]
        mv_c = lambda v: dia_matvec(
            offsets[level + 1], nxt.tables, mgp.cms[level + 1], mgp.cbs[level + 1], v
        )
        rc2 = rc - mv_c(xc)
        second = "v" if cycle == "f" else "w"
        xc = xc + mg_cycle_batched(mgp, offsets, rc2, omega, nu, level + 1, second, nu_post)
    x = x + _prolong_b(lvl, xc, tp_l, dims_c, mgp.transfer_bf16)
    for _ in range(nu_post_here):
        x = x + om * inv_diag * (r - mv(x))
    return x
