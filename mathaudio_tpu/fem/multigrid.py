"""Geometric multigrid + shifted-Laplacian preconditioning.

Counterpart of math-fem/src/multigrid/ (hierarchy.rs:85-147, cycle.rs,
smoother.rs, transfer.rs) and the Erlangga shifted-Laplacian
preconditioner (solver/mod.rs:1438 ShiftedLaplacianConfig).

TPU shaping:
- hierarchy on *structured* meshes by factor-2 coarsening (the reference
  coarsens by node subsampling, hierarchy.rs:128); transfers are exact
  multilinear interpolation stencils stored as padded ELL operators,
- smoothing is damped Jacobi (omega = 2/3) — pure elementwise + SpMV,
- the V-cycle recursion is unrolled over static levels inside jit,
- the coarsest complex solve applies a real-embedded explicit inverse
  (one MXU matmul per visit — batched triangular substitution is
  latency-bound on TPU and dominated the V-cycle),
- all state is pytrees of arrays (no static ints as leaves), and
  ``build_mg_params`` is a *pure jittable function of k*, so the whole
  preconditioner construction vmaps over a frequency batch.

For indefinite Helmholtz, multigrid is applied to the *shifted* operator
P = K - (beta1 + i beta2) k^2 M (+ absorbing boundary terms), and GMRES
is preconditioned with one V-cycle on P — the standard complex-shifted-
Laplacian scheme the reference implements as GmresShiftedLaplacianMg.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from mathaudio_tpu.fem.assembly import HelmholtzAssembler, scatter_diag, scatter_ell
from mathaudio_tpu.fem.mesh import Mesh, box_mesh_tetrahedra, rectangular_mesh_triangles
from mathaudio_tpu.xtypes import complex_dtype_for, default_float


def box_hierarchy(n: int, levels: int, bounds=(0.0, 1.0, 0.0, 1.0, 0.0, 1.0)) -> List[Mesh]:
    """Fine-to-coarse nested box meshes; n must be divisible by 2^(levels-1)."""
    assert n % (2 ** (levels - 1)) == 0, (n, levels)
    x0, x1, y0, y1, z0, z1 = bounds
    return [
        box_mesh_tetrahedra(x0, x1, y0, y1, z0, z1, n >> l, n >> l, n >> l)
        for l in range(levels)
    ]


def rect_hierarchy(n: int, levels: int, bounds=(0.0, 1.0, 0.0, 1.0)) -> List[Mesh]:
    assert n % (2 ** (levels - 1)) == 0, (n, levels)
    x0, x1, y0, y1 = bounds
    return [rectangular_mesh_triangles(x0, x1, y0, y1, n >> l, n >> l) for l in range(levels)]


def box_hierarchy_dims(dims, levels: int, bounds=(0.0, 1.0, 0.0, 1.0, 0.0, 1.0)):
    """Anisotropic nested box hierarchy: dims = (nx, ny, nz), each
    divisible by 2^(levels-1). Returns (meshes, per-level grid dims)."""
    nx, ny, nz = dims
    for n in dims:
        assert n % (2 ** (levels - 1)) == 0, (dims, levels)
    x0, x1, y0, y1, z0, z1 = bounds
    meshes = [
        box_mesh_tetrahedra(x0, x1, y0, y1, z0, z1, nx >> l, ny >> l, nz >> l)
        for l in range(levels)
    ]
    grid_dims = [(nx >> l, ny >> l, nz >> l) for l in range(levels)]
    return meshes, grid_dims


def structured_prolongation(n_f, n_c, dim: int):
    """P (fine x coarse) interpolation stencil for nested structured grids
    with prod(n+1) lexicographic nodes (x fastest, matching the mesh
    generators); exact for P1 on nested Kuhn grids (transfer.rs:11-64).
    ``n_f``/``n_c`` may be ints (isotropic) or per-axis tuples.
    Returns (idx (F, 2^dim), w (F, 2^dim)) padded with zero weights."""
    if np.isscalar(n_f):
        n_f = (n_f,) * dim
    if np.isscalar(n_c):
        n_c = (n_c,) * dim
    assert all(f == 2 * c for f, c in zip(n_f, n_c)), (n_f, n_c)
    if dim == 2:
        jj, ii = np.meshgrid(np.arange(n_f[1] + 1), np.arange(n_f[0] + 1), indexing="ij")
        coords = np.stack([ii.reshape(-1), jj.reshape(-1)], axis=1)
    else:
        kk, jj, ii = np.meshgrid(
            np.arange(n_f[2] + 1),
            np.arange(n_f[1] + 1),
            np.arange(n_f[0] + 1),
            indexing="ij",
        )
        coords = np.stack([ii.reshape(-1), jj.reshape(-1), kk.reshape(-1)], axis=1)

    stencil = 2**dim
    n_fine = coords.shape[0]
    idx = np.zeros((n_fine, stencil), np.int32)
    w = np.zeros((n_fine, stencil), np.float64)

    def coarse_id(c):
        out = 0
        for ax in reversed(range(dim)):
            out = out * (n_c[ax] + 1) + c[ax]
        return out

    for f in range(n_fine):
        lo = coords[f] // 2
        frac = coords[f] - 2 * lo  # 0 or 1 per axis
        s = 0
        for corner in range(stencil):
            c = lo.copy()
            weight = 1.0
            ok = True
            for ax in range(dim):
                bit = (corner >> ax) & 1
                if frac[ax] == 0:
                    if bit == 1:
                        ok = False
                        break
                else:
                    c[ax] = lo[ax] + bit
                    weight *= 0.5
            if ok:
                idx[f, s] = coarse_id(c)
                w[f, s] = weight
                s += 1
    return idx, w


def prolongation_1d(n_c: int) -> np.ndarray:
    """Dense (2*n_c+1, n_c+1) 1D linear-interpolation prolongation.

    structured_prolongation is separable: P = Pz (x) Py (x) Px with these
    1D factors (even fine node -> its coarse node, odd -> the two
    neighbours at 0.5 each). The node-major batched cycle applies them as
    three streamed matmuls instead of a 2^d-point gather
    (fem.multigrid_batched._prolong_tp)."""
    n_f = 2 * n_c
    p = np.zeros((n_f + 1, n_c + 1))
    c = np.arange(n_c + 1)
    p[2 * c, c] = 1.0
    p[2 * c[:-1] + 1, c[:-1]] = 0.5
    p[2 * c[:-1] + 1, c[:-1] + 1] = 0.5
    return p


def box_grid_dims(mesh) -> Optional[Tuple[int, int, int]]:
    """(nx+1, ny+1, nz+1) if ``mesh`` is a lexicographic 3D box grid
    (x fastest, matching fem.mesh._box_nodes), else None."""
    nodes = np.asarray(mesh.nodes)
    if nodes.ndim != 2 or nodes.shape[1] != 3:
        return None
    xs, ys, zs = (np.unique(nodes[:, a]) for a in range(3))
    if len(xs) * len(ys) * len(zs) != nodes.shape[0]:
        return None
    zz, yy, xx = np.meshgrid(zs, ys, xs, indexing="ij")
    ref = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], axis=1)
    if not np.allclose(ref, nodes):
        return None
    return len(xs), len(ys), len(zs)


def transpose_transfer(p_idx, p_w, n_coarse: int):
    """Host-side transpose of a padded prolongation stencil.

    Restriction is R = P^T; applied as a scatter-add over the fine rows
    it serializes on TPU (scatters are the slowest memory op on the
    chip — measured 22 ms/pass at bench scale vs 0.9 ms for the gather
    form, examples/fem_roofline_nm.py). This precomputes the transpose
    as a padded gather stencil instead: for each coarse node, the fine
    nodes it interpolates into and their weights.

    Returns (r_idx (N_c, K), r_w (N_c, K)) with zero-weight padding
    (padded index slots point at fine row 0).
    """
    pi = np.asarray(p_idx)
    pw = np.asarray(p_w)
    nf, c = pi.shape
    fine = np.repeat(np.arange(nf, dtype=np.int64), c)
    coarse = pi.reshape(-1).astype(np.int64)
    wts = pw.reshape(-1)
    keep = wts != 0
    fine, coarse, wts = fine[keep], coarse[keep], wts[keep]
    order = np.argsort(coarse, kind="stable")
    fine, coarse, wts = fine[order], coarse[order], wts[order]
    counts = np.bincount(coarse, minlength=n_coarse)
    k_max = int(counts.max()) if counts.size else 1
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(coarse.size) - starts[coarse]
    r_idx = np.zeros((n_coarse, k_max), np.int32)
    r_w = np.zeros((n_coarse, k_max), pw.dtype)
    r_idx[coarse, pos] = fine
    r_w[coarse, pos] = wts
    return r_idx, r_w


class MgLevel(NamedTuple):
    """All leaves are arrays (safe to pass across jit boundaries)."""

    ell_indices: jnp.ndarray  # (N_l, W_l) int32
    ell_values: jnp.ndarray  # (N_l, W_l) complex
    inv_diag: jnp.ndarray  # (N_l,) complex
    p_idx: jnp.ndarray  # (N_l, 2^d) prolongation from level l+1
    p_w: jnp.ndarray  # (N_l, 2^d)
    r_idx: jnp.ndarray  # (N_{l+1}, K) transposed (restriction) stencil
    r_w: jnp.ndarray  # (N_{l+1}, K)


class MgParams(NamedTuple):
    levels: Tuple[MgLevel, ...]
    coarse_inv: jnp.ndarray  # (2Nc, 2Nc) real-embedded explicit inverse


class MgBuilderLevel(NamedTuple):
    """Per-level frequency-independent pieces (arrays only)."""

    k_vals: jnp.ndarray
    m_vals: jnp.ndarray
    b_sum: jnp.ndarray  # summed tagged boundary-mass values (may be zeros)
    csr2ell: jnp.ndarray
    ell_indices: jnp.ndarray
    row_of_slot: jnp.ndarray
    col_of_slot: jnp.ndarray
    p_idx: jnp.ndarray  # zero-size dummy at the coarsest level
    p_w: jnp.ndarray
    r_idx: jnp.ndarray  # (N_{l+1}, K) transposed (restriction) stencil
    r_w: jnp.ndarray  # zero-size dummy at the coarsest level


class MgBuilder(NamedTuple):
    levels: Tuple[MgBuilderLevel, ...]


class GeometricMultigrid:
    """Host-side factory: assembles each level once, emits an MgBuilder
    pytree; ``build_mg_params`` then assembles the preconditioner for any
    wavenumber *inside jit*."""

    def __init__(
        self,
        meshes: Sequence[Mesh],
        robin_tags: Sequence[int] = (),
        dtype=None,
        grid_dims: Optional[Sequence] = None,
    ):
        """``grid_dims``: per-level (nx[, ny[, nz]]) tuples for
        anisotropic grids; inferred as isotropic if omitted."""
        self.dtype = dtype or default_float()
        self.cdtype = complex_dtype_for(self.dtype)
        self.meshes = list(meshes)
        self.assemblers = [
            HelmholtzAssembler(m, robin_tags=tuple(robin_tags), dtype=self.dtype)
            for m in self.meshes
        ]
        lvls = []
        for l, asm in enumerate(self.assemblers):
            if l < len(self.meshes) - 1:
                dim = self.meshes[l].dim
                if grid_dims is not None:
                    n_f = tuple(grid_dims[l])
                    n_c = tuple(grid_dims[l + 1])
                else:
                    n_f = round(self.meshes[l].num_nodes ** (1 / dim)) - 1
                    n_c = round(self.meshes[l + 1].num_nodes ** (1 / dim)) - 1
                p_idx, p_w = structured_prolongation(n_f, n_c, dim)
                r_idx, r_w = transpose_transfer(
                    p_idx, p_w, self.meshes[l + 1].num_nodes
                )
                p_idx = jnp.asarray(p_idx)
                p_w = jnp.asarray(p_w, self.dtype)
                r_idx = jnp.asarray(r_idx)
                r_w = jnp.asarray(r_w, self.dtype)
            else:
                p_idx = jnp.zeros((0, 1), jnp.int32)
                p_w = jnp.zeros((0, 1), self.dtype)
                r_idx = jnp.zeros((0, 1), jnp.int32)
                r_w = jnp.zeros((0, 1), self.dtype)
            b_sum = (
                sum(asm.b_vals.values())
                if asm.b_vals
                else jnp.zeros_like(asm.k_vals)
            )
            lvls.append(
                MgBuilderLevel(
                    asm.k_vals,
                    asm.m_vals,
                    b_sum,
                    asm.csr2ell,
                    asm.ell_indices,
                    asm.row_of_slot,
                    asm.col_of_slot,
                    p_idx,
                    p_w,
                    r_idx,
                    r_w,
                )
            )
        self.builder = MgBuilder(tuple(lvls))


def _level_values(bl: MgBuilderLevel, k, robin_coeff, shift):
    b1, b2 = shift
    cd = complex_dtype_for(bl.k_vals.dtype)
    zshift = jnp.asarray(b1 + 1j * b2, cd)
    return (
        bl.k_vals.astype(cd)
        - zshift * jnp.asarray(k**2).astype(cd) * bl.m_vals.astype(cd)
        + jnp.asarray(robin_coeff, cd) * bl.b_sum.astype(cd)
    )


def build_mg_levels(
    builder: MgBuilder,
    k,
    robin_coeff=0.0,
    shift: Tuple[float, float] = (1.0, 0.5),
) -> Tuple[MgLevel, ...]:
    """The ELL smoothing levels of the shifted preconditioner (everything
    except the coarse dense inverse); pure in k.

    The k-independent ELL/diagonal tables of K, M and B are scattered
    once (they carry no batch dimension under a frequency vmap); the
    per-frequency values are then one fused elementwise combine of those
    tables — the batched scatter of per-frequency values this replaces
    was ~10% of sweep wall-clock at bench scale."""
    b1, b2 = shift
    levels = []
    for bl in builder.levels[:-1]:
        cd = complex_dtype_for(bl.k_vals.dtype)
        cm = jnp.asarray(b1 + 1j * b2, cd) * jnp.asarray(k**2).astype(cd)
        cb = jnp.asarray(robin_coeff, cd) + jnp.zeros((), cd)
        n_nodes = bl.ell_indices.shape[0]
        width = bl.ell_indices.shape[1]

        def ell_table(vals):
            return scatter_ell(vals, bl.csr2ell, n_nodes, width)

        def diag_table(vals):
            return scatter_diag(vals, bl.row_of_slot, bl.col_of_slot, n_nodes)

        ell_vals = (
            ell_table(bl.k_vals).astype(cd)
            - cm * ell_table(bl.m_vals).astype(cd)
            + cb * ell_table(bl.b_sum).astype(cd)
        )
        diag = (
            diag_table(bl.k_vals).astype(cd)
            - cm * diag_table(bl.m_vals).astype(cd)
            + cb * diag_table(bl.b_sum).astype(cd)
        )
        inv_diag = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 1.0)
        levels.append(MgLevel(bl.ell_indices, ell_vals, inv_diag, bl.p_idx,
                              bl.p_w, bl.r_idx, bl.r_w))
    return tuple(levels)


def coarse_embedded(
    builder: MgBuilder,
    k,
    robin_coeff=0.0,
    shift: Tuple[float, float] = (1.0, 0.5),
) -> jnp.ndarray:
    """(2Nc, 2Nc) real-embedded dense coarsest shifted operator; pure in k."""
    bl = builder.levels[-1]
    vals = _level_values(bl, k, robin_coeff, shift)
    n_nodes = bl.ell_indices.shape[0]
    dense = jnp.zeros((n_nodes, n_nodes), vals.dtype).at[
        bl.row_of_slot, bl.col_of_slot
    ].add(vals)
    ar, ai = jnp.real(dense), jnp.imag(dense)
    return jnp.block([[ar, -ai], [ai, ar]])


def build_coarse_inv(
    builder: MgBuilder,
    k,
    robin_coeff=0.0,
    shift: Tuple[float, float] = (1.0, 0.5),
) -> jnp.ndarray:
    """Explicit real-embedded inverse of the coarsest shifted operator;
    pure in k. This is by far the most expensive piece of the
    per-frequency preconditioner build (a dense n_c^3 inverse), which is
    why batched sweeps share it across nearby frequencies (see
    models.helmholtz_room sweep_pressure mg_coarse_anchors)."""
    return jnp.linalg.inv(coarse_embedded(builder, k, robin_coeff, shift))


def build_coarse_inv_chain(
    builder: MgBuilder,
    anchor_ks,
    robin_coeffs,
    shift: Tuple[float, float] = (1.0, 0.5),
    newton_steps: int = 3,
) -> jnp.ndarray:
    """Explicit inverses for a *sorted* chain of anchor wavenumbers:
    only the first is inverted directly; each subsequent inverse is
    obtained by Newton-Schulz refinement X <- X (2I - A X) seeded from
    its neighbor's inverse. For closely spaced anchors (bench config:
    dk ~ 0.1) the seed is far inside the quadratic convergence basin and
    ``newton_steps`` squarings reach or beat the f32 accuracy of a
    direct ``linalg.inv``; on TPU the chain is 2x faster than batched LU
    inversion — a few small MXU matmuls per anchor replace a
    latency-bound panel factorization.

    Newton-Schulz *diverges* when the neighbor seed is outside the basin
    (spectral radius of I - A X above 1 — wide anchor spacing, unsorted
    ks), so every refined inverse is residual-checked and falls back to
    a direct inverse when ||I - A X||_max is not small. The chain runs
    in a ``lax.scan`` (not under vmap), so the fallback is a real
    ``lax.cond`` branch that only pays for the direct inverse when
    refinement actually failed.

    ``anchor_ks``: (n_anchor,) ascending; ``robin_coeffs``: (n_anchor,)
    complex (e.g. -i k alpha). Returns (n_anchor, 2Nc, 2Nc)."""
    a_batch = jax.vmap(
        lambda ak, rc: coarse_embedded(builder, ak, robin_coeff=rc, shift=shift)
    )(anchor_ks, robin_coeffs)
    x0 = jnp.linalg.inv(a_batch[0])
    eye = jnp.eye(a_batch.shape[1], dtype=a_batch.dtype)

    def step(x, a_i):
        for _ in range(newton_steps):
            x = x @ (2.0 * eye - a_i @ x)
        # Row-sum (infinity) norm upper-bounds the spectral radius of
        # I - A X, so < 0.1 rigorously certifies Newton-Schulz
        # contraction (the max-entry norm it replaces did not).
        resid = jnp.max(jnp.sum(jnp.abs(eye - a_i @ x), axis=1))
        good = jnp.isfinite(resid) & (resid < 0.1)
        x = jax.lax.cond(good, lambda: x, lambda: jnp.linalg.inv(a_i))
        return x, x

    _, inverses = jax.lax.scan(step, x0, a_batch)
    return inverses


def build_mg_params(
    builder: MgBuilder,
    k,
    robin_coeff=0.0,
    shift: Tuple[float, float] = (1.0, 0.5),
) -> MgParams:
    """Pure function of k: MgParams for P = K - (b1+i b2) k^2 M
    + robin_coeff * B. jit/vmap over k to get per-frequency
    preconditioners in a batched sweep."""
    return MgParams(
        build_mg_levels(builder, k, robin_coeff, shift),
        build_coarse_inv(builder, k, robin_coeff, shift),
    )


def _level_matvec(level: MgLevel, x):
    gathered = jnp.take(x, level.ell_indices, axis=0)
    return jnp.sum(level.ell_values * gathered, axis=1)


def _prolong(level: MgLevel, xc):
    w = level.p_w.astype(xc.dtype)
    return jnp.sum(w * jnp.take(xc, level.p_idx, axis=0), axis=1)


def _restrict(level: MgLevel, rf, n_coarse: int):
    """R = P^T as a coarse-side gather (transpose_transfer); the
    scatter-add form this replaces serializes on TPU (22 ms vs 0.9 ms
    per pass at bench scale, examples/fem_roofline_nm.py)."""
    del n_coarse  # shape comes from the transposed stencil
    w = level.r_w.astype(rf.dtype)
    return jnp.sum(w * jnp.take(rf, level.r_idx, axis=0), axis=1)


def _coarse_solve(mgp: MgParams, r):
    n = mgp.coarse_inv.shape[0] // 2
    b2 = jnp.concatenate([jnp.real(r), jnp.imag(r)])
    # explicit inverse: one MXU matmul instead of sequential triangular
    # substitution (the batched lu_solve dominated V-cycle time on TPU)
    x2 = mgp.coarse_inv @ b2
    return jax.lax.complex(x2[:n], x2[n:]).astype(r.dtype)


def mg_cycle(
    mgp: MgParams,
    r,
    omega: float = 2.0 / 3.0,
    nu: int = 2,
    level: int = 0,
    cycle: str = "v",
    nu_post: Optional[int] = None,
):
    """One multigrid cycle: x ~ P^{-1} r (cycle.rs:94/104/114 V/F/W
    cycles, Jacobi smoothing). The recursion unrolls at trace time over
    static levels — a W-cycle simply traces 2^depth coarse visits.

    cycle: 'v' (one coarse visit), 'w' (two recursive visits), or 'f'
    (one F visit followed by one V visit — the standard F-cycle).

    nu_post: post-smoothing steps (defaults to nu). Each post step costs
    a fine matvec; as a GMRES preconditioner nu=1, nu_post=0 is worth
    trying — the Krylov iteration often absorbs the weaker cycle.

    nu=0 skips pre-smoothing entirely (the V(0,nu_post) cycle): the
    coarse grid sees the raw residual and no fine matvec is spent before
    the coarse visit — at bench shape this removes one of the two
    V-cycle fine matvecs (chip: 4.0 ms each, examples/vcycle_breakdown).
    """
    if cycle not in ("v", "w", "f"):
        raise ValueError(f"unknown multigrid cycle type {cycle!r}; expected 'v', 'w' or 'f'")
    if level == len(mgp.levels):
        return _coarse_solve(mgp, r)
    if nu_post is None:
        nu_post = nu
    lvl = mgp.levels[level]
    om = jnp.asarray(omega, r.dtype)
    if nu == 0:  # V(0, nu_post): no pre-smoothing, coarse sees r itself
        x = jnp.zeros_like(r)
        res = r
    else:
        x = om * lvl.inv_diag * r  # first smoothing step from x = 0
        for _ in range(nu - 1):
            x = x + om * lvl.inv_diag * (r - _level_matvec(lvl, x))
        res = r - _level_matvec(lvl, x)
    n_coarse = (
        mgp.levels[level + 1].ell_indices.shape[0]
        if level + 1 < len(mgp.levels)
        else mgp.coarse_inv.shape[0] // 2
    )
    rc = _restrict(lvl, res, n_coarse)
    xc = mg_cycle(mgp, rc, omega, nu, level + 1, cycle, nu_post)
    if cycle in ("w", "f") and level + 1 < len(mgp.levels):
        # second coarse visit on the updated residual (W: same cycle
        # type; F: downgrade to a V-cycle). Skipped when the next level
        # is the exact coarse solve.
        rc2 = rc - _level_matvec(mgp.levels[level + 1], xc)
        second = "v" if cycle == "f" else "w"
        xc = xc + mg_cycle(mgp, rc2, omega, nu, level + 1, second, nu_post)
    x = x + _prolong(lvl, xc)
    for _ in range(nu_post):
        x = x + om * lvl.inv_diag * (r - _level_matvec(lvl, x))
    return x


def vcycle(mgp: MgParams, r, omega: float = 2.0 / 3.0, nu: int = 2, level: int = 0,
           nu_post: Optional[int] = None):
    """One multigrid V-cycle (cycle.rs:23); see mg_cycle for W/F."""
    return mg_cycle(mgp, r, omega, nu, level, "v", nu_post)


def solve_multigrid(
    mgp: MgParams, b, tol: float = 1e-8, max_cycles: int = 50, cycle: str = "v"
):
    """Stand-alone MG solve by repeated cycles (SolverType::Multigrid,
    cycle.rs CycleType V/W/F). Valid when the (shifted) operator is
    MG-amenable, e.g. k below the first resonance or a damped shift."""

    def cond(state):
        x, r, i = state
        return (jnp.linalg.norm(r) > tol * jnp.linalg.norm(b)) & (i < max_cycles)

    def body(state):
        x, r, i = state
        x = x + mg_cycle(mgp, r, cycle=cycle)
        r = b - _level_matvec(mgp.levels[0], x)
        return (x, r, i + 1)

    x0 = jnp.zeros_like(b)
    x, r, i = jax.lax.while_loop(cond, body, (x0, b, jnp.int32(0)))
    return x, i
