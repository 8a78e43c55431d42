"""Batched FEM assembly: one vmapped element kernel + one scatter-add.

Counterpart of math-fem/src/assembly/ (stiffness.rs:270-298,
mass.rs:223-292, helmholtz.rs, assembler.rs:19-257). The reference
parallelizes element loops with rayon and recombines per-frequency CSR
values with par_iter; here the element kernel is vmapped (every element's
Jacobian/quadrature algebra becomes one big batched tensor contraction on
the MXU/VPU) and the global COO->CSR reduction is a single segment-sum
scatter. The per-frequency combine K - k^2 M + sum(coeff_tag B_tag) is
one fused elementwise op over the shared sparsity, vmappable over k.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from mathaudio_tpu.fem.basis import element_tables, shape_functions
from mathaudio_tpu.fem.mesh import HEX, QUAD, TET, TRIANGLE, Mesh
from mathaudio_tpu.fem.quadrature import segment_rule, triangle_rule
from mathaudio_tpu.solvers.operators import EllOperator
from mathaudio_tpu.solvers.sparse import CsrMatrix
from mathaudio_tpu.xtypes import complex_dtype_for, default_float


def scatter_ell(vals, csr2ell, n_rows: int, width: int):
    """CSR-ordered nnz values -> zero-padded ELL value table (n_rows, width).

    Shared by the sweep fine operator, the multigrid level build, and
    operator_of — one definition so the padding/scatter semantics cannot
    drift apart."""
    return (
        jnp.zeros(n_rows * width, vals.dtype).at[csr2ell].set(vals).reshape(n_rows, width)
    )


def scatter_diag(vals, row_of_slot, col_of_slot, n_rows: int):
    """CSR-ordered nnz values -> the matrix diagonal (n_rows,)."""
    diag_slots = row_of_slot == col_of_slot
    return jnp.zeros(n_rows, vals.dtype).at[row_of_slot].add(
        jnp.where(diag_slots, vals, 0.0)
    )


def coo_to_csr_map(rows, cols, shape):
    """CSR structure + COO-entry -> CSR-slot map (duplicates share slots).

    The map is what lets device-side values be re-assembled into the
    fixed sparsity with one scatter-add per assembly.
    """
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    order = np.lexsort((cols, rows))
    r_s, c_s = rows[order], cols[order]
    new_group = np.ones(len(r_s), bool)
    new_group[1:] = (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])
    group = np.cumsum(new_group) - 1
    slot_of_sorted = group
    slot_map = np.empty(len(rows), np.int64)
    slot_map[order] = slot_of_sorted
    nnz = group[-1] + 1 if len(group) else 0
    out_rows = r_s[new_group]
    out_cols = c_s[new_group]
    indptr = np.zeros(shape[0] + 1, np.int64)
    np.add.at(indptr, out_rows + 1, 1)
    indptr = np.cumsum(indptr)
    csr = CsrMatrix(indptr, out_cols.astype(np.int32), np.zeros(nnz), shape)
    return csr, slot_map, out_rows.astype(np.int32)


def element_kernel(coords, phi, grad, weights):
    """Per-element stiffness/mass from node coords (nv, d).

    Returns (K_e (nv, nv), M_e (nv, nv)). Pure tensor algebra; vmapped
    over all elements by the caller.
    """
    jac = jnp.einsum("vd,qvk->qdk", coords, grad)  # dx/dxi
    det = jnp.abs(jnp.linalg.det(jac))
    inv = jnp.linalg.inv(jac)  # dxi/dx
    gphys = jnp.einsum("qvk,qkd->qvd", grad, inv)
    wdet = weights * det
    k_e = jnp.einsum("q,qvd,qwd->vw", wdet, gphys, gphys)
    m_e = jnp.einsum("q,qv,qw->vw", wdet, phi, phi)
    return k_e, m_e


from functools import partial


@partial(jax.jit, static_argnames=("nnz",))
def assemble_values_jit(coords, phi, grad, weights, slot_map, nnz):
    """Batched element kernels + one scatter-add, as a single XLA program
    (the timed 'assembly' of the benchmark)."""
    k_e, m_e = jax.vmap(lambda c: element_kernel(c, phi, grad, weights))(coords)
    k_vals = jnp.zeros(nnz, coords.dtype).at[slot_map].add(k_e.reshape(-1))
    m_vals = jnp.zeros(nnz, coords.dtype).at[slot_map].add(m_e.reshape(-1))
    return k_vals, m_vals


def assemble_stiffness_mass(mesh: Mesh, dtype=None, quad_order: int = 2):
    """Assemble K and M value vectors over a shared CSR sparsity.

    Returns (csr_structure, k_vals, m_vals, slot metadata dict).
    """
    dtype = dtype or default_float()
    tab = element_tables(mesh.element_type, quad_order)
    nv = tab.nv
    elems = mesh.elements
    rows = np.repeat(elems, nv, axis=1).reshape(-1)  # i index
    cols = np.tile(elems, (1, nv)).reshape(-1)  # j index
    n = mesh.num_nodes
    csr, slot_map, row_of_slot = coo_to_csr_map(rows, cols, (n, n))

    k_vals, m_vals = assemble_values_jit(
        jnp.asarray(mesh.nodes[mesh.elements], dtype),
        jnp.asarray(tab.phi, dtype),
        jnp.asarray(tab.grad, dtype),
        jnp.asarray(tab.weights, dtype),
        jnp.asarray(slot_map),
        csr.nnz,
    )
    meta = {"slot_map": slot_map, "row_of_slot": row_of_slot}
    return csr, k_vals, m_vals, meta


def assemble_lumped_mass(mesh: Mesh, dtype=None, quad_order: int = 2):
    """Row-sum lumped mass diagonal (mass.rs:278 assemble_lumped_mass):
    (N,) vector with sum_j M_ij per node; total equals the mesh measure."""
    _csr, _k_vals, m_vals, meta = assemble_stiffness_mass(mesh, dtype, quad_order)
    n = mesh.num_nodes
    return jnp.zeros(n, m_vals.dtype).at[jnp.asarray(meta["row_of_slot"])].add(m_vals)


_FACE_TYPE = {
    TRIANGLE: "segment",
    QUAD: "segment",
    TET: TRIANGLE,
    HEX: QUAD,
    # higher-order volumes carry matching higher-order boundary faces
    # (node orders fixed by refinement.to_p2/to_p3)
    "triangle6": "segment3",
    "triangle10": "segment4",
    "tet10": "triangle6",
    "tet20": "triangle10",
}

# 1D Lagrange node layouts on [0, 1]; order matches boundary_faces columns
_SEGMENT_NODES = {
    "segment": np.array([0.0, 1.0]),
    "segment3": np.array([0.0, 1.0, 0.5]),
    "segment4": np.array([0.0, 1.0, 1.0 / 3.0, 2.0 / 3.0]),
}


def _lagrange_1d(nodes: np.ndarray, x: np.ndarray):
    """phi (nq, nv) and dphi (nq, nv) of the 1D Lagrange basis on `nodes`."""
    nv = len(nodes)
    phi = np.ones((len(x), nv))
    dphi = np.zeros((len(x), nv))
    for i in range(nv):
        for j in range(nv):
            if j == i:
                continue
            phi[:, i] *= (x - nodes[j]) / (nodes[i] - nodes[j])
        for m in range(nv):
            if m == i:
                continue
            term = np.ones(len(x)) / (nodes[i] - nodes[m])
            for j in range(nv):
                if j in (i, m):
                    continue
                term *= (x - nodes[j]) / (nodes[i] - nodes[j])
            dphi[:, i] += term
    return phi, dphi


def _face_table(volume_type: str, order: int = 2):
    ft = _FACE_TYPE[volume_type]
    if ft in _SEGMENT_NODES:
        nv = len(_SEGMENT_NODES[ft])
        x, w = segment_rule(nv)  # exact for the degree-2(nv-1) mass integrand
        phi, dphi = _lagrange_1d(_SEGMENT_NODES[ft], x)
        return x[:, None], w, phi, dphi[:, :, None]
    if ft == TRIANGLE:
        pts, w = triangle_rule(order)
        phi, grad = shape_functions(TRIANGLE, pts)
        return pts, w, phi, grad
    if ft == "triangle6":
        from mathaudio_tpu.fem.quadrature import triangle_rule_order

        pts, w = triangle_rule_order(4)
        phi, grad = shape_functions("triangle6", pts)
        return pts, w, phi, grad
    if ft == "triangle10":
        from mathaudio_tpu.fem.quadrature import triangle_rule_order

        pts, w = triangle_rule_order(6)
        phi, grad = shape_functions("triangle10", pts)
        return pts, w, phi, grad
    if ft == QUAD:
        from mathaudio_tpu.fem.quadrature import quad_rule

        pts, w = quad_rule(2)
        phi, grad = shape_functions(QUAD, pts)
        return pts, w, phi, grad
    raise ValueError(volume_type)


def _face_mass_kernel(coords, phi, grad, weights):
    """Boundary-face mass matrix using the metric sqrt(det(J^T J))."""
    jac = jnp.einsum("vd,qvk->qdk", coords, grad)  # (nq, d, d-1)
    metric = jnp.einsum("qdk,qdl->qkl", jac, jac)
    det = jnp.sqrt(jnp.abs(jnp.linalg.det(metric)))
    wdet = weights * det
    return jnp.einsum("q,qv,qw->vw", wdet, phi, phi)


def assemble_boundary_mass(
    mesh: Mesh, tag: int, csr: CsrMatrix, slot_map_unused=None, dtype=None
):
    """Boundary mass B_tag on the volume sparsity (mass.rs:278
    assemble_boundary_mass): B_ij = int_{Gamma_tag} phi_i phi_j dS.
    Returns a (nnz,) value vector aligned with ``csr``.
    """
    dtype = dtype or default_float()
    sel = mesh.boundary_markers == tag
    faces = mesh.boundary_faces[sel]
    nnz = csr.nnz
    if len(faces) == 0:
        return jnp.zeros(nnz, dtype)
    pts, w, phi, grad = _face_table(mesh.element_type)
    fv = faces.shape[1]
    rows = np.repeat(faces, fv, axis=1).reshape(-1)
    cols = np.tile(faces, (1, fv)).reshape(-1)
    # map each (row, col) to its CSR slot via searchsorted in the row's range
    slots = _find_slots(csr, rows, cols)

    @partial(jax.jit, static_argnames=("nnz_",))
    def _bmass(coords, phi_d, grad_d, w_d, slots_d, nnz_):
        b_e = jax.vmap(lambda c: _face_mass_kernel(c, phi_d, grad_d, w_d))(coords)
        return jnp.zeros(nnz_, coords.dtype).at[slots_d].add(b_e.reshape(-1))

    return _bmass(
        jnp.asarray(mesh.nodes[faces], dtype),
        jnp.asarray(phi, dtype),
        jnp.asarray(grad, dtype),
        jnp.asarray(w, dtype),
        jnp.asarray(slots),
        nnz,
    )


def _find_slots(csr: CsrMatrix, rows, cols):
    """CSR slot of each (row, col); entries must exist in the sparsity.
    Vectorized: one global searchsorted over (row, col) composite keys
    (column indices are sorted within each row by construction)."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    n_cols = csr.shape[1]
    nnz_rows = np.repeat(np.arange(csr.shape[0], dtype=np.int64), np.diff(csr.indptr))
    keys = nnz_rows * n_cols + csr.indices.astype(np.int64)
    want = rows * n_cols + cols
    slots = np.searchsorted(keys, want)
    assert np.all(keys[slots] == want), "entries not in sparsity"
    return slots


def assemble_rhs(mesh: Mesh, source_fn: Callable, dtype=None, quad_order: int = 2):
    """RHS vector b_i = int f phi_i dx via the same batched quadrature.

    ``source_fn`` maps coordinates (..., d) -> scalar (may return complex).
    """
    rdtype = dtype or default_float()
    tab = element_tables(mesh.element_type, quad_order)
    n = mesh.num_nodes

    @partial(jax.jit, static_argnames=("n_",))
    def _rhs(coords, phi, grad, w, elem_flat, n_):
        x_q = jnp.einsum("qv,evd->eqd", phi, coords)  # (E, nq, d)
        f_q = source_fn(x_q)  # (E, nq)
        jac = jnp.einsum("evd,qvk->eqdk", coords, grad)
        det = jnp.abs(jnp.linalg.det(jac))
        contrib = jnp.einsum(
            "q,eq,eq,qv->ev", w, det.astype(f_q.dtype), f_q, phi.astype(f_q.dtype)
        )
        return jnp.zeros(n_, contrib.dtype).at[elem_flat].add(contrib.reshape(-1))

    return _rhs(
        jnp.asarray(mesh.nodes[mesh.elements], rdtype),
        jnp.asarray(tab.phi, rdtype),
        jnp.asarray(tab.grad, rdtype),
        jnp.asarray(tab.weights, rdtype),
        jnp.asarray(mesh.elements.reshape(-1)),
        n,
    )


class HelmholtzAssembler:
    """Frequency-sweep workhorse (assembler.rs:19-257 analog).

    Assembles K, M and per-tag boundary masses ONCE over a shared
    sparsity; ``assemble(k, robin_coeffs)`` returns the system values
    K - k^2 M + sum(coeff_tag * B_tag) as one fused elementwise combine.
    jit/vmap ``assemble`` + the solve over a batch of wavenumbers.
    """

    def __init__(self, mesh: Mesh, robin_tags: Sequence[int] = (), dtype=None):
        dtype = dtype or default_float()
        self.mesh = mesh
        self.dtype = dtype
        self.cdtype = complex_dtype_for(dtype)
        csr, k_vals, m_vals, meta = assemble_stiffness_mass(mesh, dtype)
        self.csr = csr
        self.k_vals = k_vals
        self.m_vals = m_vals
        self.row_of_slot = jnp.asarray(meta["row_of_slot"])
        self.col_of_slot = jnp.asarray(csr.indices.astype(np.int32))
        self.robin_tags = tuple(robin_tags)
        self.b_vals = {
            tag: assemble_boundary_mass(mesh, tag, csr, dtype=dtype) for tag in self.robin_tags
        }
        ell_idx, csr2ell = csr.ell_structure(pad_to_multiple=8)
        self.ell_indices = jnp.asarray(ell_idx)
        self.ell_width = ell_idx.shape[1]
        self.csr2ell = jnp.asarray(csr2ell)
        self.num_nodes = mesh.num_nodes

    def system_values(self, k, robin_coeffs: Optional[Dict[int, complex]] = None):
        """(nnz,) complex values of K - k^2 M + sum coeff_tag B_tag."""
        k = jnp.asarray(k)
        vals = (self.k_vals - (k**2) * self.m_vals).astype(self.cdtype)
        if robin_coeffs:
            for tag, coeff in robin_coeffs.items():
                vals = vals + jnp.asarray(coeff, self.cdtype) * self.b_vals[tag].astype(
                    self.cdtype
                )
        return vals

    def apply_dirichlet_values(self, vals, constrained):
        """Zero constrained rows/cols, unit diagonal. ``constrained`` is a
        (N,) bool device array (dirichlet.rs:73 row/col elimination, with
        fixed sparsity instead of structural removal)."""
        row_c = constrained[self.row_of_slot]
        col_c = constrained[self.col_of_slot]
        keep = (~row_c) & (~col_c)
        diag_c = row_c & (self.row_of_slot == self.col_of_slot)
        return jnp.where(keep, vals, 0.0) + diag_c.astype(vals.dtype)

    def dirichlet_rhs(self, vals, rhs, constrained, g):
        """b <- b - A g on free rows; b <- g on constrained rows.
        ``g`` is (N,) with boundary values (zero on free nodes)."""
        op = self.operator_from_values(vals)
        ag = op.matvec(g.astype(vals.dtype))
        return jnp.where(constrained, g.astype(rhs.dtype), rhs - ag.astype(rhs.dtype))

    def operator_from_values(self, vals) -> EllOperator:
        ell_vals = (
            jnp.zeros(self.num_nodes * self.ell_width, vals.dtype)
            .at[self.csr2ell]
            .set(vals)
            .reshape(self.num_nodes, self.ell_width)
        )
        return EllOperator(self.ell_indices, ell_vals, self.num_nodes)

    def assemble(self, k, robin_coeffs=None, dirichlet_constrained=None):
        """One-call system operator for wavenumber k."""
        vals = self.system_values(k, robin_coeffs)
        if dirichlet_constrained is not None:
            vals = self.apply_dirichlet_values(vals, dirichlet_constrained)
        return self.operator_from_values(vals), vals

    def diagonal_of(self, vals):
        """System diagonal for Jacobi preconditioning, from values."""
        diag_slots = self.row_of_slot == self.col_of_slot
        return (
            jnp.zeros(self.num_nodes, vals.dtype)
            .at[self.row_of_slot]
            .add(jnp.where(diag_slots, vals, 0.0))
        )
