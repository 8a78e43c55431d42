"""Kirchhoff–Helmholtz field evaluation
(math-bem/src/core/postprocess/pressure.rs): exterior field from surface
pressure via the representation formula, as a second pairwise kernel.

For a rigid scatterer (dp/dn = 0 on the surface):
    p(x) = p_inc(x) + int_Gamma p(y) dG/dn_y(x, y) dS(y),  x exterior.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from mathaudio_tpu.bem.incident import IncidentField
from mathaudio_tpu.bem.mesh import SurfaceMesh
from mathaudio_tpu.xtypes import complex_dtype_for, default_float, pressure_to_spl


@dataclasses.dataclass
class FieldResult:
    """pressure.rs FieldPoint analog, vectorized."""

    points: jnp.ndarray
    p_inc: jnp.ndarray
    p_scat: jnp.ndarray

    @property
    def p_total(self):
        return self.p_inc + self.p_scat

    @property
    def spl_db(self):
        return pressure_to_spl(jnp.abs(self.p_total))


def _kh_rows(points, qp, qw, normals, p_surf, q_surf, k):
    """Kirchhoff–Helmholtz contribution for a block of field points:
    p(x) = int [p dG/dn_y - G q] dS (q = dp/dn; rigid q = 0 drops the
    single layer). Quadrature sums via the ops dispatch (Pallas on TPU
    f32, else the fused XLA form)."""
    from mathaudio_tpu.ops.bem_assembly import pairwise_kh

    s_mat, d_mat = pairwise_kh(points, qp, normals, qw, k,
                               want_single=q_surf is not None)
    out = d_mat @ p_surf  # (M,)
    if q_surf is not None:
        out = out - s_mat @ q_surf
    return out


@partial(jax.jit, static_argnames=("row_block",))
def _scattered_at(points, qp, qw, normals, p_surf, k, row_block=0):
    return _chunked_points(points, qp, qw, normals, p_surf, None, k, row_block)


@partial(jax.jit, static_argnames=("row_block",))
def _radiated_at(points, qp, qw, normals, p_surf, q_surf, k, row_block=0):
    return _chunked_points(points, qp, qw, normals, p_surf, q_surf, k, row_block)


def _chunked_points(points, qp, qw, normals, p_surf, q_surf, k, row_block):
    """Evaluate in (row_block,) point chunks via lax.map so only
    (row_block, N, nq) kernel intermediates materialize (the same HBM
    cap as bem/assembly._assemble_jit; VERDICT r1 item 4)."""
    m = points.shape[0]
    if row_block <= 0 or row_block >= m:
        return _kh_rows(points, qp, qw, normals, p_surf, q_surf, k)
    pad = (-m) % row_block
    pts = jnp.pad(points, ((0, pad), (0, 0)), constant_values=1e3)
    nc = (m + pad) // row_block
    out = jax.lax.map(
        lambda xc: _kh_rows(xc, qp, qw, normals, p_surf, q_surf, k),
        pts.reshape(nc, row_block, 3),
    )
    return out.reshape(m + pad)[:m]


def evaluate_field(
    mesh: SurfaceMesh,
    p_surf,
    points,
    k: float,
    incident: Optional[IncidentField] = None,
    quad_order: int = 3,
    dtype=None,
    q_surf=None,
    row_block=None,
) -> FieldResult:
    """Total/scattered pressure at exterior points (compute_total_field).
    ``q_surf`` (dp/dn at element centers) adds the single-layer term for
    radiating / non-rigid surfaces; ``incident=None`` means pure
    radiation (p_inc = 0). ``row_block`` chunks field points so only
    (row_block, N, nq) kernel buffers materialize (None = auto)."""
    dtype = dtype or default_float()
    points = jnp.asarray(points, dtype)
    qp, qw = mesh.quad_points(quad_order)
    if row_block is None:
        from mathaudio_tpu.bem.assembly import _auto_row_block
        from mathaudio_tpu.ops.bem_assembly import _use_pallas

        # buffer is (row_block, N, nq): the budget divides by the COLUMN
        # count (num_elements); sizing by the point count would shrink
        # chunks ~M/N-fold for dense point grids over small meshes.
        # Pallas tiles the quadrature internally — its per-row footprint
        # is ~3 complex-plane equivalents regardless of nq, so chunks
        # grow nq/3-fold.
        nq_eff = 3 if _use_pallas("auto", dtype) else qp.shape[1]
        row_block = _auto_row_block(mesh.num_elements, nq_eff)
    args = (
        points,
        jnp.asarray(qp, dtype),
        jnp.asarray(qw, dtype),
        jnp.asarray(mesh.normals, dtype),
        jnp.asarray(p_surf),
    )
    if q_surf is None:
        p_scat = _scattered_at(*args, k, row_block=int(row_block))
    else:
        p_scat = _radiated_at(*args, jnp.asarray(q_surf, args[-1].dtype), k,
                              row_block=int(row_block))
    if incident is not None:
        p_inc = incident.pressure(points, k)
    else:
        p_inc = jnp.zeros_like(p_scat)
    return FieldResult(points=points, p_inc=p_inc, p_scat=p_scat)


def evaluate_field_fmm(
    mesh: SurfaceMesh,
    p_surf,
    points,
    k: float,
    incident: Optional[IncidentField] = None,
    quad_order: int = 3,
    max_per_leaf: int = 32,
    separation_ratio: float = 2.0,
    dtype=None,
    q_surf=None,
) -> FieldResult:
    """FMM-accelerated Kirchhoff–Helmholtz evaluation (pressure.rs field
    sweep made O((N+M) log): octrees over surface elements and field
    points; far cluster pairs go through the diagonal-form expansion
    (aggregation shared with bem/fmm.py), near pairs use the exact
    kernel. Unstable low-frequency pairs demote to exact evaluation
    (same h_l blowup cap as the MLFMM builder).

    ``q_surf`` (dp/dn at element centers) adds the single-layer -G q term
    for radiating / mixed-BC surfaces: the far field aggregates a second
    density through the factor-1 (single-layer) aggregation tensor and
    rides the same diagonal translations; near pairs reuse the exact G
    already computed for dG/dn. ``incident=None`` = pure radiation."""
    from mathaudio_tpu.bem.fmm import (
        _MLFMM_STABILITY_TAU,
        _agg_disagg_tensors,
        translation_operator_pairwise,
        unit_sphere_quadrature,
    )
    from mathaudio_tpu.bem.octree import Octree
    from mathaudio_tpu.wave.special.spherical import spherical_jn_yn_all

    dtype = dtype or default_float()
    cd = complex_dtype_for(jnp.dtype(dtype))
    points = np.asarray(points, float)
    m_pts = len(points)

    # source clusters (surface elements)
    src_tree = Octree.build(mesh.centers, max_per_leaf=max_per_leaf)
    src = src_tree.leaves
    ms = max(len(nd.indices) for nd in src)
    s_cl = np.zeros((len(src), ms), np.int32)
    s_mk = np.zeros((len(src), ms))
    s_cc = np.zeros((len(src), 3))
    s_rr = np.zeros(len(src))
    for i, nd in enumerate(src):
        s_cl[i, : len(nd.indices)] = nd.indices
        s_mk[i, : len(nd.indices)] = 1.0
        s_cc[i] = nd.indices_center(mesh.centers)
        s_rr[i] = nd.radius(mesh.centers)

    # target clusters (field points)
    tgt_tree = Octree.build(points, max_per_leaf=max_per_leaf)
    tgt = tgt_tree.leaves
    mt = max(len(nd.indices) for nd in tgt)
    t_cl = np.zeros((len(tgt), mt), np.int32)
    t_mk = np.zeros((len(tgt), mt))
    t_cc = np.zeros((len(tgt), 3))
    t_rr = np.zeros(len(tgt))
    for i, nd in enumerate(tgt):
        t_cl[i, : len(nd.indices)] = nd.indices
        t_mk[i, : len(nd.indices)] = 1.0
        t_cc[i] = nd.indices_center(points)
        t_rr[i] = nd.radius(points)

    kr = k * max(s_rr.max(), t_rr.max())
    order = int(np.ceil(kr + 4 * np.log(kr + np.pi) + 4))
    dirs, w = unit_sphere_quadrature(order)

    dist = np.linalg.norm(t_cc[:, None] - s_cc[None, :], axis=-1)
    far = dist > separation_ratio * (t_rr[:, None] + s_rr[None, :])
    fb, fa = np.where(far)
    # stability cap (low-frequency h_l blowup -> exact evaluation)
    if len(fb):
        krp = k * (t_rr[fb] + s_rr[fa])
        l_acc = np.ceil(krp + 4 * np.log(krp + np.pi) + 4).astype(int)
        kd = k * dist[fb, fa]
        j_all, y_all = spherical_jn_yn_all(int(l_acc.max()), jnp.asarray(kd))
        h_abs = np.abs(np.asarray(j_all + 1j * y_all))
        l = np.arange(h_abs.shape[0])
        amp = np.where(l[:, None] <= l_acc[None, :], (2 * l + 1)[:, None] * h_abs, 0.0)
        stable = amp.max(axis=0) <= _MLFMM_STABILITY_TAU
        far[fb[~stable], fa[~stable]] = False
        fb, fa = fb[stable], fa[stable]
        l_pair = np.minimum(l_acc[stable], order)

    t_tensor, _ = _agg_disagg_tensors(mesh, s_cl, s_mk, s_cc, k, dirs)
    if q_surf is not None:
        t_single, _ = _agg_disagg_tensors(
            mesh, s_cl, s_mk, s_cc, k, dirs, single_layer=True
        )
    else:
        t_single = np.zeros((1, 1, 1), complex)
    x_rel = points[t_cl] - t_cc[:, None, :]
    s_field = np.exp(1j * k * np.einsum("qd,cmd->cqm", dirs, x_rel)) * t_mk[:, None, :]
    if len(fb):
        t_op = translation_operator_pairwise(k, t_cc[fb] - s_cc[fa], dirs, order, l_pair)
    else:
        t_op = np.zeros((0, len(dirs)), complex)

    nb, na = np.where(~far)
    p_surf = jnp.asarray(p_surf)
    qp, qw = mesh.quad_points(quad_order)

    @jax.jit
    def field(p, q):
        # far: aggregate, translate (pair-packed), disaggregate. The
        # translation is diagonal/linear, so the single-layer density -q
        # merges into mu before translating — one D/S pass serves both
        # Kirchhoff-Helmholtz terms.
        xc = p[jnp.asarray(s_cl)] * jnp.asarray(s_mk, p.dtype)
        mu = jnp.einsum("cqm,cm->cq", jnp.asarray(t_tensor, cd), xc)
        if q is not None:
            qc = q[jnp.asarray(s_cl)] * jnp.asarray(s_mk, q.dtype)
            mu = mu - jnp.einsum("cqm,cm->cq", jnp.asarray(t_single, cd), qc)
        lam = jnp.zeros((len(tgt), len(dirs)), cd)
        if t_op.shape[0]:
            lam = lam.at[jnp.asarray(fb)].add(
                jnp.asarray(t_op, cd) * mu[jnp.asarray(fa)]
            )
        pref = jnp.asarray(1j * k / (16.0 * np.pi**2), cd)  # +D: no CBIE minus
        p_far = pref * jnp.einsum(
            "q,cqm,cq->cm", jnp.asarray(w, dtype), jnp.asarray(s_field, cd), lam
        )
        # near: exact kernel blocks per (target cluster, source cluster)
        x = jnp.asarray(points[t_cl], dtype)[jnp.asarray(nb)][:, :, None, None, :]
        y = jnp.asarray(qp, dtype)[jnp.asarray(s_cl)][jnp.asarray(na)][:, None, :, :, :]
        ny = jnp.asarray(mesh.normals, dtype)[jnp.asarray(s_cl)][jnp.asarray(na)][
            :, None, :, None, :
        ]
        rv = y - x
        r = jnp.sqrt(jnp.sum(rv * rv, axis=-1))
        rs = jnp.where(r < 1e-15, 1.0, r)
        g = jnp.exp(1j * (k * rs).astype(cd)) / (4.0 * jnp.pi * rs)
        ik = jnp.asarray(1j * k, cd)
        dg = (ik - 1.0 / rs) * g * jnp.sum(rv * ny, axis=-1) / rs
        wq = jnp.asarray(qw, dtype)[jnp.asarray(s_cl)][jnp.asarray(na)][:, None, :, :]
        mask_ts = (
            jnp.asarray(t_mk, dtype)[jnp.asarray(nb)][:, :, None].astype(cd)
            * jnp.asarray(s_mk, dtype)[jnp.asarray(na)][:, None, :].astype(cd)
        )
        blocks = jnp.sum(dg * wq.astype(cd), axis=-1) * mask_ts  # (P, mt, ms)
        pa = p[jnp.asarray(s_cl)][jnp.asarray(na)] * jnp.asarray(s_mk, p.dtype)[jnp.asarray(na)]
        near_vals = jnp.einsum("pij,pj->pi", blocks, pa)
        if q is not None:
            s_blocks = jnp.sum(g * wq.astype(cd), axis=-1) * mask_ts
            qa = q[jnp.asarray(s_cl)][jnp.asarray(na)] * jnp.asarray(s_mk, q.dtype)[jnp.asarray(na)]
            near_vals = near_vals - jnp.einsum("pij,pj->pi", s_blocks, qa)
        out = jnp.zeros(m_pts, cd)
        out = out.at[jnp.asarray(t_cl).reshape(-1)].add(
            (p_far * jnp.asarray(t_mk, dtype).astype(cd)).reshape(-1)
        )
        out = out.at[jnp.asarray(t_cl)[jnp.asarray(nb)].reshape(-1)].add(
            (near_vals * jnp.asarray(t_mk, dtype)[jnp.asarray(nb)].astype(cd)).reshape(-1)
        )
        return out

    q_in = None if q_surf is None else jnp.asarray(q_surf).astype(cd)
    p_scat = field(p_surf.astype(cd), q_in)
    pts_j = jnp.asarray(points, dtype)
    if incident is not None:
        p_inc = incident.pressure(pts_j, k)
    else:
        p_inc = jnp.zeros_like(p_scat)
    return FieldResult(points=pts_j, p_inc=p_inc, p_scat=p_scat)


def generate_sphere_eval_points(radius: float, n_theta: int, n_phi: int) -> np.ndarray:
    """(n_theta*n_phi, 3) points on a sphere around the origin, cell-center
    polar spacing (pressure.rs:320 generate_sphere_eval_points)."""
    theta = np.pi * (np.arange(n_theta) + 0.5) / n_theta
    phi = 2.0 * np.pi * np.arange(n_phi) / n_phi
    st, ct = np.sin(theta), np.cos(theta)
    x = radius * st[:, None] * np.cos(phi)[None, :]
    y = radius * st[:, None] * np.sin(phi)[None, :]
    z = radius * np.broadcast_to(ct[:, None], (n_theta, n_phi))
    return np.stack([x, y, z], axis=-1).reshape(-1, 3)


def generate_line_eval_points(start, end, n_points: int) -> np.ndarray:
    """(n_points, 3) points from start to end inclusive
    (pressure.rs:350 generate_line_eval_points)."""
    t = np.arange(n_points) / max(n_points - 1, 1)
    start = np.asarray(start, float)
    end = np.asarray(end, float)
    return start[None, :] + t[:, None] * (end - start)[None, :]


def generate_plane_eval_points(center, normal, extent: float, n_points: int) -> np.ndarray:
    """(n_points^2, 3) grid on the plane through ``center`` with the given
    ``normal``, spanning +-extent along two in-plane basis vectors
    (pressure.rs:373 generate_plane_eval_points — field maps)."""
    n = np.asarray(normal, float)
    n = n / np.linalg.norm(n)
    arbitrary = np.array([1.0, 0.0, 0.0]) if abs(n[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    u = np.cross(n, arbitrary)
    u = u / np.linalg.norm(u)
    v = np.cross(n, u)
    s = -extent + 2.0 * extent * np.arange(n_points) / max(n_points - 1, 1)
    center = np.asarray(center, float)
    grid = center[None, None, :] + s[:, None, None] * u[None, None, :] + s[None, :, None] * v[None, None, :]
    return grid.reshape(-1, 3)
