"""Perfectly matched layers via complex coordinate stretching
(math-fem/src/boundary/pml.rs:12-207: per-direction regions,
polynomial/quadratic absorption profiles).

Stretched Helmholtz:  div(Lambda grad u) + k^2 (s_x s_y s_z) u = 0,
Lambda = diag(s_y s_z / s_x, s_x s_z / s_y, s_x s_y / s_z),
s_i(x) = 1 + i sigma_i(x)/k,  sigma_i a polynomial ramp inside the layer.

Assembled as complex-valued K_pml and M_pml over the standard shared
sparsity with the same batched element kernel (coefficients evaluated at
quadrature points), so a PML system is still one fused value combine.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from mathaudio_tpu.fem.assembly import coo_to_csr_map
from mathaudio_tpu.fem.basis import element_tables
from mathaudio_tpu.fem.mesh import Mesh
from mathaudio_tpu.xtypes import complex_dtype_for, default_float


@dataclasses.dataclass
class PmlRegion:
    """One absorbing layer along an axis (pml.rs:136 regions).

    axis: 0/1/2; side: +1 (layer at the max face) or -1 (min face);
    start: coordinate where the layer begins; thickness: layer depth;
    sigma_max: peak absorption; order: profile polynomial order
    (2 = quadratic, pml.rs:39).
    """

    axis: int
    side: int
    start: float
    thickness: float
    sigma_max: float = 20.0
    order: int = 2

    def sigma(self, coords):
        """sigma_i at coordinates (..., dim), zero outside the layer."""
        x = coords[..., self.axis]
        depth = jnp.where(self.side > 0, x - self.start, self.start - x)
        t = jnp.clip(depth / self.thickness, 0.0, 1.0)
        return self.sigma_max * t**self.order


def pml_box_regions(bounds, thickness, sigma_max: float = 20.0, order: int = 2,
                    axes: Optional[Sequence[int]] = None) -> List[PmlRegion]:
    """Layers on all (or selected) faces of a box domain [pml.rs:136]."""
    lo = np.asarray(bounds[0::2], float)
    hi = np.asarray(bounds[1::2], float)
    dim = len(lo)
    regions = []
    for ax in axes if axes is not None else range(dim):
        regions.append(PmlRegion(ax, -1, lo[ax] + thickness, thickness, sigma_max, order))
        regions.append(PmlRegion(ax, +1, hi[ax] - thickness, thickness, sigma_max, order))
    return regions


def assemble_pml_values(
    mesh: Mesh, regions: Sequence[PmlRegion], k: float, csr=None, quad_order: int = 2,
    dtype=None,
):
    """(csr, k_vals, m_vals) complex: stretched stiffness and mass values
    on the shared sparsity. ``k`` enters through s = 1 + i sigma/k, so
    this is re-assembled per frequency (jitted; one batched kernel)."""
    dtype = dtype or default_float()
    cdtype = complex_dtype_for(dtype)
    tab = element_tables(mesh.element_type, quad_order)
    nv, dim = tab.nv, tab.dim

    elems = mesh.elements
    rows = np.repeat(elems, nv, axis=1).reshape(-1)
    cols = np.tile(elems, (1, nv)).reshape(-1)
    if csr is None:
        csr, slot_map, _ = coo_to_csr_map(rows, cols, (mesh.num_nodes, mesh.num_nodes))
    else:
        from mathaudio_tpu.fem.assembly import _find_slots

        slot_map = _find_slots(csr, rows, cols)

    coords = jnp.asarray(mesh.nodes[mesh.elements], dtype)
    phi = jnp.asarray(tab.phi, dtype)
    grad = jnp.asarray(tab.grad, dtype)
    weights = jnp.asarray(tab.weights, dtype)
    slot_map_d = jnp.asarray(slot_map)

    def stretch(xq):
        """s (nq, dim) complex at physical quadrature points."""
        s = jnp.ones(xq.shape[:-1] + (dim,), cdtype)
        for reg in regions:
            sig = reg.sigma(xq)
            s = s.at[..., reg.axis].mul(1.0 + 1j * sig / k)
        return s

    @partial(jax.jit, static_argnames=("nnz",))
    def _assemble(coords, phi, grad, weights, slot_map_d, nnz):
        def kernel(c):
            jac = jnp.einsum("vd,qvk->qdk", c, grad)
            det = jnp.abs(jnp.linalg.det(jac))
            inv = jnp.linalg.inv(jac)
            gphys = jnp.einsum("qvk,qkd->qvd", grad, inv).astype(cdtype)
            xq = jnp.einsum("qv,vd->qd", phi, c)
            s = stretch(xq)  # (nq, dim)
            s_prod = jnp.prod(s, axis=-1)  # (nq,)
            lam = s_prod[:, None] / (s * s)  # diag Lambda (nq, dim)
            wdet = (weights * det).astype(cdtype)
            k_e = jnp.einsum("q,qd,qvd,qwd->vw", wdet, lam, gphys, gphys)
            m_e = jnp.einsum("q,q,qv,qw->vw", wdet, s_prod, phi.astype(cdtype), phi.astype(cdtype))
            return k_e, m_e

        k_e, m_e = jax.vmap(kernel)(coords)
        k_vals = jnp.zeros(nnz, cdtype).at[slot_map_d].add(k_e.reshape(-1))
        m_vals = jnp.zeros(nnz, cdtype).at[slot_map_d].add(m_e.reshape(-1))
        return k_vals, m_vals

    k_vals, m_vals = _assemble(coords, phi, grad, weights, slot_map_d, csr.nnz)
    return csr, k_vals, m_vals
