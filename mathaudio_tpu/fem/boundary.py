"""Boundary conditions (math-fem/src/boundary/: dirichlet.rs:73,
neumann.rs:61, robin.rs:54-73; PML in fem/pml.py).

Semantics for  -div(grad u) - k^2 u = f:

- Dirichlet: u = g on tagged nodes; applied by fixed-sparsity row/col
  elimination (HelmholtzAssembler.apply_dirichlet_values).
- Neumann:   du/dn = g; adds int_Gamma g phi to the RHS.
- Robin:     du/dn + alpha u = g; adds +alpha B_tag to the system and
  int_Gamma g phi to the RHS. ``absorbing(tag, k)`` is alpha = i k
  (first-order radiation BC, robin.rs:73).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from mathaudio_tpu.fem.assembly import _face_table
from mathaudio_tpu.fem.mesh import Mesh
from mathaudio_tpu.xtypes import default_complex, default_float


@dataclasses.dataclass
class DirichletBC:
    tag: int
    value: Callable  # coords (..., d) -> complex value


@dataclasses.dataclass
class NeumannBC:
    tag: int
    flux: Callable  # coords (..., d) -> complex value


@dataclasses.dataclass
class RobinBC:
    tag: int
    alpha: complex
    g: Optional[Callable] = None

    @classmethod
    def absorbing(cls, tag: int, k: float) -> "RobinBC":
        """Sommerfeld radiation BC (robin.rs:73 absorbing). With this
        package's e^{+ikr}/e^{-i omega t} convention an outgoing wave
        satisfies du/dn - ik u = 0, so alpha = -ik."""
        return cls(tag, -1j * k)

    @classmethod
    def absorbing_curved(cls, tag: int, k: float, radius: float, dim: int = 3) -> "RobinBC":
        """First-order Bayliss–Turkel radiation BC on a circle/sphere of
        the given radius: du/dn + (-ik + (dim-1)/(2 r)) u = 0. Reflection
        O(1/(kr)^2) instead of the plain Sommerfeld O(1/(kr))."""
        return cls(tag, -1j * k + (dim - 1) / (2.0 * radius))

    @classmethod
    def admittance(cls, tag: int, k: float, beta: complex) -> "RobinBC":
        """Locally-reacting wall with normalized admittance beta = rho c/Z:
        momentum (e^{-i omega t}) gives dp/dn = +ik beta p with n out of
        the fluid, i.e. alpha = -ik beta. Energy is absorbed for
        Re(Z) > 0."""
        return cls(tag, -1j * k * beta)


def dirichlet_mask_and_values(mesh: Mesh, bcs: Sequence[DirichletBC], cdtype=None):
    """(constrained (N,) bool, g (N,) complex with zeros on free nodes)."""
    cdtype = cdtype or default_complex()
    n = mesh.num_nodes
    constrained = np.zeros(n, bool)
    g = np.zeros(n, np.complex128)
    for bc in bcs:
        nodes = mesh.boundary_nodes(tags=[bc.tag])
        constrained[nodes] = True
        vals = bc.value(jnp.asarray(mesh.nodes[nodes], default_float()))
        g[nodes] = np.asarray(vals, np.complex128)
    return jnp.asarray(constrained), jnp.asarray(g, cdtype)


def surface_load(mesh: Mesh, tag: int, fn: Callable, cdtype=None):
    """RHS contribution int_Gamma_tag fn(x) phi_i dS (neumann.rs:61)."""
    cdtype = cdtype or default_complex()
    rdtype = default_float()
    sel = mesh.boundary_markers == tag
    faces = mesh.boundary_faces[sel]
    n = mesh.num_nodes
    if len(faces) == 0:
        return jnp.zeros(n, cdtype)
    pts, w, phi, grad = _face_table(mesh.element_type)
    coords = jnp.asarray(mesh.nodes[faces], rdtype)
    phi_d = jnp.asarray(phi, rdtype)
    grad_d = jnp.asarray(grad, rdtype)
    w_d = jnp.asarray(w, rdtype)

    x_q = jnp.einsum("qv,fvd->fqd", phi_d, coords)
    g_q = jnp.asarray(fn(x_q), cdtype)  # (F, nq)
    jac = jnp.einsum("fvd,qvk->fqdk", coords, grad_d)
    metric = jnp.einsum("fqdk,fqdl->fqkl", jac, jac)
    det = jnp.sqrt(jnp.abs(jnp.linalg.det(metric)))
    contrib = jnp.einsum("q,fq,fq,qv->fv", w_d, det.astype(cdtype), g_q, phi_d.astype(cdtype))
    return jnp.zeros(n, cdtype).at[jnp.asarray(faces.reshape(-1))].add(contrib.reshape(-1))
