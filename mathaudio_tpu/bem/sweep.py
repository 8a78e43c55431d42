"""Batched BEM frequency sweep — the reference's per-frequency loop
(math-bem/examples/audio_frequency_sweep.rs; bem_solver.rs called once
per frequency) turned into ONE jit: the collocation assembly is traced
with the wavenumber as an argument, so a whole band of frequencies
assembles and solves as batched dense algebra on the MXU.

Shardable over the frequency axis with `mathaudio_tpu.parallel`
(embarrassingly parallel — one matrix per device slice).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from mathaudio_tpu.bem.assembly import _assemble_jit, _self_angular_rule
from mathaudio_tpu.bem.incident import IncidentField
from mathaudio_tpu.bem.mesh import SurfaceMesh
from mathaudio_tpu.solvers.direct import complex_solve
from mathaudio_tpu.xtypes import default_float


def sweep_fn(mesh: SurfaceMesh, quad_order: int = 3, burton_miller: bool = False,
             dtype=None):
    """Returns a jittable ``(ks, betas, rhs) -> (F, N) pressures``.

    ``betas``: per-frequency Burton–Miller couplings ((F,) complex; pass
    zeros with burton_miller=False). ``rhs``: (F, N) incident values
    (already combined with -beta * dp/dn for Burton–Miller).
    """
    dtype = dtype or default_float()
    centers = jnp.asarray(mesh.centers, dtype)
    normals = jnp.asarray(mesh.normals, dtype)
    qp, qw = mesh.quad_points(quad_order)
    qp = jnp.asarray(qp, dtype)
    qw = jnp.asarray(qw, dtype)
    self_r, self_w = _self_angular_rule(mesh)
    self_r = jnp.asarray(self_r, dtype)
    self_w = jnp.asarray(self_w, dtype)

    def one(k, beta, rhs):
        a = _assemble_jit(centers, normals, qp, qw, self_r, self_w, k, beta,
                          burton_miller)
        return complex_solve(a, rhs)

    return jax.vmap(one)


def bem_frequency_sweep(
    mesh: SurfaceMesh,
    ks,
    incident: IncidentField,
    burton_miller: bool = False,
    beta_scale: float = 4.0,
    quad_order: int = 3,
    dtype=None,
):
    """(F, N) surface pressures for a band of wavenumbers in one jit."""
    dtype = dtype or default_float()
    ks = jnp.asarray(ks, dtype)
    centers = jnp.asarray(mesh.centers, dtype)
    normals = jnp.asarray(mesh.normals, dtype)
    if burton_miller:
        # beta = scale * i/(k + 1/h) — the dense path's element-size-aware
        # bound (types.rs burton_miller_beta_optimal), traced over k
        h = mesh.avg_element_size()
        betas = beta_scale * 1j / (ks + 1.0 / max(h, 1e-12))
        rhs = jax.vmap(
            lambda k, b: incident.pressure(centers, k)
            - b * incident.normal_derivative(centers, normals, k)
        )(ks, betas)
    else:
        betas = jnp.zeros_like(ks).astype(jnp.result_type(1j * ks))
        rhs = jax.vmap(lambda k: incident.pressure(centers, k))(ks)
    fn = jax.jit(sweep_fn(mesh, quad_order, burton_miller, dtype))
    return fn(ks, betas, rhs)
