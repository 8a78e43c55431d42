"""Flagship model: FEM Helmholtz room simulation with a batched
frequency sweep.

This is the TPU-native reshaping of the reference's roomsim-fem hot path
(math-fem/bin/room_simulator_fem.rs:941-1660): K/M/boundary-mass
assembled once and kept device-resident, then for every frequency the
system values are one fused combine K - k^2 M - ik*beta*B and the
solve is preconditioned GMRES — all inside one jit, *vmapped over the
frequency batch* (the reference rayon-parallelizes frequencies instead).

All device state lives in an explicit ``params`` pytree passed as a jit
argument (never closure-captured — remote-TPU backends can't pull device
constants back to host during tracing, and explicit params are what the
sharding story wants anyway).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from mathaudio_tpu.fem.assembly import HelmholtzAssembler, assemble_rhs, scatter_diag, scatter_ell
from mathaudio_tpu.fem.mesh import Mesh
from mathaudio_tpu.solvers import KrylovConfig, gmres
from mathaudio_tpu.solvers.operators import EllOperator
from mathaudio_tpu.xtypes import default_float, pressure_to_spl


class RoomParams(NamedTuple):
    """Device state of the room model (the 'weights')."""

    k_vals: jnp.ndarray  # (nnz,) stiffness values
    m_vals: jnp.ndarray  # (nnz,) mass values
    b_sum: jnp.ndarray  # (nnz,) summed wall boundary-mass values
    rhs: jnp.ndarray  # (N,) complex source vector
    ell_indices: jnp.ndarray  # (N, W) int32
    csr2ell: jnp.ndarray  # (nnz,) int
    row_of_slot: jnp.ndarray  # (nnz,) int32
    col_of_slot: jnp.ndarray  # (nnz,) int32
    listen_idx: jnp.ndarray  # (L,) int


def system_values_of(params: RoomParams, k, absorption: float):
    """K - k^2 M - ik*beta*B as one fused elementwise combine."""
    cd = params.rhs.dtype
    return (params.k_vals - (k**2) * params.m_vals).astype(cd) + jnp.asarray(
        -1j * k * absorption
    ).astype(cd) * params.b_sum.astype(cd)


def operator_of(params: RoomParams, vals, num_nodes: int, ell_width: int) -> EllOperator:
    return EllOperator(
        params.ell_indices, scatter_ell(vals, params.csr2ell, num_nodes, ell_width), num_nodes
    )


def jacobi_of(params: RoomParams, vals, num_nodes: int):
    diag = scatter_diag(vals, params.row_of_slot, params.col_of_slot, num_nodes)
    return jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 1.0)


def sweep_pressure(
    params: RoomParams,
    ks,
    absorption: float,
    config: KrylovConfig,
    num_nodes: int,
    ell_width: int,
    mg_builder=None,
    mg_shift=(1.0, 0.5),
    mg_nu: int = 2,
    mg_omega: float = 2.0 / 3.0,
    mg_coarse_anchors: int = 0,
    mg_nu_post=None,
    mg_cycle_type: str = "v",
):
    """Pure batched sweep: (F,) wavenumbers -> pressure (F, L) complex,
    iterations (F,), converged (F,). jit/shard_map-ready.

    With ``mg_builder`` (fem.multigrid.MgBuilder) the solve is GMRES
    preconditioned by a shifted-Laplacian V-cycle built per frequency
    inside the jit; otherwise Jacobi.

    ``mg_coarse_anchors > 0`` shares the coarse-level dense inverse — by
    far the dominant per-frequency build cost — across chunks of
    adjacent frequencies: only that many inverses are computed, each at
    its chunk's mean wavenumber (via a Newton-Schulz chain: one direct
    inverse + 3 MXU matmuls per anchor, see build_coarse_inv_chain). The
    coarse operator varies O(k dk) within a chunk, a small perturbation
    of an already-inexact (shifted) preconditioner; GMRES iteration
    counts are essentially unchanged for bands split into >= 32 chunks.
    Assumes ``ks`` is sorted so chunks are contiguous in k. Anchors
    spaced too far apart for Newton-Schulz refinement are detected by a
    residual check and inverted directly instead (see
    build_coarse_inv_chain), so wide bands/few anchors stay correct —
    just without the chain's speed advantage.

    Per-frequency system values (fine operator and smoothing levels)
    are built by one fused elementwise combine of frequency-shared
    K/M/B ELL tables — the tables carry no batch dimension under the
    vmap, so the scatters from CSR order run once for the whole batch
    instead of once per frequency.
    """
    cd = params.rhs.dtype

    def ell_table(vals):
        return scatter_ell(vals, params.csr2ell, num_nodes, ell_width)

    def diag_table(vals):
        return scatter_diag(vals, params.row_of_slot, params.col_of_slot, num_nodes)

    # Frequency-shared tables: computed once, broadcast across the vmap.
    ell_k, ell_m, ell_b = ell_table(params.k_vals), ell_table(params.m_vals), ell_table(params.b_sum)
    dg_k, dg_m, dg_b = diag_table(params.k_vals), diag_table(params.m_vals), diag_table(params.b_sum)

    def fine_matvec_of(k):
        cm = jnp.asarray(k**2).astype(cd)
        cb = jnp.asarray(-1j * absorption, cd) * k.astype(cd)
        # Materialized per-frequency complex values (one fused elementwise
        # combine of the shared tables — NOT a per-frequency scatter);
        # the single-reduction gather-matvec over a complex table measures
        # ~3x faster than fusing the combine into the matvec on TPU.
        ell_c = ell_k.astype(cd) - cm * ell_m.astype(cd) + cb * ell_b.astype(cd)

        def matvec(x):
            xg = jnp.take(x, params.ell_indices, axis=0)
            return jnp.sum(ell_c * xg, axis=1)

        diag = dg_k.astype(cd) - cm * dg_m.astype(cd) + cb * dg_b.astype(cd)
        inv_diag = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 1.0)
        return matvec, ell_c, inv_diag

    if mg_builder is not None and mg_coarse_anchors:
        from mathaudio_tpu.fem.multigrid import (
            MgLevel,
            MgParams,
            build_coarse_inv_chain,
            build_mg_levels,
            mg_cycle,
        )

        n_f = ks.shape[0]
        n_anchor = min(int(mg_coarse_anchors), n_f)
        anchor_ids = (jnp.arange(n_f) * n_anchor) // n_f
        counts = jax.ops.segment_sum(jnp.ones_like(ks), anchor_ids, n_anchor)
        anchor_ks = jax.ops.segment_sum(ks, anchor_ids, n_anchor) / counts
        anchor_inv = build_coarse_inv_chain(
            mg_builder,
            anchor_ks,
            (-1j * absorption) * anchor_ks.astype(cd),
            shift=mg_shift,
        )

        def one_anchored(k, coarse_inv):
            matvec, ell_c, inv_diag = fine_matvec_of(k)
            levels = list(build_mg_levels(
                mg_builder, k, robin_coeff=-1j * k * absorption, shift=mg_shift
            ))
            # Level-0 smoothing on the TRUE operator, reusing the fine
            # matvec's value table: iteration counts are identical to
            # shifted level-0 smoothing (measured on the bench band) —
            # Jacobi sweeps need no MG-stability shift, only the coarse
            # levels do — and the level-0 shifted table (2.3 GB at bench
            # scale) is never built.
            levels[0] = MgLevel(
                params.ell_indices, ell_c, inv_diag, levels[0].p_idx,
                levels[0].p_w, levels[0].r_idx, levels[0].r_w,
            )
            mgp = MgParams(tuple(levels), coarse_inv)
            pre = lambda r: mg_cycle(mgp, r, omega=mg_omega, nu=mg_nu,
                                     cycle=mg_cycle_type, nu_post=mg_nu_post)
            sol = gmres(matvec, params.rhs, config=config, preconditioner=pre)
            return sol.x[params.listen_idx], sol.iterations, sol.converged

        chunk = n_f // n_anchor if n_f % n_anchor == 0 else 0
        if chunk and chunk % 128 == 0:
            # Nested vmap: outer over anchors, inner over each anchor's
            # contiguous frequency chunk. The chunk shares one coarse
            # inverse (no batch dim in the inner vmap), so the coarse
            # solve batches into a (chunk, 2Nc) x (2Nc, 2Nc) MXU matmul
            # and the (F, 2Nc, 2Nc) gathered-inverse tensor (1.5 GB at
            # bench scale) is never materialized. Restricted to chunks
            # that are a multiple of the 128-lane TPU tile: the inner
            # batch dimension lands in vector lanes, and a partial tile
            # pads every major tensor (a chunk of 32 padded 4x OOMed the
            # bench sweep).
            ks2 = ks.reshape(n_anchor, chunk)
            p, its, conv = jax.vmap(
                lambda kc, cinv: jax.vmap(lambda k: one_anchored(k, cinv))(kc)
            )(ks2, anchor_inv)
            return (
                p.reshape((n_f,) + p.shape[2:]),
                its.reshape(n_f),
                conv.reshape(n_f),
            )

        return jax.vmap(one_anchored)(ks, anchor_inv[anchor_ids])

    def one(k):
        matvec, _, inv_diag = fine_matvec_of(k)
        if mg_builder is not None:
            from mathaudio_tpu.fem.multigrid import build_mg_params, mg_cycle

            mgp = build_mg_params(
                mg_builder, k, robin_coeff=-1j * k * absorption, shift=mg_shift
            )
            pre = lambda r: mg_cycle(mgp, r, omega=mg_omega, nu=mg_nu,
                                     cycle=mg_cycle_type, nu_post=mg_nu_post)
        else:
            pre = lambda x: inv_diag * x
        sol = gmres(matvec, params.rhs, config=config, preconditioner=pre)
        return sol.x[params.listen_idx], sol.iterations, sol.converged

    return jax.vmap(one)(ks)


class RoomSweepModel:
    """Device-resident room model: absorbing walls (admittance Robin),
    Gaussian monopole source, listening-position SPL output."""

    def __init__(
        self,
        mesh: Mesh,
        wall_tags: Sequence[int] = (1, 2, 3, 4, 5, 6),
        absorption: float = 0.1,
        source_position=(0.5, 0.5, 0.5),
        source_width: float = 0.1,
        listening_positions=((0.25, 0.25, 0.25),),
        dtype=None,
        assembler: Optional[HelmholtzAssembler] = None,
    ):
        """``assembler``: a prebuilt HelmholtzAssembler for ``mesh`` (e.g.
        GeometricMultigrid.assemblers[0]) to avoid assembling the fine
        level twice — it must match mesh/wall_tags/dtype."""
        dtype = dtype or default_float()
        self.dtype = dtype
        self.mesh = mesh
        self.absorption = absorption
        self.assembler = assembler if assembler is not None else HelmholtzAssembler(
            mesh, robin_tags=tuple(wall_tags), dtype=dtype
        )
        self.wall_tags = tuple(wall_tags)
        self.num_nodes = mesh.num_nodes
        self.ell_width = self.assembler.ell_width

        # Gaussian source RHS (room_simulator_fem.rs:42, sigma = 0.1 m),
        # frequency-independent so it is assembled once.
        src = np.asarray(source_position, np.float64)[: mesh.dim]
        sw = 2.0 * source_width**2
        # unit-monopole normalization (int f dV = 1)
        norm = (2.0 * np.pi * source_width**2) ** (mesh.dim / 2.0)

        def source_fn(x):
            r2 = jnp.sum((x - jnp.asarray(src, x.dtype)) ** 2, axis=-1)
            return jnp.exp(-r2 / sw) / norm

        rhs = assemble_rhs(mesh, source_fn, dtype=dtype).astype(self.assembler.cdtype)

        # Nearest-node listening positions (P1-exact at nodes).
        lp = np.asarray(listening_positions)[:, : mesh.dim]
        d2 = ((mesh.nodes[None, :, :] - lp[:, None, :]) ** 2).sum(-1)
        listen_idx = np.argmin(d2, axis=1)

        b_sum = sum(self.assembler.b_vals[t] for t in self.wall_tags)
        self._params = RoomParams(
            k_vals=self.assembler.k_vals,
            m_vals=self.assembler.m_vals,
            b_sum=b_sum,
            rhs=rhs,
            ell_indices=self.assembler.ell_indices,
            csr2ell=self.assembler.csr2ell,
            row_of_slot=self.assembler.row_of_slot,
            col_of_slot=self.assembler.col_of_slot,
            listen_idx=jnp.asarray(listen_idx),
        )

    def params(self) -> RoomParams:
        return self._params

    def sweep_fn(self, config: Optional[KrylovConfig] = None, mg_builder=None,
                 mg_nu: int = 2, mg_omega: float = 2.0 / 3.0,
                 mg_coarse_anchors: int = 0, mg_nu_post=None,
                 mg_cycle_type: str = "v"):
        """(params, ks) -> (pressure, iterations, converged); jit this.
        Pass an fem.multigrid.MgBuilder for shifted-Laplacian V-cycle
        preconditioning (built per frequency inside the jit);
        ``mg_coarse_anchors`` shares coarse inverses across frequency
        chunks (see sweep_pressure)."""
        config = config or KrylovConfig(max_iterations=300, tolerance=1e-5, restart=30)
        return partial(
            sweep_pressure,
            absorption=self.absorption,
            config=config,
            num_nodes=self.num_nodes,
            ell_width=self.ell_width,
            mg_builder=mg_builder,
            mg_nu=mg_nu,
            mg_omega=mg_omega,
            mg_coarse_anchors=mg_coarse_anchors,
            mg_nu_post=mg_nu_post,
            mg_cycle_type=mg_cycle_type,
        )

    def sweep(self, ks, config: Optional[KrylovConfig] = None):
        fn = self.sweep_fn(config)
        return fn(self._params, jnp.asarray(ks, self.dtype))

    def sweep_spl(self, ks, config: Optional[KrylovConfig] = None):
        p, its, conv = self.sweep(ks, config)
        return pressure_to_spl(jnp.abs(p)), its, conv
