"""Node-major frequency sweep for the flagship FEM room model.

Same physics, same algorithm as models.helmholtz_room.sweep_pressure
(fused K - k²M - ikαB operator, shifted-Laplacian multigrid-
preconditioned GMRES, anchored coarse inverses) — but the batch axis is
the MINOR axis: every vector is (N, F) with the frequency band living in
vector lanes, the level operators are DIA streaming matvecs
(fem/dia.py), and GMRES/multigrid are explicitly batched
(solvers/krylov_batched.py, fem/multigrid_batched.py) instead of vmapped.

Why: the vmapped sweep's lane-gather SpMV moves 142 GB/s effective and
its per-frequency (F, N, W) complex value table costs 2.3 GB of HBM and
a rebuild per sweep; node-major DIA streams at 716 GB/s (measured,
ARCHITECTURE.md §10) from three small frequency-shared real tables, and
the table never exists. Applies to the structured box meshes of the
headline bench (any level count); unstructured meshes stay on the
vmapped ELL path.

Reference analog: math-fem/bin/room_simulator_fem.rs:941-1660 (the rayon
frequency loop), math-solvers/src/iterative/gmres.rs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from mathaudio_tpu.fem.dia import DiaTables, dia_diag, dia_matvec, dia_tables_of
from mathaudio_tpu.fem.multigrid import (
    GeometricMultigrid,
    MgBuilder,
    box_grid_dims,
    build_coarse_inv_chain,
    prolongation_1d,
)
from mathaudio_tpu.fem.multigrid_batched import DiaLevel, make_dia_mg, mg_cycle_batched
from mathaudio_tpu.models.helmholtz_room import RoomSweepModel
from mathaudio_tpu.solvers import KrylovConfig
from mathaudio_tpu.solvers.krylov_batched import gmres_batched


class NodeMajorParams(NamedTuple):
    """Device state of the node-major sweep (arrays only)."""

    fine_tables: DiaTables  # level-0 TRUE operator (also smoothing level 0)
    levels: Tuple[DiaLevel, ...]  # smoothing levels (level 0 shares fine_tables)
    mg_builder: MgBuilder  # coarsest-level pieces for the anchor inverses
    rhs: jnp.ndarray  # (N,) complex
    listen_idx: jnp.ndarray
    # Per-level (pz, py, px) separable 1D transfer factors, or () when the
    # hierarchy is not a lexicographic box grid (gather-stencil fallback).
    tp: Tuple[tuple, ...] = ()


class NodeMajorRoomSweep:
    """Host-side builder: extracts the static DIA offset patterns of every
    level once, then emits a jittable batched sweep function."""

    def __init__(self, model: RoomSweepModel, mg: GeometricMultigrid):
        self.model = model
        self.mg = mg
        self.absorption = model.absorption

        def b_sum_of(asm):
            return (
                sum(asm.b_vals.values())
                if asm.b_vals
                else jnp.zeros_like(asm.k_vals)
            )

        # Level 0: the model's own (true-operator) assembler.
        self._check_structured(model.assembler)
        offs0, fine_tables = dia_tables_of(
            model.assembler, sum(model.assembler.b_vals[t] for t in model.wall_tags)
        )
        offsets = [offs0]
        levels = []
        builder = mg.builder
        for l, asm in enumerate(mg.assemblers[:-1]):
            bl = builder.levels[l]
            if l == 0:
                tabs = fine_tables
            else:
                self._check_structured(asm)
                offs_l, tabs = dia_tables_of(asm, b_sum_of(asm))
                offsets.append(offs_l)
            levels.append(DiaLevel(tabs, bl.p_idx, bl.p_w, bl.r_idx, bl.r_w))
        self.offsets: Tuple[Tuple[int, ...], ...] = tuple(offsets)
        self.grid_dims = self._grid_dims(mg, len(levels))
        self._params = NodeMajorParams(
            fine_tables=fine_tables,
            levels=tuple(levels),
            mg_builder=builder,
            rhs=model.params().rhs,
            listen_idx=model.params().listen_idx,
            tp=self._tp_factors(mg, levels, model.dtype),
        )

    @staticmethod
    def _grid_dims(mg, n_levels: int) -> Tuple[Tuple[int, int, int], ...]:
        """Static (nx, ny, nz) node counts of every mesh in the hierarchy
        (n_levels smoothing meshes + the coarsest), for the streaming
        per-axis transfers; () if any mesh is not a lexicographic box
        grid or any level pair breaks the 2:1 nesting the stream form
        assumes (f = 2(c-1)+1 per axis)."""
        dims = []
        for l in range(n_levels + 1):
            d = box_grid_dims(mg.meshes[l])
            if d is None:
                return ()
            dims.append(d)
        for df, dc in zip(dims[:-1], dims[1:]):
            if any(f != 2 * (c - 1) + 1 for f, c in zip(df, dc)):
                return ()
        return tuple(dims)

    @staticmethod
    def _tp_factors(mg, levels, dtype) -> Tuple[tuple, ...]:
        """Separable 1D transfer factors per level, verified against the
        gather stencil on a random vector; () if any level is not a
        lexicographic box grid (the cycle then keeps the gather path)."""
        tps = []
        for l in range(len(levels)):
            df = box_grid_dims(mg.meshes[l])
            dc = box_grid_dims(mg.meshes[l + 1])
            if (
                df is None
                or dc is None
                or any(f != 2 * (c - 1) + 1 for f, c in zip(df, dc))
            ):
                return ()
            mats = [prolongation_1d(c - 1) for c in (dc[2], dc[1], dc[0])]
            # cross-check vs the stencil transfer (same operator exactly)
            rng = np.random.default_rng(l)
            nc = dc[0] * dc[1] * dc[2]
            v = rng.standard_normal(nc)
            v4 = v.reshape(dc[2], dc[1], dc[0])
            y4 = np.einsum("zyx,Xx->zyX", v4, mats[2])
            y4 = np.einsum("zyx,Yy->zYx", y4, mats[1])
            y4 = np.einsum("zyx,Zz->Zyx", y4, mats[0])
            p_idx = np.asarray(levels[l].p_idx)
            p_w = np.asarray(levels[l].p_w)
            y_st = (p_w * v[p_idx]).sum(axis=1)
            if not np.allclose(y4.ravel(), y_st, atol=1e-12 * max(1.0, abs(v).max())):
                return ()
            tps.append(tuple(jnp.asarray(m, dtype) for m in mats))
        return tuple(tps)

    @staticmethod
    def _check_structured(asm):
        """DIA storage is (n_diagonals, N); on an unstructured mesh the
        distinct col-row offsets approach O(N) and the tables silently
        blow up toward dense N². Require near-stencil density (box meshes
        have exactly 15 diagonals; allow modest slack) and point
        unstructured meshes at the vmapped ELL path."""
        off = np.unique(np.asarray(asm.col_of_slot) - np.asarray(asm.row_of_slot))
        nnz = np.asarray(asm.row_of_slot).size
        if off.size * asm.num_nodes > 4 * nnz:
            raise ValueError(
                f"mesh is not structured enough for the node-major DIA sweep: "
                f"{off.size} distinct diagonals x {asm.num_nodes} nodes vs "
                f"{nnz} nonzeros; use RoomSweepModel.sweep_fn (vmapped ELL) "
                f"for unstructured meshes"
            )

    def params(self) -> NodeMajorParams:
        return self._params

    def sweep_fn(
        self,
        config: Optional[KrylovConfig] = None,
        mg_shift: Tuple[float, float] = (1.0, 0.5),
        mg_nu: int = 2,
        mg_omega: float = 2.0 / 3.0,
        mg_coarse_anchors: int = 0,
        mg_nu_post=None,
        mg_cycle_type: str = "v",
        gmres_orth: str = "cgs2",
        mg_transfers: str = "gather",
        freq_chunk: int = 0,
        warm_stride: int = 0,
        warm_restart: int = 0,
        warm_interp: str = "linear",
    ):
        """(params, ks) -> (pressure (F, L), iterations (F,), converged
        (F,)); jit this. ``ks`` must be sorted ascending (anchored coarse
        inverses assume contiguous chunks). ``mg_coarse_anchors <= 0``
        means one coarse inverse per frequency (exact, no anchoring —
        matching RoomSweepModel.sweep_fn's anchors=0 mode); a positive
        count that does not divide len(ks) is rounded down to the nearest
        divisor with a warning. Smoothing defaults match
        RoomSweepModel.sweep_fn (the bench passes its tuned knobs
        explicitly).

        ``mg_transfers``: "gather" (default) applies the transfer stencils
        as row gathers; "stream" applies them as separable per-axis
        slice/interleave passes on the VPU (no gather, no matmul padding
        — 1.44x/1.23x faster than gather in isolation at bench shape,
        examples/mg_transfer_ab.py, but 8.59e7 vs 9.0e7 DoF-solves/s in
        the full chip sweep — the isolated win does not survive fusion
        context, same verdict as "tp"; requires a 2:1-nested box
        hierarchy); "stream16" is the stream form with the transfer
        traffic in bf16 re/im planes — half the bytes
        (examples/bf16_vcycle_probe.py) but the ~4e-3
        preconditioner-internal rounding triples the bench band's
        iteration count (5.5 -> 18.1 avg: lanes that converged in one
        6-step restart cycle now need two or three), posting 2.68e7 —
        measured 2026-08-20, kept as the record that bf16 anywhere in
        the V-cycle is dead at tolerance 1e-5 (convergence itself stays
        correctly gated on the Givens/true residuals — the accepted
        solutions remain tolerance-accurate, they just cost 3x);
        "tp" applies them as separable per-axis matmuls
        (fem.multigrid_batched._prolong_tp — identical operator, requires
        params.tp). TP wins the isolated microbench ~6x
        (examples/fem_roofline_nm.py) but LOSES in the full sweep: 264 ms
        vs 224 ms at bench shape (2048 x 9261), because the 4D reshaped
        einsum views force relayouts against the (N, F) pipeline that the
        out-of-context timing never pays, and the transfers are only ~4%
        of the cycle to begin with. Measured on v5e, 2026-08-18.

        ``freq_chunk``: > 0 streams the band through sequential lax.map
        chunks of that many frequencies (must divide len(ks)), bounding
        resident HBM to one chunk's GMRES basis + vectors — the device
        analog of the reference's MemoryEstimate batch planner
        (room_simulator_fem.rs:56-120). ``mg_coarse_anchors`` then counts
        anchors PER CHUNK. Use utils.memory to size it, or 0 (default)
        for the whole band at once.

        ``warm_stride``: > 1 runs the band in two phases — solve the
        stride-subsampled band ks[::warm_stride] cold, lane-linearly
        interpolate those solutions across the band (last partial
        segment clamps to the final anchor), and solve the full band
        warm-started from the interpolant with restart ``warm_restart``
        (0 = config.restart). The lockstep cost model this attacks: the
        cold band pays one full trace-unrolled restart-6 Arnoldi cycle
        for every lane; the warm band's dominant cost is
        (1/stride) * 6 + warm_restart steps, a win whenever the
        interpolant converges inside one short cycle (the hierarchical
        device analog of room_simulator_fem.rs:941's warm-started
        frequency continuation). Per-lane iteration counts stay honest:
        anchor lanes report phase-1 + phase-2 iterations. Interpolation
        is in LANE index, i.e. in k for the linearly spaced headline
        band. Must divide the (chunk) band length.

        ``warm_interp``: "linear" (2-anchor, O(h^2) interpolant) or
        "cubic" (4-anchor Catmull-Rom, O(h^4) — a better warm start for
        the same anchor cost; edge segments clamp to the boundary
        anchors). Both are shift-and-scale lane arithmetic, no gathers."""
        config = config or KrylovConfig(max_iterations=300, tolerance=1e-5, restart=30)
        if mg_transfers not in ("gather", "tp", "stream", "stream16"):
            raise ValueError(f"unknown mg_transfers {mg_transfers!r}")
        if mg_transfers in ("stream", "stream16") and not self.grid_dims:
            raise ValueError(
                f"mg_transfers={mg_transfers!r} needs a lexicographic "
                "2:1-nested box hierarchy (box_grid_dims failed on a level)"
            )
        offsets = self.offsets
        absorption = self.absorption
        grid_dims = self.grid_dims if mg_transfers in ("stream", "stream16") else ()

        def fn(params: NodeMajorParams, ks):
            nf_total = ks.shape[0]
            if freq_chunk and 0 < freq_chunk < nf_total:
                if nf_total % freq_chunk:
                    raise ValueError(
                        f"freq_chunk={freq_chunk} does not divide the band "
                        f"({nf_total} frequencies)"
                    )
                nc = nf_total // freq_chunk
                p, its, conv = jax.lax.map(
                    lambda ks_c: _one_chunk(params, ks_c),
                    ks.reshape(nc, freq_chunk),
                )
                return p.reshape(nf_total, -1), its.reshape(-1), conv.reshape(-1)
            return _one_chunk(params, ks)

        def _band_solve(params: NodeMajorParams, ks, x0, cfg):
            """Cold or warm GMRES-MG solve of one (sub)band; returns the
            full KrylovSolution (x kept (N, F) for interpolation)."""
            nf = ks.shape[0]
            cd = params.rhs.dtype
            n = params.rhs.shape[0]
            k = ks.astype(cd)
            cm_fine = k * k
            cb_fine = jnp.asarray(-1j * absorption, cd) * k

            na = nf if mg_coarse_anchors <= 0 else min(int(mg_coarse_anchors), nf)
            if nf % na:
                na = max(d for d in range(1, na + 1) if nf % d == 0)
                import warnings

                warnings.warn(
                    f"mg_coarse_anchors={mg_coarse_anchors} does not divide "
                    f"the band ({nf} frequencies); using {na} anchors",
                    stacklevel=2,
                )
            anchor_ks = jnp.mean(ks.reshape(na, nf // na), axis=1)
            anchor_inv = build_coarse_inv_chain(
                params.mg_builder,
                anchor_ks,
                jnp.asarray(-1j * absorption, cd) * anchor_ks.astype(cd),
                shift=mg_shift,
            )
            mgp = make_dia_mg(
                offsets, params.levels, ks, absorption, anchor_inv,
                shift=mg_shift,
                tp=params.tp if mg_transfers == "tp" else (),
                dims=grid_dims,
                transfer_bf16=(mg_transfers == "stream16"),
            )
            a_mv = lambda x: dia_matvec(
                offsets[0], params.fine_tables, cm_fine, cb_fine, x
            )
            pre = lambda r: mg_cycle_batched(
                mgp, offsets, r,
                omega=mg_omega, nu=mg_nu, cycle=mg_cycle_type, nu_post=mg_nu_post,
            )
            b = jnp.broadcast_to(params.rhs[:, None], (n, nf))
            return gmres_batched(a_mv, b, config=cfg, preconditioner=pre,
                                 orth=gmres_orth, x0=x0)

        def _one_chunk(params: NodeMajorParams, ks):
            nf = ks.shape[0]
            if warm_stride > 1:
                s = int(warm_stride)
                if nf % s:
                    raise ValueError(
                        f"warm_stride={s} does not divide the band ({nf})"
                    )
                sol_a = _band_solve(params, ks[::s], None, config)
                xa = sol_a.x  # (N, F/s) anchor solutions
                n = xa.shape[0]
                t = (jnp.arange(s) / s).astype(xa.real.dtype)
                xp1 = jnp.concatenate([xa[:, 1:], xa[:, -1:]], axis=1)
                if warm_interp == "cubic":
                    # Catmull-Rom on the uniform anchor grid; edge
                    # segments clamp the missing outer anchors
                    xm1 = jnp.concatenate([xa[:, :1], xa[:, :-1]], axis=1)
                    xp2 = jnp.concatenate([xp1[:, 1:], xp1[:, -1:]], axis=1)
                    t2, t3 = t * t, t * t * t
                    w0 = -0.5 * t3 + t2 - 0.5 * t
                    w1 = 1.5 * t3 - 2.5 * t2 + 1.0
                    w2 = -1.5 * t3 + 2.0 * t2 + 0.5 * t
                    w3 = 0.5 * t3 - 0.5 * t2
                    x0 = (xm1[:, :, None] * w0 + xa[:, :, None] * w1
                          + xp1[:, :, None] * w2 + xp2[:, :, None] * w3)
                elif warm_interp == "linear":
                    # lane-linear; the last partial segment has no right
                    # anchor and clamps (constant) to the final one
                    x0 = xa[:, :, None] * (1.0 - t) + xp1[:, :, None] * t
                else:
                    raise ValueError(f"unknown warm_interp {warm_interp!r}")
                x0 = x0.reshape(n, nf)
                cfg2 = config if warm_restart <= 0 else config._replace(
                    restart=int(warm_restart)
                )
                sol = _band_solve(params, ks, x0, cfg2)
                its = sol.iterations.at[::s].add(sol_a.iterations)
            else:
                sol = _band_solve(params, ks, None, config)
                its = sol.iterations
            p = sol.x[params.listen_idx, :].T  # (F, L)
            return p, its, sol.converged

        return fn

    def sharded_sweep_fn(
        self,
        mesh,
        config: Optional[KrylovConfig] = None,
        axis: str = "freq",
        **knobs,
    ):
        """Multi-device frequency-lane sharding of the headline sweep
        (VERDICT r2 item 2; reference analog: the rayon frequency loop,
        room_simulator_fem.rs:1139-1160).

        The node-major layout makes this a pure data split: every (N, F)
        array shards along its lane (frequency) axis, the DIA tables /
        transfer stencils / RHS replicate, and each device runs the
        complete sweep_fn on its contiguous frequency chunk inside
        ``shard_map`` — no collectives in the solve at all (the sweep is
        embarrassingly frequency-parallel), and each device's
        ``while_loop`` exits on its own chunk's convergence instead of
        the global band's max iteration count.

        ``ks`` must be length-divisible by the mesh's ``axis`` size and
        sorted ascending. ``mg_coarse_anchors`` (in **knobs) is the
        PER-DEVICE anchor count: each device anchors its own contiguous
        chunk, so a single-device run with the same per-chunk grouping
        (anchors = per_device * n_devices) matches lane for lane —
        asserted by tests/test_spmd.py::test_nodemajor_sharded_sweep.
        """
        from jax.sharding import PartitionSpec as P

        fn = self.sweep_fn(config, **knobs)
        n_dev = mesh.shape[axis]

        def sharded(params: NodeMajorParams, ks):
            if ks.shape[0] % n_dev:
                raise ValueError(
                    f"{ks.shape[0]} frequencies do not split over {n_dev} devices"
                )

            def local(params, ks_l):
                return fn(params, ks_l)

            return jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(), P(axis)),
                out_specs=(P(axis), P(axis), P(axis)),
                check_vma=False,
            )(params, ks)

        return sharded

    def sweep_fn_jacobi(self, config: Optional[KrylovConfig] = None):
        """Jacobi-preconditioned variant (no multigrid)."""
        config = config or KrylovConfig(max_iterations=300, tolerance=1e-5, restart=30)
        offsets = self.offsets
        absorption = self.absorption

        def fn(params: NodeMajorParams, ks):
            nf = ks.shape[0]
            cd = params.rhs.dtype
            n = params.rhs.shape[0]
            k = ks.astype(cd)
            cm_fine = k * k
            cb_fine = jnp.asarray(-1j * absorption, cd) * k
            diag = dia_diag(params.fine_tables, cm_fine, cb_fine)
            inv_diag = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 1.0)
            a_mv = lambda x: dia_matvec(
                offsets[0], params.fine_tables, cm_fine, cb_fine, x
            )
            b = jnp.broadcast_to(params.rhs[:, None], (n, nf))
            sol = gmres_batched(
                a_mv, b, config=config, preconditioner=lambda v: inv_diag * v
            )
            return sol.x[params.listen_idx, :].T, sol.iterations, sol.converged

        return fn
