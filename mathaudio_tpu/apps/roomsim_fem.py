"""FEM room simulator CLI (math-fem/bin/room_simulator_fem.rs:657).

Pipeline: RoomConfig JSON -> structured tet mesh of the room ->
one-time K/M/boundary-mass assembly -> *batched* frequency sweep (the
reference's rayon frequency loop, :1139, becomes a vmapped jit with
HBM-budgeted batches, the MemoryEstimate analog of :56) -> SPL at the
listening positions -> SimulationResults JSON.

Per-wall absorption/impedance become frequency-dependent Robin
coefficients evaluated inside the jit; sources are Gaussian monopoles
(sigma = 0.1 m, :42) with per-frequency crossover/directivity weights.
Optional hierarchical warm-start (:1640): anchors solved cold, the rest
warm-started from linearly interpolated anchor solutions.
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from mathaudio_tpu.common.config import RoomConfig, WALL_TAGS
from mathaudio_tpu.common.output import create_output_json
from mathaudio_tpu.fem.assembly import HelmholtzAssembler, assemble_rhs
from mathaudio_tpu.fem.mesh import box_mesh_tetrahedra
from mathaudio_tpu.fem.multigrid import GeometricMultigrid, box_hierarchy_dims, build_mg_params, vcycle
from mathaudio_tpu.solvers import KrylovConfig, gmres
from mathaudio_tpu.utils.memory import hbm_frequency_batch
from mathaudio_tpu.utils.profiling import span
from mathaudio_tpu.xtypes import SPEED_OF_SOUND, default_float, pressure_to_spl


def _mesh_dims(w, d, h, resolution, multiple=1):
    def rnd(x):
        n = max(1, round(x * resolution))
        return -(-n // multiple) * multiple

    return rnd(w), rnd(d), rnd(h)


class FemRoomSimulation:
    """Device-resident room simulation state (built once per config)."""

    def __init__(self, config: RoomConfig, use_multigrid: bool = True, verbose: int = 1,
                 source_width: float = 0.1, restart: Optional[int] = None,
                 batch_size: int = 0, memory_gb: float = 0.0):
        self.config = config
        self.source_width = source_width
        self.restart_override = restart
        self.batch_override = batch_size
        self.memory_gb = memory_gb
        self.sim = config.to_simulation()
        self.verbose = verbose
        w, d, h = self.sim.geometry.dimensions()
        res = config.solver.mesh_resolution

        levels = 3 if use_multigrid else 1
        nx, ny, nz = _mesh_dims(w, d, h, res, multiple=2 ** (levels - 1))
        with span("mesh+assembly", verbose):
            if use_multigrid:
                meshes, grid_dims = box_hierarchy_dims(
                    (nx, ny, nz), levels, bounds=(0, w, 0, d, 0, h)
                )
                self.mg = GeometricMultigrid(
                    meshes, robin_tags=tuple(WALL_TAGS.values()), grid_dims=grid_dims
                )
                self.mesh = meshes[0]
                self.assembler = self.mg.assemblers[0]
            else:
                self.mg = None
                self.mesh = box_mesh_tetrahedra(0, w, 0, d, 0, h, nx, ny, nz)
                self.assembler = HelmholtzAssembler(
                    self.mesh, robin_tags=tuple(WALL_TAGS.values())
                )

        # per-wall surface specs, resolved once (static kinds)
        self.wall_specs = config.boundaries.wall_specs()
        self.b_stack = jnp.stack(
            [self.assembler.b_vals[WALL_TAGS[name]] for name in WALL_TAGS]
        )
        self.wall_names = list(WALL_TAGS)

        # per-source Gaussian RHS vectors (F-independent part)
        with span("source assembly", verbose):
            rhs_list = []
            for s in self.sim.sources:
                pos = jnp.asarray(s.position.to_array(), default_float())
                sigma = self.source_width  # m (:42; --source-width)
                sw = 2.0 * sigma**2
                # normalize to a unit monopole: int f dV = 1 so that the
                # near field matches G = e^{ikr}/(4 pi r) (the BEM source)
                norm = (2.0 * np.pi * sigma**2) ** 1.5

                def source_fn(x, pos=pos, norm=norm, pat=s.directivity):
                    # Gaussian envelope x per-point directivity
                    # (room_simulator_fem.rs:2037 amplitude_towards: the
                    # pattern varies over the blob; crossover stays the
                    # per-frequency scalar weight)
                    d = x - pos
                    r2 = jnp.sum(d**2, axis=-1)
                    env = jnp.exp(-r2 / sw) / norm
                    r = jnp.sqrt(r2)
                    rs = jnp.maximum(r, 1e-10)
                    theta = jnp.arccos(jnp.clip(d[..., 2] / rs, -1.0, 1.0))
                    phi = jnp.arctan2(d[..., 1], d[..., 0])
                    fac = jnp.where(
                        r < 1e-10, 1.0, pat.interpolate_array(theta, phi)
                    )
                    return env * fac

                rhs_list.append(
                    assemble_rhs(self.mesh, source_fn).astype(self.assembler.cdtype)
                )
            self.rhs_stack = jnp.stack(rhs_list) if rhs_list else jnp.zeros(
                (0, self.mesh.num_nodes), self.assembler.cdtype
            )

        lp = np.asarray([p.to_array() for p in self.sim.listening_positions])
        d2 = ((self.mesh.nodes[None] - lp[:, None]) ** 2).sum(-1)
        self.listen_idx = jnp.asarray(np.argmin(d2, axis=1))


    def _robin_coeffs(self, k):
        """(T,) traced Robin alphas for the wall tags, order = WALL_TAGS."""
        return jnp.stack(
            [
                jnp.asarray(self.wall_specs[name].robin_alpha(k), self.assembler.cdtype)
                for name in self.wall_names
            ]
        )

    def _sweep_fn(self, kcfg: KrylovConfig):
        asm = self.assembler
        mg_builder = self.mg.builder if self.mg is not None else None

        def one(k, src_weights, x0):
            cd = asm.cdtype
            coeffs = self._robin_coeffs(k)
            vals = (asm.k_vals - (k**2) * asm.m_vals).astype(cd) + jnp.einsum(
                "t,tn->n", coeffs, self.b_stack.astype(cd)
            )
            op = asm.operator_from_values(vals)
            rhs = jnp.einsum("s,sn->n", src_weights.astype(cd), self.rhs_stack)
            if mg_builder is not None:
                mean_alpha = jnp.mean(coeffs)
                mgp = build_mg_params(mg_builder, k, robin_coeff=mean_alpha, shift=(1.0, 0.5))
                pre = lambda r: vcycle(mgp, r)
            else:
                diag = asm.diagonal_of(vals)
                inv_diag = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 1.0)
                pre = lambda r: inv_diag * r
            sol = gmres(op.matvec, rhs, x0=x0, config=kcfg, preconditioner=pre)
            return sol.x, sol.iterations, sol.converged

        def sweep(ks, src_weights, x0s):
            return jax.vmap(one)(ks, src_weights, x0s)

        return sweep

    def source_weights(self, freqs) -> np.ndarray:
        """(F, S) per-frequency source weights (crossover x amplitude)."""
        out = np.ones((len(freqs), max(len(self.sim.sources), 1)))
        for si, s in enumerate(self.sim.sources):
            for fi, f in enumerate(freqs):
                out[fi, si] = s.amplitude * s.crossover.amplitude_at_frequency(float(f))
        return out

    def run(self, hierarchical: bool = False, anchor_stride: int = 4):
        if hierarchical:
            return self._run_hierarchical(anchor_stride=anchor_stride)
        return self._run_flat()

    def _run_hierarchical(self, anchor_stride: int = 4):
        """Warm-start hierarchical solve (room_simulator_fem.rs:1640):
        anchor frequencies solved cold in one batch, intermediates
        warm-started from linearly interpolated anchor solutions."""
        cfg = self.config
        freqs = self.sim.frequencies
        kcfg = KrylovConfig(
            max_iterations=cfg.solver.gmres.max_iter * 10,
            tolerance=cfg.solver.gmres.tolerance,
            restart=self.restart_override or cfg.solver.gmres.restart,
        )
        sweep = jax.jit(self._sweep_fn(kcfg))
        ks = 2.0 * np.pi * freqs / SPEED_OF_SOUND
        weights = self.source_weights(freqs)
        n = self.mesh.num_nodes
        cd = self.assembler.cdtype
        nf = len(freqs)

        anchors = sorted(set(list(range(0, nf, anchor_stride)) + [nf - 1]))
        inter = [i for i in range(nf) if i not in anchors]

        def solve_batch(idx, x0):
            kb = jnp.asarray(ks[idx])
            wb = jnp.asarray(weights[idx])
            x, its, cv = sweep(kb, wb, x0)
            return np.asarray(x), np.asarray(its), np.asarray(cv)

        xa, its_a, cv_a = solve_batch(anchors, jnp.zeros((len(anchors), n), cd))

        x_full = np.zeros((nf, n), complex)
        for ai, i in enumerate(anchors):
            x_full[i] = xa[ai]
        its = np.zeros(nf, int)
        conv = np.zeros(nf, bool)
        its[anchors] = its_a
        conv[anchors] = cv_a

        if inter:
            x0s = np.zeros((len(inter), n), complex)
            for t, i in enumerate(inter):
                lo = max(a for a in anchors if a < i)
                hi = min(a for a in anchors if a > i)
                w_hi = (ks[i] - ks[lo]) / (ks[hi] - ks[lo])
                x0s[t] = (1 - w_hi) * x_full[lo] + w_hi * x_full[hi]
            xi, its_i, cv_i = solve_batch(inter, jnp.asarray(x0s, cd))
            for t, i in enumerate(inter):
                x_full[i] = xi[t]
            its[inter] = its_i
            conv[inter] = cv_i
            if self.verbose:
                print(
                    f"hierarchical: anchors avg {its_a.mean():.1f} iters, "
                    f"warm-started avg {its_i.mean():.1f} iters",
                    file=sys.stderr,
                )

        p = x_full[:, np.asarray(self.listen_idx)]
        spl = np.asarray(pressure_to_spl(np.abs(p)))
        results = create_output_json(
            cfg, freqs, spl,
            extra_metadata={
                "engine": "fem", "hierarchical": True,
                "num_nodes": int(n),
                "iterations": its.tolist(), "converged": conv.tolist(),
            },
        )
        for i, r in enumerate(results.results):
            r.converged = bool(conv[i])
            r.iterations = int(its[i])
            r.pressure_real = p[i].real.tolist()
            r.pressure_imag = p[i].imag.tolist()
        return results

    def _run_flat(self):
        cfg = self.config
        freqs = self.sim.frequencies
        kcfg = KrylovConfig(
            max_iterations=cfg.solver.gmres.max_iter * 10,
            tolerance=cfg.solver.gmres.tolerance,
            restart=self.restart_override or cfg.solver.gmres.restart,
        )
        sweep = jax.jit(self._sweep_fn(kcfg))
        ks = 2.0 * np.pi * freqs / SPEED_OF_SOUND
        weights = self.source_weights(freqs)

        n = self.mesh.num_nodes
        if self.batch_override:
            batch = self.batch_override
        else:
            kwargs = {}
            if self.memory_gb:
                kwargs["budget_bytes"] = int(self.memory_gb * 2**30)
            batch = hbm_frequency_batch(
                num_dofs=n,
                nnz=self.assembler.csr.nnz,
                restart=kcfg.restart,
                levels=3 if self.mg is not None else 1,
                **kwargs,
            )
        if self.verbose:
            print(
                f"mesh: {self.mesh.num_elements} tets, {n} nodes; "
                f"{len(freqs)} frequencies in batches of {batch}",
                file=sys.stderr,
            )

        all_p = np.zeros((len(freqs), len(self.sim.listening_positions)), complex)
        iters = np.zeros(len(freqs), int)
        conv = np.zeros(len(freqs), bool)
        times = np.zeros(len(freqs))

        cd = self.assembler.cdtype
        for start in range(0, len(freqs), batch):
            sl = slice(start, min(start + batch, len(freqs)))
            nb = sl.stop - sl.start
            pad = batch - nb
            kb = np.pad(ks[sl], (0, pad), mode="edge")
            wb = np.pad(weights[sl], ((0, pad), (0, 0)), mode="edge")
            x0 = jnp.zeros((batch, n), cd)
            t0 = time.perf_counter()
            x, its, cv = sweep(jnp.asarray(kb), jnp.asarray(wb), x0)
            x.block_until_ready()
            dt = (time.perf_counter() - t0) / nb
            p = np.asarray(x)[:, np.asarray(self.listen_idx)]
            all_p[sl] = p[:nb]
            iters[sl] = np.asarray(its)[:nb]
            conv[sl] = np.asarray(cv)[:nb]
            times[sl] = dt
            if self.verbose:
                print(
                    f"  f[{sl.start}:{sl.stop}] iters={np.asarray(its)[:nb].tolist()} "
                    f"({dt*1e3:.0f} ms/freq)",
                    file=sys.stderr,
                )

        spl = np.asarray(pressure_to_spl(np.abs(all_p)))
        results = create_output_json(
            cfg,
            freqs,
            spl,
            extra_metadata={
                "engine": "fem",
                "num_nodes": int(n),
                "num_elements": int(self.mesh.num_elements),
                "converged": conv.tolist(),
                "iterations": iters.tolist(),
                "avg_solve_time_s": float(times.mean()),
            },
        )
        for i, r in enumerate(results.results):
            r.converged = bool(conv[i])
            r.iterations = int(iters[i])
            r.solve_time_s = float(times[i])
            r.pressure_real = all_p[i].real.tolist()
            r.pressure_imag = all_p[i].imag.tolist()
        self._maybe_add_slices(results, freqs, ks, weights)
        return results

    def _maybe_add_slices(self, results, freqs, ks, weights):
        """Spatial SPL slices at listening height for selected frequencies
        (output.rs:159 generate_spatial_slices; visualization config)."""
        viz = self.config.visualization
        if not viz.generate_slices:
            return
        idxs = viz.slice_frequency_indices or [len(freqs) // 2]
        z = float(np.mean([p.to_array()[2] for p in self.sim.listening_positions]) or 1.2)
        w, d, h = self.sim.geometry.dimensions()
        kcfg = KrylovConfig(
            max_iterations=self.config.solver.gmres.max_iter * 10,
            tolerance=self.config.solver.gmres.tolerance,
            restart=self.restart_override or self.config.solver.gmres.restart,
        )
        sweep = jax.jit(self._sweep_fn(kcfg))
        cd = self.assembler.cdtype
        from mathaudio_tpu.common.output import generate_spatial_slices

        for fi in idxs:
            if fi >= len(freqs):
                continue
            x, _, _ = sweep(
                jnp.asarray([ks[fi]]), jnp.asarray(weights[fi: fi + 1]),
                jnp.zeros((1, self.mesh.num_nodes), cd),
            )
            u = np.asarray(x[0])

            def pressure_at(pts, u=u):
                d2 = ((self.mesh.nodes[None] - pts[:, None]) ** 2).sum(-1)
                return u[np.argmin(d2, axis=1)]

            sl = generate_spatial_slices(pressure_at, (w, d, h), z,
                                         resolution=viz.slice_resolution)
            sl["frequency"] = float(freqs[fi])
            results.slices.append(sl)


def run_fem_simulation(config: RoomConfig, verbose: int = 1, use_multigrid: bool = True,
                       hierarchical: bool = False, anchor_stride: int = 4,
                       source_width: float = 0.1, restart: Optional[int] = None,
                       batch_size: int = 0, memory_gb: float = 0.0):
    return FemRoomSimulation(
        config, use_multigrid=use_multigrid, verbose=verbose,
        source_width=source_width, restart=restart,
        batch_size=batch_size, memory_gb=memory_gb,
    ).run(hierarchical=hierarchical, anchor_stride=anchor_stride)


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="roomsim-fem", description="FEM Helmholtz room simulator (TPU-native)"
    )
    ap.add_argument("config", help="RoomConfig JSON file")
    ap.add_argument("-o", "--output", default="room_fem_results.json")
    ap.add_argument("-v", "--verbose", type=int, default=1)
    ap.add_argument("--cpu", action="store_true", help="run on CPU (f64)")
    ap.add_argument("--no-multigrid", action="store_true")
    ap.add_argument("--hierarchical", action="store_true",
                    help="anchor + warm-start sweep (room_simulator_fem.rs:1640)")
    ap.add_argument("--mesh-resolution", type=int, default=None, help="elements per meter")
    ap.add_argument("--elements-per-wavelength", type=float, default=None,
                    help="set mesh resolution from the max frequency "
                         "(room_simulator_fem.rs adaptive-mesh rule, 6-10 typical)")
    ap.add_argument("--source-width", type=float, default=0.1,
                    help="Gaussian source sigma in meters (:42)")
    ap.add_argument("--restart", type=int, default=None, help="Krylov subspace size override")
    ap.add_argument("--batch-size", type=int, default=0,
                    help="frequency batch size (0 = HBM-budget automatic)")
    ap.add_argument("--memory-gb", type=float, default=0.0,
                    help="HBM budget in GB for automatic batch sizing")
    ap.add_argument("--anchor-stride", type=int, default=4,
                    help="hierarchical warm-start anchor stride (:1640)")
    args = ap.parse_args(argv)

    from mathaudio_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    config = RoomConfig.from_file(args.config)
    if args.mesh_resolution:
        config.solver.mesh_resolution = args.mesh_resolution
    if args.elements_per_wavelength:
        f_max = float(max(config.to_simulation().frequencies))
        res = int(np.ceil(args.elements_per_wavelength * f_max / SPEED_OF_SOUND))
        config.solver.mesh_resolution = max(res, 1)
        if args.verbose:
            print(
                f"adaptive mesh: {args.elements_per_wavelength} elem/wavelength "
                f"at {f_max:.0f} Hz -> {config.solver.mesh_resolution} elem/m",
                file=sys.stderr,
            )
    results = run_fem_simulation(
        config, verbose=args.verbose, use_multigrid=not args.no_multigrid,
        hierarchical=args.hierarchical, anchor_stride=args.anchor_stride,
        source_width=args.source_width, restart=args.restart,
        batch_size=args.batch_size, memory_gb=args.memory_gb,
    )
    results.save(args.output)
    if args.verbose:
        print(f"wrote {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
