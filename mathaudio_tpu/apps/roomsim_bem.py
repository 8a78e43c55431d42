"""BEM room simulator CLI (math-bem/bin/room_simulator_bem.rs:26-65):
RoomConfig JSON -> surface mesh -> interior BEM solve per frequency ->
SPL at listening positions -> SimulationResults JSON.

Solver dispatch mirrors the reference's direct / gmres / fmm choices
(:226-559); dense LU below the reference's N<1000 threshold, GMRES+
Jacobi above (FMM lands with the fmm module).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from mathaudio_tpu.bem.room_acoustics import solve_room_bem
from mathaudio_tpu.common.config import RoomConfig
from mathaudio_tpu.common.output import create_output_json
from mathaudio_tpu.utils.profiling import span
from mathaudio_tpu.xtypes import pressure_to_spl


def run_bem_simulation(config: RoomConfig, verbose: int = 1, solver: str = "auto"):
    sim = config.to_simulation()
    with span("surface mesh", verbose):
        room_mesh = sim.geometry.generate_mesh(config.solver.mesh_resolution)
        mesh = room_mesh.to_surface_mesh()
    if verbose:
        print(f"surface mesh: {mesh.num_elements} elements", file=sys.stderr)

    # average wall admittance from the boundary specs (per-element
    # admittance is supported by solve_room_bem; the config maps walls
    # by position, kept scalar-average here like the reference roomsim)
    specs = list(config.boundaries.wall_specs().values())
    betas = []
    for s in specs:
        if s.kind == "absorption":
            a = min(max(s.coefficient, 0.0), 0.9999)
            root = np.sqrt(1 - a)
            betas.append((1 - root) / (1 + root))
        elif s.kind == "impedance" and s.impedance != 0:
            betas.append((1.0 / s.impedance).real)
        else:
            betas.append(0.0)
    beta = float(np.mean(betas))

    # --solver override (room_simulator_bem.rs:26 Args.solver), else the
    # reference solver-selection table (qa_suite.rs:9-14): direct for
    # small, GMRES for medium, FMM-accelerated GMRES for large meshes.
    # gmres-ilu maps to GMRES+Jacobi on the dense tier (triangular ILU
    # solves are serial; Jacobi is the TPU-native dense preconditioner);
    # fmm / fmm-ilu / fmm-batched all route through the batched-GEMM
    # SLFMM operator with the near-field ILU preconditioner, which is
    # simultaneously the reference's "ilu" and "batched" variant.
    n = mesh.num_elements
    if solver != "auto":
        t = solver.replace("_", "-")
        if t in ("direct", "lu"):
            method = "lu"
        elif t in ("gmres", "gmres-ilu", "gmres-jacobi"):
            method = "gmres"
        elif t in ("fmm", "fmm-ilu", "fmm-batched"):
            method = "fmm"
        else:
            raise SystemExit(f"unknown solver {solver!r}")
    elif config.solver.method == "direct" or n < 1000:
        method = "lu"
    elif "fmm" in config.solver.method or n >= 4000:
        method = "fmm"
    else:
        method = "gmres"
    lp = np.asarray([p.to_array() for p in sim.listening_positions])

    all_p = np.zeros((len(sim.frequencies), len(lp)), complex)
    conv = []
    times = []
    # On an accelerator default backend whose transport cannot ship
    # complex arrays (the tunneled dev-TPU case) the FMM tier solves ON
    # THE CHIP via re/im planes (_solve_room_fmm; VERDICT r4 #5 —
    # bin/room_simulator_bem.rs:418 run_fmm_gmres_ilu analog), while the
    # dense tiers and the complex-valued field evaluation run on the
    # in-process CPU backend (complex never crosses the tunnel).
    on_accel = jax.devices()[0].platform != "cpu"
    cpu_dev = jax.devices("cpu")[0]
    from contextlib import nullcontext

    host = (lambda: jax.default_device(cpu_dev)) if on_accel else nullcontext
    for fi, f in enumerate(sim.frequencies):
        t0 = time.perf_counter()
        if method == "fmm":
            sol = _solve_room_fmm(mesh, float(f), sim.sources, beta)
        else:
            with host():
                sol = solve_room_bem(mesh, float(f), sim.sources, admittance=beta, method=method)
        with host():
            p = np.asarray(sol.evaluate_pressure(jnp.asarray(lp)))
        all_p[fi] = p
        conv.append(bool(sol.info.get("converged", True)))
        times.append(time.perf_counter() - t0)
        if verbose:
            print(
                f"  f={f:7.1f} Hz |p|={np.abs(p).round(5).tolist()} "
                f"({times[-1]:.2f}s)",
                file=sys.stderr,
            )

    spl = np.asarray(pressure_to_spl(np.abs(all_p)))
    results = create_output_json(
        config,
        sim.frequencies,
        spl,
        extra_metadata={
            "engine": "bem",
            "num_elements": int(mesh.num_elements),
            "wall_admittance": beta,
            "converged": conv,
            "avg_solve_time_s": float(np.mean(times)),
        },
    )
    for i, r in enumerate(results.results):
        r.converged = conv[i]
        r.solve_time_s = times[i]
        r.pressure_real = all_p[i].real.tolist()
        r.pressure_imag = all_p[i].imag.tolist()
    return results


def _solve_room_fmm(mesh, frequency, sources, beta, speed_of_sound=343.0):
    """FMM-accelerated interior solve (room_acoustics/solver.rs:975
    solve_bem_fmm_gmres_ilu): matrix-free GMRES through the SLFMM
    operator with the near-field ILU(0) preconditioner.

    On a non-CPU default backend the solve runs ON THE CHIP through
    fmm_chip re/im planes (the bench's proven path — VERDICT r4 #5):
    f64 host build with the f32 stability screen (tau=1e4), sel_form
    lowering, one jitted planes-GMRES on the device, element-order
    complex solution rebuilt host-side."""
    import numpy as np

    from mathaudio_tpu.bem.fmm import (
        build_room_fmm_system,
        near_ilu_preconditioner,
        sel_form,
    )
    from mathaudio_tpu.bem.room_acoustics import RoomBemSolution, _source_pressure
    from mathaudio_tpu.solvers import KrylovConfig, gmres
    from mathaudio_tpu.xtypes import default_float

    k = 2.0 * np.pi * frequency / speed_of_sound
    config = KrylovConfig(max_iterations=1000, tolerance=1e-7, restart=50)
    on_accel = jax.devices()[0].platform != "cpu"

    if not on_accel:
        dtype = default_float()
        op = build_room_fmm_system(mesh, k, admittance=beta)
        rhs = _source_pressure(jnp.asarray(mesh.centers, dtype), sources, k,
                               frequency, dtype)
        # ILU(0) of the sparse near-field matrix (solver.rs:975
        # solve_bem_fmm_gmres_ilu's nearfield preconditioner)
        pre = near_ilu_preconditioner(op)
        sol = gmres(op.matvec, rhs, config=config, preconditioner=pre)
        x, converged, iterations = sol.x, bool(sol.converged), int(sol.iterations)
        beta_vec = jnp.broadcast_to(jnp.asarray(beta, dtype), (mesh.num_elements,))
        return RoomBemSolution(
            mesh, k, frequency, x, beta_vec, sources,
            {"method": "fmm", "converged": converged,
             "iterations": iterations, "n": mesh.num_elements},
        )

    from mathaudio_tpu.bem.fmm_chip import fmm_chip_solve_fn, split_planes

    cpu = jax.devices("cpu")[0]
    x64_was = bool(jax.config.jax_enable_x64)
    jax.config.update("jax_enable_x64", True)  # f64 host build
    try:
        with jax.default_device(cpu):
            # tau=1e4: the chip executes the operator in f32/c64, which
            # needs the tighter stability screen (bem/fmm_chip.py)
            op = build_room_fmm_system(mesh, k, admittance=beta,
                                       stability_tau=1e4)
            pre = near_ilu_preconditioner(op)
            op = sel_form(op)
            rhs = np.asarray(_source_pressure(
                jnp.asarray(mesh.centers, np.float64), sources, k, frequency,
                np.float64,
            ))
    finally:
        jax.config.update("jax_enable_x64", x64_was)

    planes = jax.device_put(split_planes(op))
    pre_planes = jax.device_put(split_planes(pre))
    solve = jax.jit(fmm_chip_solve_fn(config))
    xr, xi, it, conv = solve(
        planes, pre_planes,
        jnp.asarray(rhs.real.astype(np.float32)),
        jnp.asarray(rhs.imag.astype(np.float32)),
    )
    x_np = np.asarray(xr) + 1j * np.asarray(xi)
    with jax.default_device(cpu):
        x = jnp.asarray(x_np)
        beta_vec = jnp.broadcast_to(jnp.asarray(beta, np.float32),
                                    (mesh.num_elements,))
    return RoomBemSolution(
        mesh, k, frequency, x, beta_vec, sources,
        {"method": "fmm", "device": str(jax.devices()[0]),
         "converged": bool(conv), "iterations": int(it),
         "n": mesh.num_elements},
    )


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="roomsim", description="BEM room simulator (TPU-native)"
    )
    ap.add_argument("config")
    ap.add_argument("-o", "--output", default="room_bem_results.json")
    ap.add_argument("-v", "--verbose", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--solver", default="auto",
                    choices=["auto", "direct", "gmres", "gmres-ilu", "fmm",
                             "fmm-ilu", "fmm-batched"],
                    help="override the size-based solver table "
                         "(room_simulator_bem.rs dispatch)")
    ap.add_argument("--mesh-resolution", type=int, default=None,
                    help="surface elements per meter")
    args = ap.parse_args(argv)
    from mathaudio_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    config = RoomConfig.from_file(args.config)
    if args.mesh_resolution:
        config.solver.mesh_resolution = args.mesh_resolution
    results = run_bem_simulation(config, verbose=args.verbose, solver=args.solver)
    results.save(args.output)
    if args.verbose:
        print(f"wrote {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
