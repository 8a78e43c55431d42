"""BEM QA suite (math-bem/bin/qa_suite.rs): rigid-sphere scattering
across Rayleigh/Mie/geometric regimes with size-based solver selection
(LU N<1000, GMRES above — :9-14), plus the interior pulsating-cavity
check, each emitting a ValidationResult JSON."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from mathaudio_tpu.bem import (
    BemProblem,
    BemSolver,
    BemSolverConfig,
    SolverMethod,
)
from mathaudio_tpu.bem.types import BemMethod, PhysicsParams
from mathaudio_tpu.bem.mesh import icosphere
from mathaudio_tpu.bem.room_acoustics import solve_room_bem
from mathaudio_tpu.bem.testing import ExecutionMetadata, ValidationResult
from mathaudio_tpu.common.source import Source
from mathaudio_tpu.common.types import Point3D
from mathaudio_tpu.wave.analytical import sphere_scattering_3d


def select_solver(n: int) -> SolverMethod:
    """Size-based selection table (qa_suite.rs:9-14 / README:96-101)."""
    return SolverMethod.LU if n < 1000 else SolverMethod.GMRES


# Explicit solver x assembly points of the QA matrix (VERDICT r4 #6):
# the reference's size table picks one per mesh; the matrix pins each
# solver tier to every wavenumber regime so regressions localize.
_SOLVER_MATRIX = {
    "lu": (SolverMethod.LU, BemMethod.TBEM),
    "gmres": (SolverMethod.GMRES, BemMethod.TBEM),
    "slfmm": (SolverMethod.GMRES, BemMethod.SLFMM),
    "mlfmm": (SolverMethod.GMRES, BemMethod.MLFMM),
}


def sphere_case(ka: float, subdivisions: int, out_dir: str, verbose: int = 1,
                solver: str = "auto"):
    prob = BemProblem.rigid_sphere(ka, subdivisions=subdivisions)
    n = prob.mesh.num_elements
    if solver == "auto":
        method, assembly = select_solver(n), BemMethod.TBEM
    else:
        method, assembly = _SOLVER_MATRIX[solver]
    cfg = BemSolverConfig(method=method, assembly=assembly, burton_miller=True)
    t0 = time.perf_counter()
    sol = BemSolver(cfg).solve(prob)
    wall = time.perf_counter() - t0

    c = prob.mesh.centers
    theta = np.arccos(np.clip(c[:, 2] / np.linalg.norm(c, axis=1), -1, 1))
    exact = np.asarray(sphere_scattering_3d(ka, 1.0, 40, [1.0], theta).pressure)
    tag = "" if solver == "auto" else f"_{solver}"
    vr = ValidationResult.create(
        name=f"sphere_scattering_ka{ka:g}{tag}",
        positions=c,
        computed_pressure=np.asarray(sol.surface_pressure),
        analytical_pressure=exact,
        parameters={"ka": ka, "subdivisions": subdivisions, "n_elements": n,
                    "solver": solver},
        metadata=ExecutionMetadata(
            backend=jax.default_backend(),
            wall_time_s=wall,
            solver=f"{method.value}+{assembly.value}" if solver != "auto"
                   else cfg.method.value,
            num_dofs=n,
        ),
    )
    vr.save_json(os.path.join(out_dir, f"sphere_ka{ka:g}{tag}.json"))
    if verbose:
        vr.print_summary()
    return vr


def mixed_pulsating_case(ka: float, subdivisions: int, out_dir: str,
                         verbose: int = 1):
    """Mixed velocity/pressure BC pulsating sphere: uniform radial
    velocity prescribed on the upper hemisphere, the ANALYTIC surface
    pressure prescribed on the lower one. The exact solution is the same
    monopole field, so the solved pressure (velocity elements) and the
    solved dp/dn (pressure elements) must both match the closed form —
    an end-to-end gate on the BC-dependent column assembly
    (tbem.rs:234-340) that the reference QA never exercises."""
    from mathaudio_tpu.bem.types import BoundaryCondition
    from mathaudio_tpu.wave.analytical.solutions_3d import pulsating_sphere_3d

    mesh = icosphere(1.0, subdivisions)
    n = mesh.num_elements
    k = ka
    exact = np.asarray(pulsating_sphere_3d(ka, 1.0, mesh.centers).pressure)
    upper = mesh.centers[:, 2] >= 0.0
    types = np.where(upper, 0, 1).astype(np.int32)
    rho_c_omega = 1.204 * k * 343.0  # i omega rho v with v = 1
    values = np.where(upper, 1.0 + 0.0j, exact)
    prob = BemProblem(
        mesh=mesh,
        physics=PhysicsParams.from_wave_number(k),
        incident=None,
        bc=BoundaryCondition(types=types, values=values),
    )
    cfg = BemSolverConfig(method=SolverMethod.LU, burton_miller=True)
    t0 = time.perf_counter()
    sol = BemSolver(cfg).solve(prob)
    wall = time.perf_counter() - t0
    vr = ValidationResult.create(
        name=f"mixed_pulsating_sphere_ka{ka:g}",
        positions=mesh.centers,
        computed_pressure=np.asarray(sol.surface_pressure),
        analytical_pressure=exact,
        parameters={"ka": ka, "subdivisions": subdivisions, "n_elements": n,
                    "n_velocity": int(upper.sum()),
                    "n_pressure": int((~upper).sum())},
        metadata=ExecutionMetadata(
            backend=jax.default_backend(), wall_time_s=wall,
            solver="lu+mixed", num_dofs=n,
        ),
    )
    vr.save_json(os.path.join(out_dir, f"mixed_pulsating_ka{ka:g}.json"))
    if verbose:
        vr.print_summary()
    return vr


def cavity_case(ka: float, subdivisions: int, out_dir: str, verbose: int = 1):
    """Interior rigid cavity with central monopole vs closed form."""
    a = 1.0
    k = ka / a
    f = k * 343.0 / (2 * np.pi)
    mesh = icosphere(a, subdivisions)
    src = Source.omnidirectional(Point3D(0.0, 0.0, 0.0), 1.0)
    t0 = time.perf_counter()
    sol = solve_room_bem(mesh, f, [src], admittance=0.0, method="lu")
    wall = time.perf_counter() - t0
    gp = (1j * k - 1 / a) * np.exp(1j * k * a) / (4 * np.pi * a)
    j0p = (ka * np.cos(ka) - np.sin(ka)) / ka**2
    amp = -gp / (k * j0p)
    exact = np.full(
        mesh.num_elements, np.exp(1j * k * a) / (4 * np.pi * a) + amp * np.sin(ka) / ka
    )
    vr = ValidationResult.create(
        name=f"cavity_monopole_ka{ka:g}",
        positions=mesh.centers,
        computed_pressure=np.asarray(sol.surface_pressure),
        analytical_pressure=exact,
        parameters={"ka": ka, "subdivisions": subdivisions},
        metadata=ExecutionMetadata(
            backend=jax.default_backend(), wall_time_s=wall, solver="lu",
            num_dofs=mesh.num_elements,
        ),
    )
    vr.save_json(os.path.join(out_dir, f"cavity_ka{ka:g}.json"))
    if verbose:
        vr.print_summary()
    return vr


def pulsating_case(ka: float, subdivisions: int, out_dir: str, verbose: int = 1):
    """Radiating pulsating sphere, v0 = 1 m/s, vs the analytic monopole
    surface pressure (qa_suite.rs:328 run_pulsating_sphere_test)."""
    from mathaudio_tpu.wave.analytical.solutions_3d import pulsating_sphere_3d

    prob = BemProblem.radiating_sphere(ka, subdivisions=subdivisions)
    n = prob.mesh.num_elements
    cfg = BemSolverConfig(method=select_solver(n), burton_miller=True)
    t0 = time.perf_counter()
    sol = BemSolver(cfg).solve(prob)
    wall = time.perf_counter() - t0
    exact = np.asarray(pulsating_sphere_3d(ka, 1.0, prob.mesh.centers).pressure)
    vr = ValidationResult.create(
        name=f"pulsating_sphere_ka{ka:g}",
        positions=prob.mesh.centers,
        computed_pressure=np.asarray(sol.surface_pressure),
        analytical_pressure=exact,
        parameters={"ka": ka, "subdivisions": subdivisions, "n_elements": n},
        metadata=ExecutionMetadata(
            backend=jax.default_backend(),
            wall_time_s=wall,
            solver=cfg.method.value,
            num_dofs=n,
        ),
    )
    vr.save_json(os.path.join(out_dir, f"pulsating_ka{ka:g}.json"))
    if verbose:
        vr.print_summary()
    return vr


def main(argv=None):
    ap = argparse.ArgumentParser(prog="qa-suite-bem")
    ap.add_argument("-o", "--out-dir", default="qa_bem_results")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--fast", action="store_true", help="coarse meshes only")
    args = ap.parse_args(argv)
    from mathaudio_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    os.makedirs(args.out_dir, exist_ok=True)

    results = []
    cases = [(0.1, 2), (0.5, 2), (1.0, 2), (2.0, 3), (np.pi, 3), (5.0, 3)]
    if args.fast:
        cases = [(0.5, 2), (1.0, 2), (2.0, 2)]
    for ka, sub in cases:
        results.append(sphere_case(ka, sub, args.out_dir))
    if not args.fast:
        # solver x regime matrix: every solver tier at a Rayleigh, Mie,
        # and geometric wavenumber (VERDICT r4 #6; qa_suite.rs:9-14 is
        # the size-table origin, exercised here explicitly)
        for solver in ["lu", "gmres", "slfmm", "mlfmm"]:
            for ka, sub in [(0.5, 2), (2.0, 3), (5.0, 3)]:
                results.append(sphere_case(ka, sub, args.out_dir, solver=solver))
    for ka in [1.0, 2.0]:
        results.append(cavity_case(ka, 3 if not args.fast else 2, args.out_dir))
    for ka in [0.5, 1.0] if args.fast else [0.5, 1.0, 2.0, np.pi]:
        results.append(pulsating_case(ka, 2, args.out_dir))
    results.append(mixed_pulsating_case(1.0, 3 if not args.fast else 2,
                                        args.out_dir))

    passed = [r.passed(args.threshold) for r in results]
    summary = {
        "total": len(results),
        "passed": int(sum(passed)),
        "threshold": args.threshold,
        "cases": [
            {"name": r.name, "rel_l2": r.metrics.l2_relative, "passed": bool(p)}
            for r, p in zip(results, passed)
        ],
    }
    with open(os.path.join(args.out_dir, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary["cases"], indent=1))
    return 0 if all(passed) else 1


if __name__ == "__main__":
    sys.exit(main())
