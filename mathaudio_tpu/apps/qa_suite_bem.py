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
from mathaudio_tpu.bem.mesh import icosphere
from mathaudio_tpu.bem.room_acoustics import solve_room_bem
from mathaudio_tpu.bem.testing import ExecutionMetadata, ValidationResult
from mathaudio_tpu.common.source import Source
from mathaudio_tpu.common.types import Point3D
from mathaudio_tpu.wave.analytical import sphere_scattering_3d


def select_solver(n: int) -> SolverMethod:
    """Size-based selection table (qa_suite.rs:9-14 / README:96-101)."""
    return SolverMethod.LU if n < 1000 else SolverMethod.GMRES


def sphere_case(ka: float, subdivisions: int, out_dir: str, verbose: int = 1):
    prob = BemProblem.rigid_sphere(ka, subdivisions=subdivisions)
    n = prob.mesh.num_elements
    cfg = BemSolverConfig(method=select_solver(n), burton_miller=True)
    t0 = time.perf_counter()
    sol = BemSolver(cfg).solve(prob)
    wall = time.perf_counter() - t0

    c = prob.mesh.centers
    theta = np.arccos(np.clip(c[:, 2] / np.linalg.norm(c, axis=1), -1, 1))
    exact = np.asarray(sphere_scattering_3d(ka, 1.0, 40, [1.0], theta).pressure)
    vr = ValidationResult.create(
        name=f"sphere_scattering_ka{ka:g}",
        positions=c,
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
    vr.save_json(os.path.join(out_dir, f"sphere_ka{ka:g}.json"))
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
    for ka in [1.0, 2.0]:
        results.append(cavity_case(ka, 3 if not args.fast else 2, args.out_dir))
    for ka in [0.5, 1.0] if args.fast else [0.5, 1.0, 2.0, np.pi]:
        results.append(pulsating_case(ka, 2, args.out_dir))

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
