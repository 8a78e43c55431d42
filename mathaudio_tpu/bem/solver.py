"""High-level BEM API (math-bem/src/core/bem_solver.rs:50-533):
BemProblem (geometry + physics + excitation), BemSolver (method matrix),
BemSolution (surface pressure + field evaluation)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax.numpy as jnp

from mathaudio_tpu.bem.assembly import assemble_burton_miller, assemble_collocation_matrix
from mathaudio_tpu.bem.incident import IncidentField, plane_wave
from mathaudio_tpu.bem.mesh import SurfaceMesh, icosphere
from mathaudio_tpu.bem.postprocess import FieldResult, evaluate_field
from mathaudio_tpu.bem.types import BemMethod, BemSolverConfig, PhysicsParams, SolverMethod
from mathaudio_tpu.solvers import KrylovConfig, bicgstab, cgs, gmres, jacobi_preconditioner, lu_solve, qmrcgstab


@dataclasses.dataclass
class BemProblem:
    """Scattering problem: rigid body + incident field (bem_solver.rs:86)."""

    mesh: SurfaceMesh
    physics: PhysicsParams
    incident: IncidentField

    @classmethod
    def rigid_sphere(
        cls,
        ka: float,
        radius: float = 1.0,
        subdivisions: Optional[int] = None,
        incident: Optional[IncidentField] = None,
    ) -> "BemProblem":
        """Factory matching bem_solver.rs:107 (ka-based subdivision)."""
        if subdivisions is None:
            subdivisions = 2 if ka < 2.0 else 3
        k = ka / radius
        return cls(
            mesh=icosphere(radius, subdivisions),
            physics=PhysicsParams.from_wave_number(k),
            incident=incident or plane_wave((0.0, 0.0, 1.0)),
        )


@dataclasses.dataclass
class BemSolution:
    """Surface pressure + evaluation (bem_solver.rs:500 BemSolution)."""

    problem: BemProblem
    surface_pressure: jnp.ndarray  # (N,) at element centers
    info: dict

    def evaluate_pressure(self, points, quad_order: int = 3, method: str = "dense") -> jnp.ndarray:
        return self.evaluate_pressure_field(points, quad_order, method).p_total

    def evaluate_pressure_field(
        self, points, quad_order: int = 3, method: str = "dense"
    ) -> FieldResult:
        """method='fmm' uses the O((N+M) log) clustered evaluation
        (postprocess.evaluate_field_fmm) — same result, for large grids."""
        if method == "fmm":
            from mathaudio_tpu.bem.postprocess import evaluate_field_fmm

            return evaluate_field_fmm(
                self.problem.mesh,
                self.surface_pressure,
                points,
                self.problem.physics.wave_number,
                self.problem.incident,
                quad_order=quad_order,
            )
        return evaluate_field(
            self.problem.mesh,
            self.surface_pressure,
            points,
            self.problem.physics.wave_number,
            self.problem.incident,
            quad_order=quad_order,
        )


class BemSolver:
    """Assembly x solver dispatch (bem_solver.rs:202 BemSolver)."""

    def __init__(self, config: Optional[BemSolverConfig] = None):
        self.config = config or BemSolverConfig()

    def solve(self, problem: BemProblem) -> BemSolution:
        cfg = self.config
        mesh = problem.mesh
        k = problem.physics.wave_number
        centers = jnp.asarray(mesh.centers)
        normals = jnp.asarray(mesh.normals)

        if cfg.assembly in (BemMethod.SLFMM, BemMethod.MLFMM):
            return self._solve_fmm(problem)

        if cfg.burton_miller:
            ka = k * float(np.linalg.norm(mesh.centers, axis=1).mean())
            scale = cfg.beta_scale or problem.physics.optimal_beta_scale(ka)
            beta = problem.physics.burton_miller_beta_optimal(
                mesh.avg_element_size()
            ) * scale
            a = assemble_burton_miller(mesh, k, beta, quad_order=cfg.quad_order)
            rhs = problem.incident.pressure(centers, k) - jnp.asarray(
                beta, a.dtype
            ) * problem.incident.normal_derivative(centers, normals, k)
        else:
            a = assemble_collocation_matrix(mesh, k, quad_order=cfg.quad_order)
            rhs = problem.incident.pressure(centers, k)

        info = {"method": cfg.method.value, "burton_miller": cfg.burton_miller,
                "n": mesh.num_elements}
        if cfg.method == SolverMethod.LU:
            p = lu_solve(a, rhs)
            info["converged"] = True
        else:
            kcfg = KrylovConfig(
                max_iterations=cfg.max_iterations,
                tolerance=cfg.tolerance,
                restart=cfg.restart,
            )
            pre = jacobi_preconditioner(jnp.diagonal(a))
            if cfg.method == SolverMethod.BICGSTAB:
                sol = bicgstab(a, rhs, config=kcfg, preconditioner=pre)
            elif cfg.method == SolverMethod.CGS:
                sol = cgs(a, rhs, config=kcfg, preconditioner=pre)
            elif cfg.method == SolverMethod.QMRCGSTAB:
                sol = qmrcgstab(a, rhs, config=kcfg, preconditioner=pre)
            else:
                sol = gmres(a, rhs, config=kcfg, preconditioner=pre)
            p = sol.x
            info["converged"] = bool(sol.converged)
            info["iterations"] = int(sol.iterations)
        return BemSolution(problem, p, info)

    def _solve_fmm(self, problem: BemProblem) -> BemSolution:
        """Matrix-free FMM path (bem_solver.rs SLFMM/MLFMM assembly rows):
        CBIE with GMRES; Burton–Miller rides the SLFMM direction-space
        row factors. LU is impossible matrix-free, so it falls back to
        GMRES (recorded in info)."""
        from mathaudio_tpu.bem.fmm import build_mlfmm_tree_system, build_slfmm_system

        cfg = self.config
        mesh = problem.mesh
        k = problem.physics.wave_number
        centers = jnp.asarray(mesh.centers)
        normals = jnp.asarray(mesh.normals)

        rhs = problem.incident.pressure(centers, k)
        use_bm = cfg.burton_miller
        beta = 0.0
        if use_bm:
            ka = k * float(np.linalg.norm(mesh.centers, axis=1).mean())
            scale = cfg.beta_scale or problem.physics.optimal_beta_scale(ka)
            beta = problem.physics.burton_miller_beta_optimal(
                mesh.avg_element_size()
            ) * scale
            rhs = rhs - jnp.asarray(beta, rhs.dtype) * problem.incident.normal_derivative(
                centers, normals, k
            )
        if cfg.assembly == BemMethod.SLFMM:
            op = build_slfmm_system(mesh, k, beta=beta, max_per_leaf=64,
                                    separation_ratio=2.0)
        else:
            op = build_mlfmm_tree_system(mesh, k, beta=beta, max_per_leaf=16,
                                         separation_ratio=2.0)

        kcfg = KrylovConfig(
            max_iterations=cfg.max_iterations,
            tolerance=cfg.tolerance,
            restart=cfg.restart,
        )
        sol = gmres(op.matvec, rhs, config=kcfg)
        info = {
            "method": "gmres",  # matrix-free: LU falls back to GMRES
            "assembly": cfg.assembly.value,
            "burton_miller": use_bm,
            "n": mesh.num_elements,
            "converged": bool(sol.converged),
            "iterations": int(sol.iterations),
        }
        return BemSolution(problem, sol.x, info)
