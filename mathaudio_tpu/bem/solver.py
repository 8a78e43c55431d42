"""High-level BEM API (math-bem/src/core/bem_solver.rs:50-533):
BemProblem (geometry + physics + excitation), BemSolver (method matrix),
BemSolution (surface pressure + field evaluation)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from mathaudio_tpu.bem.assembly import (
    assemble_burton_miller,
    assemble_collocation_matrix,
    assemble_mixed_system,
)
from mathaudio_tpu.bem.incident import IncidentField, plane_wave
from mathaudio_tpu.bem.mesh import SurfaceMesh, icosphere
from mathaudio_tpu.bem.postprocess import FieldResult, evaluate_field
from mathaudio_tpu.bem.types import (
    BCType,
    BemMethod,
    BemSolverConfig,
    BoundaryCondition,
    PhysicsParams,
    SolverMethod,
)
from mathaudio_tpu.solvers import KrylovConfig, bicgstab, cgs, gmres, jacobi_preconditioner, lu_solve, qmrcgstab


@dataclasses.dataclass
class BemProblem:
    """Scattering/radiation problem (bem_solver.rs:86): a surface with
    per-element boundary conditions plus an optional incident field.
    ``bc=None`` means rigid (zero normal velocity everywhere);
    ``incident=None`` means pure radiation (BC excitation only)."""

    mesh: SurfaceMesh
    physics: PhysicsParams
    incident: Optional[IncidentField] = None
    bc: Optional[BoundaryCondition] = None

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

    @classmethod
    def radiating_sphere(
        cls,
        ka: float,
        radius: float = 1.0,
        velocity: complex = 1.0,
        subdivisions: Optional[int] = None,
    ) -> "BemProblem":
        """Pulsating sphere: uniform radial velocity, no incident field
        (qa_suite.rs:328 run_pulsating_sphere_test setup)."""
        if subdivisions is None:
            subdivisions = 2 if ka < 2.0 else 3
        mesh = icosphere(radius, subdivisions)
        return cls(
            mesh=mesh,
            physics=PhysicsParams.from_wave_number(ka / radius),
            incident=None,
            bc=BoundaryCondition.velocity(velocity, mesh.num_elements),
        )


@dataclasses.dataclass
class BemSolution:
    """Surface pressure + evaluation (bem_solver.rs:500 BemSolution).
    ``surface_q`` (dp/dn at element centers) is set for non-rigid
    problems and feeds the single-layer term of the field evaluation."""

    problem: BemProblem
    surface_pressure: jnp.ndarray  # (N,) at element centers
    info: dict
    surface_q: Optional[jnp.ndarray] = None

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
                q_surf=self.surface_q,
            )
        return evaluate_field(
            self.problem.mesh,
            self.surface_pressure,
            points,
            self.problem.physics.wave_number,
            self.problem.incident,
            quad_order=quad_order,
            q_surf=self.surface_q,
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

        if problem.bc is not None:
            if cfg.assembly in (BemMethod.SLFMM, BemMethod.MLFMM):
                return self._solve_mixed_fmm(problem)
            return self._solve_mixed(problem)

        if cfg.assembly in (BemMethod.SLFMM, BemMethod.MLFMM):
            return self._solve_fmm(problem)

        if cfg.burton_miller:
            ka = k * mesh.ka_radius()
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
        if cfg.device_mesh is not None and cfg.method != SolverMethod.LU:
            # Row-block-sharded dense Krylov over a device mesh
            # (parallel/spmd.py; SURVEY §5). Jacobi-preconditioned GMRES
            # with per-device matrix blocks and psum-reduced projections.
            from mathaudio_tpu.parallel.spmd import (
                shard_dense_rows,
                sharded_dense_gmres_fn,
                unshard,
            )

            n_dev = cfg.device_mesh.shape["dof"]
            a_blocks, rhs_sh = shard_dense_rows(
                np.asarray(a), np.asarray(rhs), n_dev
            )
            kcfg = KrylovConfig(
                max_iterations=cfg.max_iterations,
                tolerance=cfg.tolerance,
                restart=cfg.restart,
            )
            sol = jax.jit(sharded_dense_gmres_fn(cfg.device_mesh, kcfg))(
                a_blocks, rhs_sh
            )
            p = unshard(sol.x, mesh.num_elements)
            info["converged"] = bool(sol.converged)
            info["iterations"] = int(sol.iterations)
            info["sharded_over"] = int(n_dev)
            return BemSolution(problem, p, info)
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

    def _solve_mixed(self, problem: BemProblem) -> BemSolution:
        """Dense solve with per-element velocity/pressure BCs
        (tbem.rs BC-dependent rows; see assembly.assemble_mixed_system).
        The solution vector mixes p (velocity elements) and dp/dn
        (pressure elements); both full fields are reconstructed."""
        cfg = self.config
        mesh = problem.mesh
        ph = problem.physics
        k = ph.wave_number
        beta = 0.0
        if cfg.burton_miller:
            # same beta selection as the rigid dense path (advisor r1:
            # the mixed path previously skipped the ka/config scale)
            ka = k * mesh.ka_radius()
            scale = cfg.beta_scale or ph.optimal_beta_scale(ka)
            beta = ph.burton_miller_beta_optimal(mesh.avg_element_size()) * scale
        a, b, unknown_p = assemble_mixed_system(
            mesh,
            k,
            problem.bc,
            beta=beta,
            incident=problem.incident,
            quad_order=cfg.quad_order,
            density=ph.density,
            speed_of_sound=ph.speed_of_sound,
        )
        info = {"method": cfg.method.value, "burton_miller": cfg.burton_miller,
                "mixed_bc": True, "n": mesh.num_elements}
        if cfg.method == SolverMethod.LU:
            u = lu_solve(a, b)
            info["converged"] = True
        else:
            kcfg = KrylovConfig(
                max_iterations=cfg.max_iterations,
                tolerance=cfg.tolerance,
                restart=cfg.restart,
            )
            pre = jacobi_preconditioner(jnp.diagonal(a))
            if cfg.method == SolverMethod.BICGSTAB:
                sol = bicgstab(a, b, config=kcfg, preconditioner=pre)
            elif cfg.method == SolverMethod.CGS:
                sol = cgs(a, b, config=kcfg, preconditioner=pre)
            elif cfg.method == SolverMethod.QMRCGSTAB:
                sol = qmrcgstab(a, b, config=kcfg, preconditioner=pre)
            else:
                sol = gmres(a, b, config=kcfg, preconditioner=pre)
            u = sol.x
            info["converged"] = bool(sol.converged)
            info["iterations"] = int(sol.iterations)

        bc_types = np.asarray(problem.bc.types)
        bc_values = np.asarray(problem.bc.values, complex)
        up = jnp.asarray(unknown_p)
        omega = k * ph.speed_of_sound
        q_known = jnp.asarray(
            np.where(bc_types == 0, 1j * omega * ph.density * bc_values, 0.0),
            u.dtype,
        )
        p_known = jnp.asarray(np.where(bc_types == 1, bc_values, 0.0), u.dtype)
        p_full = jnp.where(up, u, p_known)
        q_full = jnp.where(up, q_known, u)
        adm = getattr(problem.bc, "admittance", None)
        if adm is not None:
            # velocity-with-admittance: q = i omega rho v - i k adm * p
            adm_j = jnp.asarray(
                np.broadcast_to(np.asarray(adm, complex), bc_types.shape), u.dtype
            )
            q_full = jnp.where(up, q_known - 1j * k * adm_j * p_full, q_full)
        return BemSolution(problem, p_full, info, surface_q=q_full)

    def _solve_mixed_fmm(self, problem: BemProblem) -> BemSolution:
        """Matrix-free mixed-BC solve (fmm.build_slfmm_mixed_system):
        per-element velocity/pressure/admittance BCs at FMM scale — beyond
        the reference, whose SLFMM assumes a rigid surface (slfmm.rs:524).
        Only the SLFMM operator exists for mixed columns; an MLFMM config
        routes here too (recorded in info). LU is impossible matrix-free,
        so Krylov methods other than GMRES fall back to GMRES."""
        from mathaudio_tpu.bem.fmm import build_slfmm_mixed_system

        cfg = self.config
        mesh = problem.mesh
        ph = problem.physics
        k = ph.wave_number
        beta = 0.0
        if cfg.burton_miller:
            # same beta selection as the dense paths
            ka = k * mesh.ka_radius()
            scale = cfg.beta_scale or ph.optimal_beta_scale(ka)
            beta = ph.burton_miller_beta_optimal(mesh.avg_element_size()) * scale
        op, rhs, unknown_p = build_slfmm_mixed_system(
            mesh,
            k,
            problem.bc,
            beta=beta,
            incident=problem.incident,
            density=ph.density,
            speed_of_sound=ph.speed_of_sound,
            quad_order=cfg.quad_order,
        )
        kcfg = KrylovConfig(
            max_iterations=cfg.max_iterations,
            tolerance=cfg.tolerance,
            restart=cfg.restart,
        )
        sol = gmres(op.matvec, rhs, config=kcfg)
        info = {
            "method": "gmres",  # matrix-free: LU/BiCGStab configs fall back
            "assembly": BemMethod.SLFMM.value,
            "burton_miller": cfg.burton_miller,
            "mixed_bc": True,
            "n": mesh.num_elements,
            "converged": bool(sol.converged),
            "iterations": int(sol.iterations),
        }
        u = sol.x

        bc_types = np.asarray(problem.bc.types)
        bc_values = np.asarray(problem.bc.values, complex)
        up = jnp.asarray(unknown_p)
        omega = k * ph.speed_of_sound
        q_known = jnp.asarray(
            np.where(bc_types == 0, 1j * omega * ph.density * bc_values, 0.0),
            u.dtype,
        )
        p_known = jnp.asarray(np.where(bc_types == 1, bc_values, 0.0), u.dtype)
        p_full = jnp.where(up, u, p_known)
        q_full = jnp.where(up, q_known, u)
        adm = getattr(problem.bc, "admittance", None)
        if adm is not None:
            # velocity-with-admittance: q = i omega rho v - i k adm * p
            adm_j = jnp.asarray(
                np.broadcast_to(np.asarray(adm, complex), bc_types.shape), u.dtype
            )
            q_full = jnp.where(up, q_known - 1j * k * adm_j * p_full, q_full)
        return BemSolution(problem, p_full, info, surface_q=q_full)

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
