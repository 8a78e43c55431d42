"""High-level Helmholtz problem + solver dispatch.

Counterpart of math-fem/src/assembly/helmholtz.rs:115-149
(HelmholtzProblem) and src/solver/mod.rs:72-261 (SolverType dispatch).
Solver names mirror the reference's SolverType variants; triangular-solve
preconditioners are replaced by their TPU-shaped equivalents
(fixed-point ILU, batched Schwarz) per SURVEY.md §2.10.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from mathaudio_tpu.fem.assembly import HelmholtzAssembler, assemble_rhs
from mathaudio_tpu.fem.boundary import (
    DirichletBC,
    NeumannBC,
    RobinBC,
    dirichlet_mask_and_values,
    surface_load,
)
from mathaudio_tpu.fem.mesh import Mesh
from mathaudio_tpu.solvers import (
    KrylovConfig,
    bicgstab,
    cg,
    gmres,
    jacobi_preconditioner,
    lu_solve,
)
from mathaudio_tpu.xtypes import complex_dtype_for, default_float


class HelmholtzProblem:
    """Assembled Helmholtz system (K - k^2 M [+ Robin]) u = b with BCs."""

    def __init__(
        self,
        mesh: Mesh,
        wave_number: float,
        source_fn: Optional[Callable] = None,
        dirichlet: Sequence[DirichletBC] = (),
        neumann: Sequence[NeumannBC] = (),
        robin: Sequence[RobinBC] = (),
        dtype=None,
    ):
        self.mesh = mesh
        self.k = wave_number
        dtype = dtype or default_float()
        self.dtype = dtype
        self.cdtype = complex_dtype_for(dtype)

        robin_tags = [bc.tag for bc in robin]
        self.assembler = HelmholtzAssembler(mesh, robin_tags=robin_tags, dtype=dtype)
        self.robin_coeffs = {bc.tag: bc.alpha for bc in robin}

        rhs = jnp.zeros(mesh.num_nodes, self.cdtype)
        if source_fn is not None:
            rhs = rhs + assemble_rhs(mesh, source_fn, dtype=dtype).astype(self.cdtype)
        for bc in neumann:
            rhs = rhs + surface_load(mesh, bc.tag, bc.flux, cdtype=self.cdtype)
        for bc in robin:
            if bc.g is not None:
                rhs = rhs + surface_load(mesh, bc.tag, bc.g, cdtype=self.cdtype)
        self.rhs_raw = rhs

        if dirichlet:
            self.constrained, self.g = dirichlet_mask_and_values(mesh, dirichlet, self.cdtype)
        else:
            self.constrained = jnp.zeros(mesh.num_nodes, bool)
            self.g = jnp.zeros(mesh.num_nodes, self.cdtype)

        # Per-frequency pieces (jit/vmap-able over k via self.system(k)).
        self._vals_raw = self.assembler.system_values(self.k, self.robin_coeffs)
        self.rhs = self.assembler.dirichlet_rhs(
            self._vals_raw, self.rhs_raw, self.constrained, self.g
        )
        self.vals = self.assembler.apply_dirichlet_values(self._vals_raw, self.constrained)
        self.operator = self.assembler.operator_from_values(self.vals)

    def to_dense(self):
        """Dense system matrix (small problems / the Direct solver path)."""
        n = self.mesh.num_nodes
        a = jnp.zeros((n, n), self.vals.dtype)
        return a.at[self.assembler.row_of_slot, self.assembler.col_of_slot].add(self.vals)

    def diagonal(self):
        return self.assembler.diagonal_of(self.vals)


def solve_helmholtz(
    problem: HelmholtzProblem,
    solver: str = "gmres_jacobi",
    config: Optional[KrylovConfig] = None,
    x0=None,
):
    """Dispatch table mirroring SolverType (solver/mod.rs:72-107).

    Supported: direct, gmres, gmres_jacobi, gmres_ilu (fixed-point),
    gmres_ilu_colored (graph-coloring, exact sweeps),
    gmres_schwarz, gmres_amg, gmres_pipelined[_ilu|_amg] (aliases — see
    solvers.krylov.gmres_pipelined), gmres_shifted_laplacian (AMG V-cycle
    on the complex-shifted operator, solver/mod.rs:1438), bicgstab, cg.
    Structured-mesh geometric multigrid lives in fem/multigrid.py.
    """
    config = config or KrylovConfig(max_iterations=2000, tolerance=1e-10, restart=50)
    a = problem.operator
    b = problem.rhs

    # pipelined variants are the same solver on TPU (latency hiding is
    # XLA's job); map them onto their plain counterparts
    solver = {
        "gmres_pipelined": "gmres",
        "gmres_pipelined_ilu": "gmres_ilu",
        "gmres_ilu_coloring": "gmres_ilu_colored",
        "gmres_ilu_fixed_point": "gmres_ilu",
        "gmres_pipelined_amg": "gmres_amg",
    }.get(solver, solver)

    if solver == "direct":
        x = lu_solve(problem.to_dense(), b)
        return x, {"solver": solver, "converged": True, "iterations": 0}

    pre = None
    if solver == "gmres_shifted_laplacian":
        # Erlangga shifted Laplacian P = K - (1 + 0.5i) k^2 M (+ Robin),
        # approximately inverted by one AMG V-cycle (ShiftedLaplacianMg).
        import scipy.sparse as sp

        from mathaudio_tpu.solvers import AmgConfig, AmgPreconditioner

        k = problem.k
        shift_vals = (
            problem.assembler.k_vals.astype(problem.cdtype)
            - (1.0 + 0.5j) * (k**2) * problem.assembler.m_vals.astype(problem.cdtype)
        )
        for tag, coeff in problem.robin_coeffs.items():
            shift_vals = shift_vals + coeff * problem.assembler.b_vals[tag].astype(
                problem.cdtype
            )
        shift_vals = problem.assembler.apply_dirichlet_values(shift_vals, problem.constrained)
        a_sp = sp.csr_matrix(
            (np.asarray(shift_vals), problem.assembler.csr.indices,
             problem.assembler.csr.indptr),
            shape=problem.assembler.csr.shape,
        )
        pre = AmgPreconditioner(a_sp, AmgConfig.for_difficult_problems())
    if solver == "gmres_jacobi":
        pre = jacobi_preconditioner(problem.diagonal())
    elif solver == "gmres_ilu":
        from mathaudio_tpu.solvers import IluFixedPoint
        from mathaudio_tpu.solvers.sparse import CsrMatrix

        csr = CsrMatrix(
            problem.assembler.csr.indptr,
            problem.assembler.csr.indices,
            np.asarray(problem.vals),
            problem.assembler.csr.shape,
        )
        pre = IluFixedPoint.from_csr(csr, sweeps=6)
    elif solver == "gmres_ilu_colored":
        from mathaudio_tpu.solvers import IluColored
        from mathaudio_tpu.solvers.sparse import CsrMatrix

        csr = CsrMatrix(
            problem.assembler.csr.indptr,
            problem.assembler.csr.indices,
            np.asarray(problem.vals),
            problem.assembler.csr.shape,
        )
        pre = IluColored.from_csr(csr)
    elif solver == "gmres_schwarz":
        from mathaudio_tpu.solvers import AdditiveSchwarz
        from mathaudio_tpu.solvers.sparse import CsrMatrix

        csr = CsrMatrix(
            problem.assembler.csr.indptr,
            problem.assembler.csr.indices,
            np.asarray(problem.vals),
            problem.assembler.csr.shape,
        )
        n_sub = max(2, problem.mesh.num_nodes // 512)
        pre = AdditiveSchwarz.from_csr(csr, num_subdomains=n_sub, overlap=1)
    elif solver == "gmres_amg":
        import scipy.sparse as sp

        from mathaudio_tpu.solvers import AmgConfig, AmgPreconditioner

        a_sp = sp.csr_matrix(
            (np.asarray(problem.vals), problem.assembler.csr.indices,
             problem.assembler.csr.indptr),
            shape=problem.assembler.csr.shape,
        )
        pre = AmgPreconditioner(a_sp, AmgConfig.for_fem())

    if solver == "cg":
        sol = cg(a, b, x0=x0, config=config, preconditioner=pre)
    elif solver == "bicgstab":
        sol = bicgstab(a, b, x0=x0, config=config, preconditioner=pre)
    else:
        sol = gmres(a, b, x0=x0, config=config, preconditioner=pre)

    info = {
        "solver": solver,
        "converged": bool(sol.converged),
        "iterations": int(sol.iterations),
        "residual": float(sol.residual_norm),
    }
    return sol.x, info


def l2_error_at_nodes(mesh: Mesh, u, exact_fn):
    """Relative nodal L2 error (analytical_validation.rs:40 l2_error)."""
    exact = exact_fn(jnp.asarray(mesh.nodes, default_float()))
    diff = u - exact.astype(u.dtype)
    num = jnp.sqrt(jnp.sum(jnp.abs(diff) ** 2))
    den = jnp.sqrt(jnp.sum(jnp.abs(exact) ** 2))
    return jnp.where(den > 1e-15, num / jnp.where(den > 1e-15, den, 1.0), num)
