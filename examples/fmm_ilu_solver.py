"""FMM + ILU solver demo (reference: math-bem/examples/fmm_ilu_solver.rs
— "Fast Multipole Method for O(N log N) matvec + ILU preconditioning
for convergence + adaptive beta tuning for wide frequency range").

Solves sphere scattering through the SLFMM operator with three
preconditioners — none, near-field ILU(0), cluster-block LU — printing
iteration counts and Mie accuracy for each, across an adaptive-beta
frequency scan."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from mathaudio_tpu.bem import plane_wave
from mathaudio_tpu.bem.fmm import (
    ClusterBlockPreconditioner,
    build_slfmm_system,
    near_ilu_preconditioner,
)
from mathaudio_tpu.bem.mesh import icosphere
from mathaudio_tpu.bem.types import PhysicsParams
from mathaudio_tpu.solvers import KrylovConfig
from mathaudio_tpu.solvers.krylov import gmres
from mathaudio_tpu.wave.analytical import sphere_scattering_3d

mesh = icosphere(1.0, 3)
n = mesh.num_elements
inc = plane_wave((0.0, 0.0, 1.0))
c = jnp.asarray(mesh.centers)
nrm = jnp.asarray(mesh.normals)
cn = np.asarray(mesh.centers)
r = np.linalg.norm(cn, axis=1)
th = np.arccos(np.clip(cn[:, 2] / r, -1, 1))
config = KrylovConfig(max_iterations=300, tolerance=1e-6, restart=60)

print(f"N={n} SLFMM sphere scattering, adaptive Burton-Miller beta")
print(f"{'ka':>5} {'beta_scale':>10} | {'none':>12} | {'near-ILU':>12} | {'cluster-LU':>12} | Mie rel")
for ka in (1.0, 2.0, 4.0):
    scale = PhysicsParams.from_wave_number(ka).optimal_beta_scale(ka)
    beta = scale * 1j / ka
    op = build_slfmm_system(mesh, ka, beta=beta)
    rhs = inc.pressure(c, ka) - beta * inc.normal_derivative(c, nrm, ka)
    cells = []
    sols = {}
    for name, pre in (
        ("none", None),
        ("ilu", near_ilu_preconditioner(op)),
        ("blk", ClusterBlockPreconditioner.from_operator(op)),
    ):
        sol = gmres(op, rhs, config=config, preconditioner=pre)
        cells.append(f"{int(sol.iterations):4d} it "
                     f"{'ok' if bool(sol.converged) else 'FAIL'}")
        sols[name] = np.asarray(sol.x)
    exact = np.asarray(
        sphere_scattering_3d(ka, 1.0, 40, [float(r.mean())], th).pressure
    ).reshape(-1)
    rel = np.linalg.norm(sols["blk"] - exact) / np.linalg.norm(exact)
    print(f"{ka:5.1f} {scale:10.3f} | {cells[0]:>12} | {cells[1]:>12} | "
          f"{cells[2]:>12} | {rel:.4f}")
print("(preconditioned iteration counts must beat the unpreconditioned run)")
