"""FEM h-convergence study on the unit cube — the reference's
analytical_validation convergence-rate tests (math-fem/tests/
analytical_validation.rs:178,613) as a runnable diagnostic.

Solves -lap(u) - k^2 u = f with a manufactured solution on successively
refined meshes and prints the L2 error and observed order. P1 elements
converge at O(h^2) in L2; the observed order should approach 2.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from mathaudio_tpu.fem.boundary import DirichletBC
from mathaudio_tpu.fem.mesh import box_mesh_tetrahedra
from mathaudio_tpu.fem.problem import HelmholtzProblem, solve_helmholtz

k = 2.0
kx, ky, kz = 1.0, 1.2, 0.7


def u_exact(x):
    return jnp.sin(kx * x[..., 0]) * jnp.sin(ky * x[..., 1]) * jnp.sin(kz * x[..., 2])


def f_rhs(x):
    lam = kx**2 + ky**2 + kz**2
    return (lam - k**2) * u_exact(x)


prev = None
print("n      h        L2 error   observed order")
for n in (4, 8, 16):
    mesh = box_mesh_tetrahedra(0, 1, 0, 1, 0, 1, n, n, n)
    prob = HelmholtzProblem(
        mesh, k, source_fn=f_rhs,
        dirichlet=[DirichletBC(t, u_exact) for t in (1, 2, 3, 4, 5, 6)],
    )
    u, info = solve_helmholtz(prob, "gmres_jacobi")
    ue = u_exact(jnp.asarray(mesh.nodes))
    err = float(jnp.linalg.norm(u - ue) / jnp.linalg.norm(ue))
    order = "" if prev is None else f"{np.log2(prev / err):14.2f}"
    print(f"{n:<6d} {1.0/n:<8.4f} {err:<10.2e} {order}")
    prev = err
