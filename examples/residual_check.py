"""Residual check: verify the linear solve itself is not the error
source (reference: math-bem/examples/residual_check.rs — "if residual is
small but solution is wrong, the issue is in formulation or RHS").

Assembles the Burton–Miller system for sphere scattering, solves by LU
and by GMRES, and reports ||A p - b|| for both plus the Mie error, so a
formulation bug cannot hide behind solver noise."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from mathaudio_tpu.bem import plane_wave
from mathaudio_tpu.bem.assembly import assemble_burton_miller
from mathaudio_tpu.bem.mesh import icosphere
from mathaudio_tpu.solvers import KrylovConfig
from mathaudio_tpu.solvers.krylov import gmres
from mathaudio_tpu.wave.analytical import sphere_scattering_3d

k = 2.0
mesh = icosphere(1.0, 3)
beta = 1j / k
a = np.asarray(assemble_burton_miller(mesh, k, beta))
inc = plane_wave((0.0, 0.0, 1.0))
c = jnp.asarray(mesh.centers)
nrm = jnp.asarray(mesh.normals)
b = np.asarray(inc.pressure(c, k)) - beta * np.asarray(
    inc.normal_derivative(c, nrm, k)
)

p_lu = np.linalg.solve(a, b)
res_lu = np.linalg.norm(a @ p_lu - b) / np.linalg.norm(b)

sol = gmres(lambda v: jnp.asarray(a) @ v, jnp.asarray(b),
            config=KrylovConfig(max_iterations=200, tolerance=1e-10, restart=40))
p_gm = np.asarray(sol.x)
res_gm = np.linalg.norm(a @ p_gm - b) / np.linalg.norm(b)

cn = np.asarray(mesh.centers)
r = np.linalg.norm(cn, axis=1)
th = np.arccos(np.clip(cn[:, 2] / r, -1, 1))
exact = np.asarray(
    sphere_scattering_3d(k, 1.0, 40, [float(r.mean())], th).pressure
).reshape(-1)
err_lu = np.linalg.norm(p_lu - exact) / np.linalg.norm(exact)
err_gm = np.linalg.norm(p_gm - exact) / np.linalg.norm(exact)

print(f"N={mesh.num_elements}, ka={k}")
print(f"  LU    : ||Ap-b||/||b|| = {res_lu:.2e}   Mie rel err = {err_lu:.4f}")
print(f"  GMRES : ||Ap-b||/||b|| = {res_gm:.2e}   Mie rel err = {err_gm:.4f} "
      f"({int(sol.iterations)} iters)")
assert res_lu < 1e-12 and res_gm < 1e-9
assert err_lu < 0.1, "solver fine but solution wrong -> formulation/RHS bug"
print("solver residuals clean; accuracy limited by discretization as expected")
