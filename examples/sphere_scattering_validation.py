"""BEM sphere scattering vs the Mie series across regimes — the
framework's core validation, as a runnable example (the reference ships
this as math-bem examples + qa_suite)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from mathaudio_tpu.bem import BemProblem, BemSolver, BemSolverConfig
from mathaudio_tpu.wave.analytical import sphere_scattering_3d, from_spherical

for ka in [0.5, 1.0, 2.0, np.pi]:
    prob = BemProblem.rigid_sphere(ka, subdivisions=2 if ka < 2 else 3)
    sol = BemSolver(BemSolverConfig(burton_miller=True)).solve(prob)
    thetas = np.linspace(0, np.pi, 19)
    pts = from_spherical(jnp.full(19, 2.0), jnp.asarray(thetas), jnp.zeros(19))
    p = np.asarray(sol.evaluate_pressure(pts))
    exact = np.asarray(sphere_scattering_3d(ka, 1.0, 40, [2.0], thetas).pressure)
    rel = np.linalg.norm(p - exact) / np.linalg.norm(exact)
    print(f"ka={ka:6.3f}  N={prob.mesh.num_elements:5d}  field rel L2 = {rel:.4f}")
