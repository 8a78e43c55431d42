"""Burton–Miller beta-scale sweep at an interior-resonance wavenumber —
the reference ships this family of diagnostics as math-bem examples
(beta sweeps over the coupling scale; core/types.rs beta variants).

The plain collocation BIE is ill-conditioned at the sphere's interior
resonances (ka = pi is the first, though discretization shifts the
discrete resonance slightly off it); the Burton–Miller combination
gamma*BIE + beta*hypersingular-BIE removes the resonances for every
real k. This sweeps the beta scale and prints the far-field accuracy
vs the Mie series: the method is robust — accuracy stays flat across
two orders of magnitude of coupling scale, so the default scale (4.0,
bem_solver.rs) is uncritical.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from mathaudio_tpu.bem import BemProblem, BemSolver, BemSolverConfig
from mathaudio_tpu.wave.analytical import sphere_scattering_3d, from_spherical

ka = np.pi  # first interior resonance of the unit sphere
thetas = np.linspace(0, np.pi, 19)
pts = from_spherical(jnp.full(19, 2.0), jnp.asarray(thetas), jnp.zeros(19))
exact = np.asarray(sphere_scattering_3d(ka, 1.0, 40, [2.0], thetas).pressure)

print(f"ka = pi (interior resonance); accuracy vs Burton-Miller beta scale")
for scale in [0.0, 0.5, 1.0, 2.0, 4.0, 8.0, 16.0]:
    prob = BemProblem.rigid_sphere(ka, subdivisions=3)
    cfg = BemSolverConfig(burton_miller=scale > 0, beta_scale=scale or None)
    sol = BemSolver(cfg).solve(prob)
    p = np.asarray(sol.evaluate_pressure(pts))
    rel = np.linalg.norm(p - exact) / np.linalg.norm(exact)
    tag = "plain BIE (resonant!)" if scale == 0 else f"beta_scale={scale:.1f}"
    print(f"  {tag:22s} field rel L2 = {rel:.4f}")
