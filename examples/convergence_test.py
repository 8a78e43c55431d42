"""Convergence test: surface error decreases with mesh refinement.

Analog of math-bem/examples/convergence_test.rs ("Tests BEM accuracy
vs Mie theory at different mesh resolutions"): rigid-sphere plane-wave
scattering at fixed ka = 1 and 2 across icosphere refinement levels,
asserting monotone error decrease. Companion to
bem_convergence_study.py (field-point chain) and
mesh_convergence_study.py (order fits) — this is the quick gate the
reference runs first.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402

from mathaudio_tpu.bem import BemProblem, BemSolver, BemSolverConfig  # noqa: E402
from mathaudio_tpu.wave.analytical import sphere_scattering_3d  # noqa: E402

for ka in (1.0, 2.0):
    print(f"ka = {ka}")
    prev = None
    for subdiv in (1, 2, 3):
        prob = BemProblem.rigid_sphere(ka, subdivisions=subdiv)
        sol = BemSolver(BemSolverConfig(burton_miller=True)).solve(prob)
        c = prob.mesh.centers
        r = np.linalg.norm(c, axis=1)
        theta = np.arccos(np.clip(c[:, 2] / r, -1, 1))
        p_mie = np.asarray(
            sphere_scattering_3d(ka, 1.0, 40, [float(r.mean())], theta).pressure
        )
        p = np.asarray(sol.surface_pressure)
        rel = float(np.linalg.norm(p - p_mie) / np.linalg.norm(p_mie))
        h = prob.mesh.avg_element_size()
        print(f"  subdiv={subdiv}  N={prob.mesh.num_elements:5d}  "
              f"h={h:.4f}  surface rel L2 = {rel:.4f}")
        if prev is not None:
            assert rel < prev, (rel, prev)
        prev = rel
print("OK: error decreases monotonically under refinement at every ka")
