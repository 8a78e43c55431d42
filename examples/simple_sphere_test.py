"""Simple sphere test: the smallest rigid-sphere BEM accuracy probe.

Analog of math-bem/examples/simple_sphere_test.rs ("Tests a rigid
sphere scattering problem and compares with analytical Mie solution.
Helps isolate accuracy issues"): solve ka=1 plane-wave scattering,
print surface pressure at the pole/equator/shadow sample points next
to the Mie series, then the overall surface rel-L2.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402

from mathaudio_tpu.bem import BemProblem, BemSolver, BemSolverConfig  # noqa: E402
from mathaudio_tpu.wave.analytical import sphere_scattering_3d  # noqa: E402

ka = 1.0
prob = BemProblem.rigid_sphere(ka, subdivisions=2)
sol = BemSolver(BemSolverConfig(burton_miller=True)).solve(prob)

c = prob.mesh.centers
r = np.linalg.norm(c, axis=1)
theta = np.arccos(np.clip(c[:, 2] / r, -1, 1))
p_bem = np.asarray(sol.surface_pressure)
p_mie = np.asarray(
    sphere_scattering_3d(ka, 1.0, 40, [float(r.mean())], theta).pressure
)

print(f"rigid sphere ka={ka}, N={prob.mesh.num_elements} elements")
print(f"{'theta(deg)':>10} {'|p| BEM':>10} {'|p| Mie':>10} {'rel':>8}")
for target in (0.0, np.pi / 2, np.pi):  # forward pole, equator, shadow pole
    i = int(np.argmin(np.abs(theta - target)))
    rel = abs(p_bem[i] - p_mie[i]) / abs(p_mie[i])
    print(
        f"{np.degrees(theta[i]):10.1f} {abs(p_bem[i]):10.4f} "
        f"{abs(p_mie[i]):10.4f} {rel:8.4f}"
    )

rel_l2 = np.linalg.norm(p_bem - p_mie) / np.linalg.norm(p_mie)
print(f"surface rel L2 = {rel_l2:.4f}")
assert rel_l2 < 0.05, rel_l2
print("OK (reference debug gate: surface error small vs Mie)")
