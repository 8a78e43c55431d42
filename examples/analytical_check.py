"""Analytical check: print expected Mie values, then compare BEM.

Analog of math-bem/examples/analytical_check.rs ("Print expected values
from Mie theory and compare to BEM"): tabulate the exact total surface
pressure for a rigid sphere at ka = 0.5 / 1 / 2 across incidence
angles — the oracle table the BEM is validated against — then one BEM
solve per ka and its per-angle agreement.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402

from mathaudio_tpu.bem import BemProblem, BemSolver, BemSolverConfig  # noqa: E402
from mathaudio_tpu.wave.analytical import sphere_scattering_3d  # noqa: E402

angles = np.linspace(0.0, np.pi, 7)

print("expected |p_total| on the surface (Mie series, 40 terms):")
hdr = "  ".join(f"{np.degrees(t):6.0f}d" for t in angles)
print(f"{'ka':>5}  {hdr}")
for ka in (0.5, 1.0, 2.0):
    p = np.asarray(sphere_scattering_3d(ka, 1.0, 40, [1.0], angles).pressure)
    print(f"{ka:5.2f}  " + "  ".join(f"{abs(v):7.4f}" for v in p))

print("\nBEM vs those expectations (nearest element center per angle):")
for ka in (0.5, 1.0, 2.0):
    prob = BemProblem.rigid_sphere(ka, subdivisions=2)
    sol = BemSolver(BemSolverConfig(burton_miller=True)).solve(prob)
    c = prob.mesh.centers
    r = np.linalg.norm(c, axis=1)
    theta = np.arccos(np.clip(c[:, 2] / r, -1, 1))
    p_bem = np.asarray(sol.surface_pressure)
    p_mie = np.asarray(
        sphere_scattering_3d(ka, 1.0, 40, [float(r.mean())], theta).pressure
    )
    rows = []
    for t in angles:
        i = int(np.argmin(np.abs(theta - t)))
        rows.append(abs(p_bem[i] - p_mie[i]) / abs(p_mie[i]))
    rel_l2 = np.linalg.norm(p_bem - p_mie) / np.linalg.norm(p_mie)
    print(
        f"ka={ka:4.2f}  per-angle rel: "
        + "  ".join(f"{v:7.4f}" for v in rows)
        + f"   L2={rel_l2:.4f}"
    )
    assert rel_l2 < 0.06, rel_l2
print("OK")
