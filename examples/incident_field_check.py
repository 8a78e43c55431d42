"""Incident-field check: plane-wave values on the sphere surface
(reference: math-bem/examples/incident_field_check.rs).

For a +z plane wave p_inc = e^{ikz}: |p_inc| = 1 everywhere, and
dp/dn = ik n_z p_inc — positive imaginary part at the front (z > 0),
negative at the back — plus the point-source 1/r falloff sanity check."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from mathaudio_tpu.bem import plane_wave, point_source
from mathaudio_tpu.bem.mesh import icosphere

k = 2.0
# radius 0.1 like the reference example: kz stays small so p ~ 1 + ikz
# and Im(dp/dn) ~ k n_z is visible without phase rotation
mesh = icosphere(0.1, 3)
c = jnp.asarray(mesh.centers)
n = jnp.asarray(mesh.normals)

inc = plane_wave((0.0, 0.0, 1.0))
p = np.asarray(inc.pressure(c, k))
dp = np.asarray(inc.normal_derivative(c, n, k))
z = np.asarray(mesh.centers)[:, 2]
nz = np.asarray(mesh.normals)[:, 2]

print(f"plane wave +z, k={k}, N={mesh.num_elements}")
print(f"  | |p|-1 |_max          = {np.abs(np.abs(p) - 1).max():.2e}")
exact_dp = 1j * k * nz * p
print(f"  | dp/dn - ik n_z p |_max = {np.abs(dp - exact_dp).max():.2e}")
front = dp[z > 0.05].imag.mean()
back = dp[z < -0.05].imag.mean()
print(f"  Im(dp/dn): front {front:+.3f} (expect ~+{k:.0f}*<n_z>), back {back:+.3f}")
assert front > 0 and back < 0

src = point_source((0.0, 0.0, 0.3))
ps = np.asarray(src.pressure(c, k))
r = np.linalg.norm(np.asarray(mesh.centers) - np.array([0.0, 0.0, 0.3]), axis=1)
print(f"point source at (0,0,0.3):  | |p| - 1/(4 pi r) |_max = "
      f"{np.abs(np.abs(ps) - 1 / (4 * np.pi * r)).max():.2e}")
print("incident fields OK")
