"""Angular validation: BEM surface pressure vs Mie by scattering angle
(reference: math-bem/examples/angular_validation.rs — locates WHERE the
BEM solution deviates, not just the aggregate norm), plus the ±θ
symmetry check of test_2d_cylinder.rs:172 in 3D form."""

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
from mathaudio_tpu.wave.analytical import sphere_scattering_3d

ka = 2.0
mesh = icosphere(1.0, 3)
beta = 1j / ka
a = np.asarray(assemble_burton_miller(mesh, ka, beta))
inc = plane_wave((0.0, 0.0, 1.0))
c = jnp.asarray(mesh.centers)
nrm = jnp.asarray(mesh.normals)
b = np.asarray(inc.pressure(c, ka)) - beta * np.asarray(
    inc.normal_derivative(c, nrm, ka)
)
p = np.linalg.solve(a, b)

cn = np.asarray(mesh.centers)
r = np.linalg.norm(cn, axis=1)
th = np.arccos(np.clip(cn[:, 2] / r, -1, 1))
exact = np.asarray(
    sphere_scattering_3d(ka, 1.0, 40, [float(r.mean())], th).pressure
).reshape(-1)

print(f"ka={ka}, N={mesh.num_elements}: |p| by angle bin (0 = backscatter "
      f"toward -z source side, pi = forward)")
print(f"{'theta bin':>12} {'n':>4} {'<|p|> BEM':>10} {'<|p|> Mie':>10} {'rel err':>8}")
edges = np.linspace(0, np.pi, 10)
for lo, hi in zip(edges[:-1], edges[1:]):
    m = (th >= lo) & (th < hi)
    if not m.any():
        continue
    rel = np.linalg.norm(p[m] - exact[m]) / np.linalg.norm(exact[m])
    print(f"{np.degrees(lo):5.0f}-{np.degrees(hi):4.0f} deg {m.sum():4d} "
          f"{np.abs(p[m]).mean():10.4f} {np.abs(exact[m]).mean():10.4f} {rel:8.4f}")

# azimuthal symmetry: the +z plane wave is axisymmetric, so |p| must be
# phi-independent at fixed theta (the 3D analog of test_2d_cylinder's
# |p(+theta)| = |p(-theta)| gate)
order = np.argsort(th)
spread = []
for i in range(0, len(order) - 8, 8):
    grp = np.abs(p[order[i : i + 8]])
    spread.append(grp.max() - grp.min())
print(f"azimuthal |p| spread within theta-neighbour groups: "
      f"max {max(spread):.2e} (mesh-discretization level)")
assert np.linalg.norm(p - exact) / np.linalg.norm(exact) < 0.05
print("angular distribution matches Mie within discretization error")
