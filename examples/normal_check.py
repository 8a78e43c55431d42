"""Normal-direction check: element normals of the sphere generators must
point outward (reference: math-bem/examples/normal_check.rs — for a
sphere centered at the origin, the outward normal at (x,y,z) is
(x,y,z)/r)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from mathaudio_tpu.bem.mesh import cube_sphere, icosphere, uv_sphere

radius = 0.1
for name, mesh in (
    ("icosphere(subdiv=3)", icosphere(radius, 3)),
    ("uv_sphere(12x24)", uv_sphere(radius, 12, 24)),
    ("cube_sphere(n=8)", cube_sphere(radius, 8)),
):
    c = np.asarray(mesh.centers)
    n = np.asarray(mesh.normals)
    radial = c / np.linalg.norm(c, axis=1, keepdims=True)
    dots = np.sum(n * radial, axis=1)
    n_in = int((dots < 0).sum())
    print(
        f"{name:20s} N={mesh.num_elements:5d}  n.r_hat: min={dots.min():+.4f} "
        f"mean={dots.mean():.4f}  inward={n_in}"
    )
    assert n_in == 0, f"{name}: {n_in} inward-pointing normals"
    # area closure: sum of (area * normal) over a closed surface is 0
    closure = np.abs(np.sum(np.asarray(mesh.areas)[:, None] * n, axis=0)).max()
    total = float(np.asarray(mesh.areas).sum())
    print(f"{'':20s} closure |sum(A n)|={closure:.2e}  area={total:.6f} "
          f"(4*pi*r^2={4*np.pi*radius**2:.6f})")
print("all normals outward")
