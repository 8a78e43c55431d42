"""Mesh-topology comparison: icosphere vs UV-sphere vs cube-sphere at
matched element counts (reference: math-bem/examples/
mesh_topology_comparison.rs + mesh_comparison.rs — quantifies how
element shape quality feeds BEM accuracy).

Prints element-count, area error, shape statistics, and the resulting
surface-pressure Mie error for each topology at the same ka."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from mathaudio_tpu.bem import plane_wave
from mathaudio_tpu.bem.assembly import assemble_burton_miller
from mathaudio_tpu.bem.mesh import cube_sphere, icosphere, uv_sphere
from mathaudio_tpu.wave.analytical import sphere_scattering_3d

ka = 2.0
beta = 1j / ka
inc = plane_wave((0.0, 0.0, 1.0))
print(f"{'topology':>22} {'N':>5} {'area err':>9} {'A_max/A_min':>11} {'Mie rel':>8}")
for name, mesh in (
    ("icosphere(3)", icosphere(1.0, 3)),
    ("uv_sphere(16x40)", uv_sphere(1.0, 16, 40)),
    ("cube_sphere(10)", cube_sphere(1.0, 10)),
):
    areas = np.asarray(mesh.areas)
    area_err = abs(areas.sum() - 4 * np.pi) / (4 * np.pi)
    a = np.asarray(assemble_burton_miller(mesh, ka, beta))
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
    rel = np.linalg.norm(p - exact) / np.linalg.norm(exact)
    print(f"{name:>22} {mesh.num_elements:5d} {area_err:9.2e} "
          f"{areas.max()/areas.min():11.2f} {rel:8.4f}")
print("(uniform icosphere elements should give the best error per DoF)")
