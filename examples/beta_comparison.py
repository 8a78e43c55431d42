"""Burton–Miller beta-scale comparison across ka — the reference's
math-bem/examples/beta_comparison.rs: sweep the coupling scale at several
ka on a 10 cm rigid sphere and report surface-pressure accuracy vs the
Mie series, showing which scale wins per regime (the data behind
types.rs optimal_beta_scale: 4.0 below ka=0.5, 2.0 to ka=2, 1.0 above).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mathaudio_tpu.bem import PhysicsParams, plane_wave  # noqa: E402
from mathaudio_tpu.bem.assembly import (  # noqa: E402
    assemble_burton_miller,
    assemble_collocation_matrix,
)
from mathaudio_tpu.bem.mesh import icosphere  # noqa: E402
from mathaudio_tpu.solvers.direct import lu_solve  # noqa: E402
from mathaudio_tpu.wave.analytical.solutions_3d import sphere_scattering_3d  # noqa: E402


def main():
    radius = 0.1
    surf = icosphere(radius, 2)
    n = surf.num_elements
    inc = plane_wave((0.0, 0.0, 1.0))
    centers = jnp.asarray(surf.centers)
    normals = jnp.asarray(surf.normals)
    r = np.linalg.norm(surf.centers, axis=1)
    th = np.arccos(np.clip(surf.centers[:, 2] / r, -1, 1))
    print(f"beta-scale comparison, {n}-element sphere (r = {radius} m)")
    print(f"{'ka':>5} | " + " | ".join(f"scale {s:>4}" for s in (0.0, 1.0, 2.0, 4.0, 8.0)))
    for ka in (0.3, 0.5, 1.0, 2.0):
        k = ka / radius
        exact = np.asarray(
            sphere_scattering_3d(k, radius, 50, [float(r.mean())], th).pressure
        ).reshape(-1)
        row = []
        for scale in (0.0, 1.0, 2.0, 4.0, 8.0):
            phys = PhysicsParams.from_wave_number(k)
            if scale == 0.0:
                a = assemble_collocation_matrix(surf, k)
                rhs = inc.pressure(centers, k)
            else:
                beta = phys.burton_miller_beta_scaled(scale)
                a = assemble_burton_miller(surf, k, beta)
                rhs = inc.pressure(centers, k) - beta * inc.normal_derivative(
                    centers, normals, k
                )
            p = np.asarray(lu_solve(a, rhs))
            row.append(np.linalg.norm(p - exact) / np.linalg.norm(exact))
        print(f"{ka:5.1f} | " + " | ".join(f"{e:10.4f}" for e in row))


if __name__ == "__main__":
    main()
