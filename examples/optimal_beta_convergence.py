"""Mesh convergence at ka = 1.0 with the optimal (4x) Burton–Miller
scale — the reference's math-bem/examples/optimal_beta_convergence.rs:
refine the sphere mesh at fixed ka and show the surface-pressure error
vs the Mie series falling with element count under beta_scale = 4.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mathaudio_tpu.bem import PhysicsParams, plane_wave  # noqa: E402
from mathaudio_tpu.bem.assembly import assemble_burton_miller  # noqa: E402
from mathaudio_tpu.bem.mesh import icosphere  # noqa: E402
from mathaudio_tpu.solvers.direct import lu_solve  # noqa: E402
from mathaudio_tpu.wave.analytical.solutions_3d import sphere_scattering_3d  # noqa: E402


def main():
    radius, ka, scale = 0.1, 1.0, 4.0
    k = ka / radius
    inc = plane_wave((0.0, 0.0, 1.0))
    beta = PhysicsParams.from_wave_number(k).burton_miller_beta_scaled(scale)
    print(f"optimal-beta (scale {scale}) convergence at ka = {ka}")
    prev = None
    ok = True
    for subdiv in (1, 2, 3):
        surf = icosphere(radius, subdiv)
        centers = jnp.asarray(surf.centers)
        a = assemble_burton_miller(surf, k, beta)
        rhs = inc.pressure(centers, k) - beta * inc.normal_derivative(
            centers, jnp.asarray(surf.normals), k
        )
        p = np.asarray(lu_solve(a, rhs))
        r = np.linalg.norm(surf.centers, axis=1)
        th = np.arccos(np.clip(surf.centers[:, 2] / r, -1, 1))
        exact = np.asarray(
            sphere_scattering_3d(k, radius, 50, [float(r.mean())], th).pressure
        ).reshape(-1)
        rel = np.linalg.norm(p - exact) / np.linalg.norm(exact)
        note = ""
        if prev is not None:
            note = f"  (ratio vs coarser: {prev / rel:.2f}x)"
            ok &= rel < prev
        print(f"  subdiv {subdiv}: N={surf.num_elements:5d}  rel L2 = {rel:.4f}{note}")
        prev = rel
    print("PASS: error decreases under refinement" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
