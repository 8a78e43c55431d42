"""Bounded Burton–Miller beta test (reference:
math-bem/examples/bounded_beta_test.rs — beta = i/k blows up at low
frequency and amplifies hypersingular quadrature error; the bounded
beta = i/(k + k_ref) with k_ref ~ 1/h tames it).

Compares classic, bounded, and element-size-optimal beta across ka on
the same mesh, reporting the Mie error of each."""

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
from mathaudio_tpu.bem.types import PhysicsParams
from mathaudio_tpu.wave.analytical import sphere_scattering_3d

mesh = icosphere(1.0, 3)
h = float(np.sqrt(np.asarray(mesh.areas).mean()))
inc = plane_wave((0.0, 0.0, 1.0))
c = jnp.asarray(mesh.centers)
nrm = jnp.asarray(mesh.normals)
cn = np.asarray(mesh.centers)
r = np.linalg.norm(cn, axis=1)
th = np.arccos(np.clip(cn[:, 2] / r, -1, 1))

print(f"N={mesh.num_elements}, h={h:.3f}")
print(f"{'ka':>6} | {'classic i/k':>12} | {'bounded':>12} | {'size-optimal':>12}")
for ka in (0.1, 0.5, 1.0, 2.0):
    pp = PhysicsParams.from_wave_number(ka)
    betas = {
        "classic": pp.burton_miller_beta(),
        "bounded": pp.burton_miller_beta_bounded(1.0),
        "optimal": pp.burton_miller_beta_optimal(h),
    }
    exact = np.asarray(
        sphere_scattering_3d(ka, 1.0, 40, [float(r.mean())], th).pressure
    ).reshape(-1)
    cells = []
    for beta in betas.values():
        a = np.asarray(assemble_burton_miller(mesh, ka, complex(beta)))
        b = np.asarray(inc.pressure(c, ka)) - complex(beta) * np.asarray(
            inc.normal_derivative(c, nrm, ka)
        )
        p = np.linalg.solve(a, b)
        cells.append(np.linalg.norm(p - exact) / np.linalg.norm(exact))
    print(f"{ka:6.2f} | {cells[0]:12.4f} | {cells[1]:12.4f} | {cells[2]:12.4f}")
print("(at low ka the bounded/size-optimal betas must not degrade — the "
      "classic i/k magnifies the hypersingular error as 1/k)")
