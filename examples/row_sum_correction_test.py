"""Row-sum correction test (reference:
math-bem/examples/row_sum_correction_test.rs — compare the BEM solution
with and without the static row-sum diagonal regularization).

The collocation diagonal is set so each static double-layer row sums to
the half-solid-angle identity exactly (tbem.rs row-sum correction;
bem/assembly.py builds it in). This diagnostic reconstructs the
UNCORRECTED operator by measuring each row's static defect and shows the
Mie error with and without the correction."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from mathaudio_tpu.bem import plane_wave
from mathaudio_tpu.bem.assembly import assemble_collocation_matrix
from mathaudio_tpu.bem.mesh import icosphere, uv_sphere
from mathaudio_tpu.wave.analytical import sphere_scattering_3d

ka = 2.0
inc = plane_wave((0.0, 0.0, 1.0))
for name, mesh in (("icosphere(3)", icosphere(1.0, 3)),
                   ("uv_sphere(16x40)", uv_sphere(1.0, 16, 40))):
    a = np.asarray(assemble_collocation_matrix(mesh, ka))
    c = jnp.asarray(mesh.centers)
    b = np.asarray(inc.pressure(c, ka))
    # static row-sum defect: at k -> 0 each row of the corrected
    # (1/2)I - D0 must sum to exactly 1 (interior solid-angle identity
    # on a closed surface with the correction; without it, quadrature
    # error of the nearly-singular neighbours leaks into the row)
    a0 = np.asarray(assemble_collocation_matrix(mesh, 1e-6))
    defect = a0 @ np.ones(mesh.num_elements) - 1.0
    # uncorrected operator: put the defect back on the diagonal
    a_unc = a.copy()
    a_unc[np.arange(len(a)), np.arange(len(a))] -= defect

    cn = np.asarray(mesh.centers)
    r = np.linalg.norm(cn, axis=1)
    th = np.arccos(np.clip(cn[:, 2] / r, -1, 1))
    exact = np.asarray(
        sphere_scattering_3d(ka, 1.0, 40, [float(r.mean())], th).pressure
    ).reshape(-1)
    e_cor = np.linalg.norm(np.linalg.solve(a, b) - exact) / np.linalg.norm(exact)
    e_unc = np.linalg.norm(np.linalg.solve(a_unc, b) - exact) / np.linalg.norm(exact)
    print(f"{name:18s} N={mesh.num_elements:5d}: static row-sum defect "
          f"max {np.abs(defect).max():.2e}; Mie rel err corrected {e_cor:.4f} "
          f"vs uncorrected {e_unc:.4f}")
    assert np.abs(a0 @ np.ones(mesh.num_elements) - 1.0).max() < 1e-10
print("(this build's static regularization satisfies the solid-angle "
      "identity to machine precision BY CONSTRUCTION — the defect to "
      "'put back' is ~1e-13, so corrected and uncorrected coincide; in "
      "the reference the correction visibly repairs real quadrature "
      "defects, here the analytic-radial self terms leave none)")
