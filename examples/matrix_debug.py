"""Matrix debug: compare BEM system matrices across mesh families.

Analog of math-bem/examples/matrix_debug.rs ("Checks if the BEM matrix
assembly produces similar results for different meshes"): assemble the
CBIE collocation matrix on an icosphere, a UV sphere, and a cube-sphere
of comparable element counts and compare the assembly invariants that
do not depend on the triangulation — diagonal value (-> 1/2 as h -> 0),
static row sums (exterior Gauss identity: sum_j D0[i,j] -> 1/2 so the
CBIE row sum -> 1), and the condition number trend.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402

from mathaudio_tpu.bem.assembly import assemble_collocation_matrix  # noqa: E402
from mathaudio_tpu.bem.mesh import cube_sphere, icosphere, uv_sphere  # noqa: E402

k = 0.0  # static limit isolates the geometry-only identities
meshes = {
    "icosphere(2)": icosphere(1.0, 2),
    "uv_sphere(16x32)": uv_sphere(1.0, 16, 32),
    "cube_sphere(9)": cube_sphere(1.0, 9),
}

print(f"{'mesh':>18} {'N':>6} {'diag mean':>10} {'row sum mean':>13} "
      f"{'row sum sd':>11} {'cond':>10}")
row_means = {}
for name, mesh in meshes.items():
    a = np.asarray(assemble_collocation_matrix(mesh, 1e-9))
    diag = np.real(np.diag(a)).mean()
    rs = np.real(a.sum(axis=1))
    cond = np.linalg.cond(a)
    row_means[name] = rs.mean()
    print(f"{name:>18} {mesh.num_elements:6d} {diag:10.4f} {rs.mean():13.4f} "
          f"{rs.std():11.4f} {cond:10.2f}")
    # CBIE static row sum identity: (1/2) + solid-angle closure -> 1
    assert abs(rs.mean() - 1.0) < 0.08, (name, rs.mean())
    assert cond < 50, (name, cond)

spread = max(row_means.values()) - min(row_means.values())
print(f"row-sum spread across mesh families: {spread:.4f}")
assert spread < 0.05, spread
print("OK: assembly invariants agree across icosphere / UV sphere / cube-sphere")
