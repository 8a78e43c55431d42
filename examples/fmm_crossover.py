"""Dense vs FMM matvec: accuracy and complexity crossover — the
reference ships this as math-bem's fmm benchmark/validation examples
(fmm_benchmark, test_fmm_validation.rs).

For growing sphere meshes, applies the dense O(N^2) collocation matrix
and the single-level FMM operator (near blocks + S.D.T multipole
pipeline) to the same vector and prints the relative matvec error and
the operator storage ratio. The FMM error stays ~1e-2 (well inside the
reference's rel<0.5 gate) while its storage overtakes the dense matrix
as N grows (crossover near N ~ 4k elements at this accuracy) — the
O(N^2) -> ~O(N log N) claim (math-bem/README.md:79-81) made concrete,
and the reason the solver-selection table switches to FMM above the
dense/iterative sizes.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from mathaudio_tpu.bem.assembly import assemble_collocation_matrix
from mathaudio_tpu.bem.fmm import build_slfmm_system
from mathaudio_tpu.bem.mesh import icosphere

k = 1.0
print("N      dense MB   fmm MB    ratio   matvec rel err")
for subdiv in (2, 3, 4):
    mesh = icosphere(1.0, subdiv)
    n = mesh.num_elements
    a = assemble_collocation_matrix(mesh, k)
    op = build_slfmm_system(mesh, k)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))
    y_dense = a @ x
    y_fmm = op.matvec(x)
    rel = float(jnp.linalg.norm(y_fmm - y_dense) / jnp.linalg.norm(y_dense))
    dense_mb = a.size * a.dtype.itemsize / 1e6
    fmm_mb = sum(v.size * v.dtype.itemsize for v in jax.tree_util.tree_leaves(op)) / 1e6
    print(f"{n:<6d} {dense_mb:<10.1f} {fmm_mb:<9.1f} {dense_mb/fmm_mb:<7.1f} {rel:.3e}")
