"""Hypersingular identity test: E[1] = 0 on a closed surface
(reference: math-bem/examples/hypersingular_test.rs — the hypersingular
operator applied to a constant must vanish; a violation means the E
integral / its regularization is wrong).

The Burton–Miller matrix is A = (1/2)I - D + beta T, so
T = (A(beta) - A(0)) / beta isolates the hypersingular block including
its static row-sum regularization. The identity E[1] = 0 is a STATIC
(k -> 0) identity — those rows must be machine-zero, proving the
regularization. At finite k the Maue identity leaves the physical
remainder T[1] = k^2 * S-type term (NOT an error): its value must be
k^2-scaled and stable under refinement, which is what the finite-k rows
demonstrate."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from mathaudio_tpu.bem.assembly import assemble_burton_miller, assemble_collocation_matrix
from mathaudio_tpu.bem.mesh import icosphere

for subdiv in (1, 2, 3):
    mesh = icosphere(0.1, subdiv)
    ones = np.ones(mesh.num_elements)
    for k in (1e-3, 1.0, 2.0):
        beta = 1j / max(k, 1e-3)
        a_bm = np.asarray(assemble_burton_miller(mesh, k, beta))
        a_0 = np.asarray(assemble_collocation_matrix(mesh, k))
        t = (a_bm - a_0) / beta
        e1 = np.abs(t @ ones)
        print(
            f"subdiv={subdiv} N={mesh.num_elements:4d} k={k:7.3f}: "
            f"|E[1]|_max = {e1.max():.3e}  |E[1]|_mean/k^2 = {e1.mean()/max(k,1e-3)**2:.3e}"
        )
        if k < 1e-2:
            assert e1.max() < 1e-6, "static E[1]=0 identity violated"
    print()
print("(k->0 rows ~machine-zero prove the regularization; finite-k rows are")
print(" the physical Maue remainder k^2 S[1] — mean/k^2 must be k-independent")
print(" and stable under refinement)")
