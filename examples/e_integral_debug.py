"""Self-element vs off-diagonal hypersingular (E) integral consistency.

Analog of math-bem/examples/e_integral_debug.rs: pick an element of a
small icosphere, evaluate its Burton-Miller hypersingular row — the
analytic-radial self term against the regular-quadrature off-diagonal
entries — and check the closed-surface identity sum_j E_ij ~ 0 that the
static row-sum regularization (bem/fmm._static_hyper_row_sums,
bem/assembly self terms) is built on.

Usage: python examples/e_integral_debug.py [--ka 0.2] [--subdiv 2]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ka", type=float, default=0.2)
    ap.add_argument("--subdiv", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from mathaudio_tpu.bem.assembly import assemble_burton_miller
    from mathaudio_tpu.bem.fmm import _static_hyper_row_sums
    from mathaudio_tpu.bem.mesh import icosphere

    radius = 0.1
    k = args.ka / radius
    mesh = icosphere(radius, args.subdiv)
    n = mesh.num_elements
    beta = 1j / k
    print(f"=== E integral debug ===\nka={args.ka}, k={k:.4f}, "
          f"icosphere {n} elements")

    # Burton-Miller matrix: A = 1/2 I - D + beta T. Isolate the
    # hypersingular part by differencing against the CBIE matrix.
    from mathaudio_tpu.bem.assembly import assemble_collocation_matrix

    a_bm = np.asarray(assemble_burton_miller(mesh, k, beta))
    a_c = np.asarray(assemble_collocation_matrix(mesh, k))
    t_mat = (a_bm - a_c) / beta  # the hypersingular operator T

    i = 0
    row = t_mat[i]
    print(f"element {i}: T self = {row[i]:.6e}")
    print(f"           off-diagonal sum = {np.sum(row) - row[i]:.6e}")
    print(f"           full row sum     = {np.sum(row):.6e}")

    # closed-surface identity: the FULL static hypersingular row sum
    # (including the singular self finite part) vanishes, so the
    # off-diagonal quadrature sum s0 must equal MINUS the self finite
    # part — which is exactly how the near blocks regularize the self
    # entry (T0_self = -s0). The dynamic T row sum is then O(ka).
    s0 = _static_hyper_row_sums(mesh)
    print(f"off-diag static T0 row sums: |max| {np.abs(s0).max():.3e} "
          f"(= minus the O(1/h) self finite part, used as T0_self = -s0)")
    rs = np.abs(t_mat.sum(axis=1))
    print(f"dynamic T row-sum |max| at ka={args.ka}: {rs.max():.3e}")
    assert rs.max() < 10 * args.ka, "hypersingular row sums inconsistent"
    print("OK: self term is consistent with the off-diagonal quadrature")


if __name__ == "__main__":
    main()
