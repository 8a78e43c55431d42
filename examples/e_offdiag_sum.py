"""Hypersingular self-vs-off-diagonal cancellation across refinements.

Analog of math-bem/examples/e_offdiag_sum.rs: on a closed smooth
surface the static hypersingular row sum vanishes, so the self finite
part must cancel the off-diagonal quadrature sum. Averaged over the
first 10 source elements at icosphere subdivisions 1..3, print self E,
off-diagonal sum, and the residual total — which should be O((ka)^2)
small relative to the self term, localizing any integration error to
self vs off-diagonal.

Usage: python examples/e_offdiag_sum.py [--ka 0.2]
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
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from mathaudio_tpu.bem.assembly import (
        assemble_burton_miller,
        assemble_collocation_matrix,
    )
    from mathaudio_tpu.bem.mesh import icosphere

    radius = 0.1
    k = args.ka / radius
    beta = 1j / k
    print(f"=== E off-diagonal sum test ===\nka={args.ka}, k={k:.4f}")

    prev_ratio = None
    for subdiv in (1, 2, 3):
        mesh = icosphere(radius, subdiv)
        n = mesh.num_elements
        a_bm = np.asarray(assemble_burton_miller(mesh, k, beta))
        a_c = np.asarray(assemble_collocation_matrix(mesh, k))
        t_mat = (a_bm - a_c) / beta  # hypersingular operator T

        rows = range(min(10, n))
        self_e = np.mean([t_mat[i, i] for i in rows])
        off_e = np.mean([t_mat[i].sum() - t_mat[i, i] for i in rows])
        total = self_e + off_e
        ratio = abs(total) / max(abs(self_e), 1e-300)
        print(f"--- subdiv={subdiv} ({n} elements) ---")
        print(f"  avg self E        = {self_e:.6e}")
        print(f"  avg off-diag sum  = {off_e:.6e}")
        print(f"  avg total (resid) = {total:.6e}  |total|/|self| = {ratio:.3e}")
        # cancellation: the residual must be small vs the O(1/h) self part
        assert ratio < 0.1, "self term does not cancel the off-diagonal sum"
        prev_ratio = ratio
    print("OK: off-diagonal sums cancel the self finite part at every "
          f"refinement (final ratio {prev_ratio:.1e})")


if __name__ == "__main__":
    main()
