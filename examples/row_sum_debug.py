"""Burton-Miller row-sum identities of the assembled BEM matrix.

Analog of math-bem/examples/row_sum_debug.rs, in THIS framework's
conventions (A = 1/2 I - D + beta T, e^{-iwt}, outgoing G = e^{+ikr}/4 pi r):

- the static double layer's rows sum to -1/2 on a closed surface
  (half-solid-angle identity) -> (1/2 I - D0) 1 = 1;
- the static hypersingular rows sum to 0;
- at small ka the dynamic matrix applied to the constant vector
  approaches the same limits.

These are exactly the identities the dense diagonal regularization
(assembly._assemble_rows) and the FMM diagonal (fmm._static_dlp_row_sums)
enforce; this script prints them directly from an assembled matrix.

Usage: python examples/row_sum_debug.py [--ka 0.1] [--subdiv 2]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ka", type=float, default=0.1)
    ap.add_argument("--subdiv", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from mathaudio_tpu.bem.assembly import assemble_collocation_matrix
    from mathaudio_tpu.bem.fmm import _static_dlp_row_sums, _static_hyper_row_sums
    from mathaudio_tpu.bem.mesh import icosphere

    mesh = icosphere(1.0, args.subdiv)
    n = mesh.num_elements
    k = args.ka
    print(f"=== row-sum debug ===\nka={args.ka}, icosphere {n} elements")

    d0_rows = _static_dlp_row_sums(mesh, np.float64)
    print(f"static D0 row sums: mean {d0_rows.mean():+.6f} "
          f"(identity -1/2 => quadrature defect |max| "
          f"{np.abs(d0_rows + 0.5).max():.2e})")
    t0_rows = _static_hyper_row_sums(mesh)
    print(f"off-diag static T0 row sums: |max| {np.abs(t0_rows).max():.2e} "
          f"(the full row incl. the self finite part sums to 0, so the "
          f"self entry is regularized as -s0)")

    a = np.asarray(assemble_collocation_matrix(mesh, k))
    ones = np.ones(n)
    r = a @ ones
    print(f"(1/2 I - D) @ 1 at ka={args.ka}: mean {r.mean().real:+.6f} "
          f"(static identity: 1.0), spread {np.abs(r - r.mean()).max():.2e}")
    assert np.abs(r.mean() - 1.0) < 0.05 + args.ka, r.mean()
    print("OK: assembled rows satisfy the closed-surface identities")


if __name__ == "__main__":
    main()
