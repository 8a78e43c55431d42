"""Surface-solution convergence under icosphere refinement.

Analog of math-bem/examples/mesh_refinement_test.rs: solve rigid-sphere
plane-wave scattering at subdivisions 1..3 and report the relative L2
surface-pressure error against the Mie series
(wave/analytical sphere_scattering_3d) — the error must decrease with
every refinement.

Usage: python examples/mesh_refinement_test.py [--ka 1.0]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ka", type=float, default=1.0)
    ap.add_argument("--max-subdiv", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from mathaudio_tpu.bem.solver import BemProblem, BemSolver, BemSolverConfig
    from mathaudio_tpu.wave.analytical import sphere_scattering_3d

    print(f"=== Mesh refinement test ===\nka={args.ka}")
    print(f"{'subdiv':>6} {'elements':>9} {'rel L2 err':>12} {'time':>8}")
    errors = []
    for subdiv in range(1, args.max_subdiv + 1):
        prob = BemProblem.rigid_sphere(args.ka, subdivisions=subdiv)
        t0 = time.perf_counter()
        sol = BemSolver(BemSolverConfig(burton_miller=True)).solve(prob)
        wall = time.perf_counter() - t0
        c = prob.mesh.centers
        theta = np.arccos(np.clip(c[:, 2] / np.linalg.norm(c, axis=1), -1, 1))
        exact = np.asarray(
            sphere_scattering_3d(args.ka, 1.0, 40, [1.0], theta).pressure
        )
        p = np.asarray(sol.surface_pressure)
        err = float(np.linalg.norm(p - exact) / np.linalg.norm(exact))
        errors.append(err)
        print(f"{subdiv:>6} {prob.mesh.num_elements:>9} {err:>12.4e} "
              f"{wall:>7.1f}s")
    assert all(b < a for a, b in zip(errors, errors[1:])), (
        f"error did not decrease monotonically: {errors}"
    )
    print(f"OK: monotone convergence {errors[0]:.2e} -> {errors[-1]:.2e}")


if __name__ == "__main__":
    main()
