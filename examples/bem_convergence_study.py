"""BEM convergence study: exterior field-point accuracy vs mesh refinement.

The reference's math-bem/examples/bem_convergence_study.rs, rebuilt:
rigid-sphere scattering at ka = 0.2 / 0.5 / 1.0 / 2.0, with the solved
surface pressure propagated to the forward field point (0, 0, 2a) —
the direction most sensitive to quadrature/normal-orientation errors —
and compared against the Mie series at each refinement level. Where the
reference refines a UV sphere (n_theta x n_phi = 4x8 .. 16x32, 32..512
quads), we refine the icosphere (subdivisions 1..4, 80..5120 triangles),
which is the native mesh family of this build.

Companion to mesh_convergence_study.py (surface-pressure convergence);
this one validates the Kirchhoff-Helmholtz field evaluation chain
(bem/postprocess.evaluate_field) end to end.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from mathaudio_tpu.bem.solver import BemProblem, BemSolver  # noqa: E402
from mathaudio_tpu.wave.analytical.solutions_3d import sphere_scattering_3d  # noqa: E402


def main():
    radius = 0.1
    eval_r = 2.0 * radius  # forward point (0, 0, 2a), theta = 0
    eval_point = np.array([[0.0, 0.0, eval_r]])
    solver = BemSolver()

    print("BEM Convergence Study: Rigid Sphere Scattering")
    print("==============================================")
    worst_fine = 0.0
    for ka in [0.2, 0.5, 1.0, 2.0]:
        k = ka / radius
        exact = complex(
            np.asarray(
                sphere_scattering_3d(k, radius, 50, [eval_r], [0.0]).pressure
            ).reshape(-1)[0]
        )
        print(f"\n=== ka = {ka:.2f} ===")
        print("subdiv   DOFs    BEM |p|      Analytical   Error")
        print("-------------------------------------------------")
        errs = []
        for subdiv in (1, 2, 3, 4):
            problem = BemProblem.rigid_sphere(ka, radius, subdivisions=subdiv)
            sol = solver.solve(problem)
            p = complex(np.asarray(sol.evaluate_pressure(eval_point)).reshape(-1)[0])
            err = abs(abs(p) - abs(exact)) / abs(exact) * 100.0
            errs.append(err)
            print(
                f"  {subdiv}     {problem.mesh.num_elements:5d}   "
                f"{abs(p):10.6f}   {abs(exact):10.6f}   {err:6.2f}%"
            )
        worst_fine = max(worst_fine, errs[-1])
        # h-refinement must help: finest at least 3x better than coarsest
        assert errs[-1] < errs[0] / 3.0, (ka, errs)
    assert worst_fine < 1.0, worst_fine  # <1% at subdiv 4 across the band
    print(f"\nPASS: finest-mesh forward-point error < 1% at every ka "
          f"(worst {worst_fine:.3f}%)")


if __name__ == "__main__":
    main()
