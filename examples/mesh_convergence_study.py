"""Mesh convergence study: minimum mesh density per ka — the
reference's math-bem/examples/mesh_convergence_study.rs, rebuilt.

Sweeps subdivision levels over a ka grid on a 10 cm rigid sphere and
reports the surface-pressure error vs the Mie series, plus the coarsest
subdivision meeting a 5% target at each ka — making the "elements per
wavelength" rule concrete for the BEM path.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mathaudio_tpu.bem import plane_wave  # noqa: E402
from mathaudio_tpu.bem.assembly import assemble_collocation_matrix  # noqa: E402
from mathaudio_tpu.bem.mesh import icosphere  # noqa: E402
from mathaudio_tpu.solvers.direct import lu_solve  # noqa: E402
from mathaudio_tpu.wave.analytical.solutions_3d import sphere_scattering_3d  # noqa: E402


def exact_surface(k, radius, surf, num_terms=40):
    c = surf.centers
    r = np.linalg.norm(c, axis=1)
    th = np.arccos(np.clip(c[:, 2] / r, -1, 1))
    out = np.empty(len(c), complex)
    for rv in np.unique(np.round(r, 9)):
        m = np.abs(r - rv) < 1e-8
        out[m] = np.asarray(
            sphere_scattering_3d(k, radius, num_terms, [rv], th[m]).pressure
        ).reshape(-1)
    return out


def main():
    radius = 0.1
    ka_values = [0.3, 0.5, 0.7, 0.8, 0.9, 1.0, 1.5, 2.0, 3.0]
    subdivisions = (2, 3)
    inc = plane_wave((0.0, 0.0, 1.0))
    meshes = {s: icosphere(radius, s) for s in subdivisions}
    for s, m in meshes.items():
        print(f"subdiv {s}: {m.num_elements} elements, "
              f"avg size {m.avg_element_size():.4f} m")

    errs = {}
    for s in subdivisions:
        surf = meshes[s]
        centers = jnp.asarray(surf.centers)
        for ka in ka_values:
            k = ka / radius
            a = assemble_collocation_matrix(surf, k)
            p = np.asarray(lu_solve(a, inc.pressure(centers, k)))
            ex = exact_surface(k, radius, surf)
            errs[(s, ka)] = np.linalg.norm(p - ex) / np.linalg.norm(ex)

    header = "ka      " + "".join(f"subdiv{s:>2}   " for s in subdivisions) + "min subdiv @5%"
    print("\n" + header)
    ok = True
    for ka in ka_values:
        row = f"{ka:<8.2f}"
        min_s = None
        for s in subdivisions:
            e = errs[(s, ka)]
            row += f"{e:<11.4f}"
            if min_s is None and e < 0.05:
                min_s = s
        if min_s is not None:
            lam = 2 * np.pi / (ka / radius)
            epw = lam / meshes[min_s].avg_element_size()
            row += f"{min_s:>6}  ({epw:.1f} elem/lambda)"
        else:
            row += "  none"
        print(row)
        ok &= min_s is not None
        # finer mesh must not be (much) worse
        ok &= errs[(3, ka)] < errs[(2, ka)] * 1.2
    print("OVERALL:", "PASS" if ok else "FAIL",
          "(every ka solvable to 5% within subdiv<=3; refinement monotone)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
