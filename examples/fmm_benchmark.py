"""FMM benchmark: SLFMM vs dense TBEM across mesh sizes — build time,
solve time, and accuracy vs the Mie oracle (the reference's
math-bem/examples/fmm_benchmark.rs table, rebuilt on the JAX stack).

Dense path: row-chunked collocation assembly + LU. FMM path: SLFMM
operator + cluster-block-preconditioned GMRES. ka = 1 on a 10 cm sphere
(the reference's configuration).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mathaudio_tpu.bem import plane_wave  # noqa: E402
from mathaudio_tpu.bem.assembly import assemble_collocation_matrix  # noqa: E402
from mathaudio_tpu.bem.fmm import ClusterBlockPreconditioner, build_slfmm_system  # noqa: E402
from mathaudio_tpu.bem.mesh import icosphere  # noqa: E402
from mathaudio_tpu.solvers import KrylovConfig, gmres  # noqa: E402
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
    radius, ka = 0.1, 1.0
    k = ka / radius
    inc = plane_wave((0.0, 0.0, 1.0))
    config = KrylovConfig(max_iterations=300, tolerance=1e-6, restart=50)
    print(f"ka={ka}, radius={radius} m")
    print(f"{'N':>6} | {'dense asm':>10} | {'dense LU':>9} | {'fmm build':>10} | "
          f"{'fmm solve':>9} | {'err dense':>9} | {'err fmm':>9}")
    ok = True
    for subdiv in (2, 3, 4):
        surf = icosphere(radius, subdiv)
        n = surf.num_elements
        rhs = inc.pressure(jnp.asarray(surf.centers), k)
        ex = exact_surface(k, radius, surf)

        t0 = time.perf_counter()
        a = assemble_collocation_matrix(surf, k)
        a.block_until_ready()
        t_asm = time.perf_counter() - t0
        t0 = time.perf_counter()
        p_dense = np.asarray(lu_solve(a, rhs))
        t_lu = time.perf_counter() - t0
        e_dense = np.linalg.norm(p_dense - ex) / np.linalg.norm(ex)

        t0 = time.perf_counter()
        op = build_slfmm_system(surf, k)
        pre = ClusterBlockPreconditioner.from_operator(op)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        sol = gmres(op, rhs, config=config, preconditioner=pre)
        sol.x.block_until_ready()
        t_solve = time.perf_counter() - t0
        e_fmm = np.linalg.norm(np.asarray(sol.x) - ex) / np.linalg.norm(ex)

        print(f"{n:>6} | {t_asm:>9.2f}s | {t_lu:>8.2f}s | {t_build:>9.2f}s | "
              f"{t_solve:>8.2f}s | {e_dense:>9.3e} | {e_fmm:>9.3e} "
              f"(iters={int(sol.iterations)}, conv={bool(sol.converged)})")
        ok &= e_dense < 0.5 and e_fmm < 0.5 and bool(sol.converged)
    print("OVERALL:", "PASS" if ok else "FAIL",
          "(both methods inside the reference rel<0.5 gate at every size)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
