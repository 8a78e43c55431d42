"""MLFMM at the reference's large tier (VERDICT r1 item 7): build and
GMRES-solve a N=20,480-element sphere through the hierarchical tree
operator with the cluster-block preconditioner — the reference's
"FMM + batched, N > 20000" row of the solver-selection table
(math-bem/bin/qa_suite.rs:9-14), and the mlfmm.rs:954-979 upward /
downward pass pipeline.

Stages (each prints a pass/fail metric):
1. subdiv-4 sphere (N=5120, largest dense-feasible here): MLFMM-tree
   matvec vs the dense collocation matrix, rel err gate 0.5 (the
   reference's test_fmm_validation.rs:103 gate; typically ~1e-2).
2. subdiv-4: GMRES iteration counts through the SLFMM operator vs the
   MLFMM tree operator, both with ClusterBlockPreconditioner
   (mlfmm.rs:979 parity: the tree must not degrade convergence).
3. subdiv-5 sphere (N=20480): full GMRES solve through the tree
   operator + cluster-block preconditioner, validated against the Mie
   series (rel L2 on surface pressure).
4. subdiv-5 pulsating sphere (N=20480, velocity BC): full mixed-BC
   GMRES solve through the MIXED MLFMM tree (fmm.rs has no mixed FMM —
   the reference solves radiating problems dense, tbem.rs:234-340;
   this build extends the tree to mixed BCs), validated against the
   analytic pulsating-sphere field, rel err gate 0.05 (VERDICT r2
   item 7 tier).

Runs on CPU f64 for oracle-grade validation. The same operators run on
the TPU chip via re/im-plane shipping + the scatter-free gather form
(bem/fmm_chip.py, bem/fmm.gather_form; `bench.py --metric fmm` records
the chip solves: SLFMM N=5120 205 ms, MLFMM tree N=20480 998 ms).
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
from mathaudio_tpu.bem.fmm import (  # noqa: E402
    ClusterBlockPreconditioner,
    build_mlfmm_tree_system,
    build_slfmm_system,
)
from mathaudio_tpu.bem.mesh import icosphere  # noqa: E402
from mathaudio_tpu.solvers import KrylovConfig, gmres  # noqa: E402
from mathaudio_tpu.wave.analytical.solutions_3d import sphere_scattering_3d  # noqa: E402


def exact_surface(ka, surf, num_terms=60):
    c = surf.centers
    r = np.linalg.norm(c, axis=1)
    th = np.arccos(np.clip(c[:, 2] / r, -1, 1))
    out = np.empty(len(c), complex)
    for rv in np.unique(np.round(r, 9)):
        m = np.abs(r - rv) < 1e-8
        out[m] = np.asarray(
            sphere_scattering_3d(ka, 1.0, num_terms, [rv], th[m]).pressure
        ).reshape(-1)
    return out


def main():
    k = 2.0
    inc = plane_wave((0.0, 0.0, 1.0))
    ok = True

    # --- stage 1+2: N=5120 matvec validation + iteration parity
    surf4 = icosphere(1.0, 4)
    n4 = surf4.num_elements
    t0 = time.perf_counter()
    a_dense = assemble_collocation_matrix(surf4, k)
    print(f"# dense assembly N={n4}: {time.perf_counter()-t0:.1f}s")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n4) + 1j * rng.standard_normal(n4))

    t0 = time.perf_counter()
    op_tree4 = build_mlfmm_tree_system(surf4, k)
    print(f"# mlfmm tree build N={n4}: {time.perf_counter()-t0:.1f}s, "
          f"levels={len(op_tree4.data.levels)}")
    rel = float(jnp.linalg.norm(op_tree4.matvec(x) - a_dense @ x)
                / jnp.linalg.norm(a_dense @ x))
    print(f"stage1 mlfmm-tree matvec vs dense N={n4}: rel={rel:.3e} "
          f"{'PASS' if rel < 0.5 else 'FAIL'} (gate 0.5, reference "
          f"test_fmm_validation.rs:103)")
    ok &= rel < 0.5

    rhs4 = inc.pressure(jnp.asarray(surf4.centers), k)
    config = KrylovConfig(max_iterations=400, tolerance=1e-6, restart=60)
    its = {}
    for name, op in (
        ("slfmm", build_slfmm_system(surf4, k)),
        ("mlfmm-tree", op_tree4),
    ):
        pre = ClusterBlockPreconditioner.from_operator(op)
        t0 = time.perf_counter()
        sol = gmres(op, rhs4, config=config, preconditioner=pre)
        its[name] = int(sol.iterations)
        print(f"stage2 {name} GMRES N={n4}: iters={int(sol.iterations)} "
              f"converged={bool(sol.converged)} ({time.perf_counter()-t0:.1f}s)")
        ok &= bool(sol.converged)
    ratio = its["mlfmm-tree"] / max(its["slfmm"], 1)
    print(f"stage2 iteration ratio mlfmm/slfmm = {ratio:.2f} "
          f"{'PASS' if ratio < 2.0 else 'FAIL'} (tree must not degrade "
          f"convergence; mlfmm.rs:979 parity)")
    ok &= ratio < 2.0

    # --- stage 3: N=20480 full solve
    surf5 = icosphere(1.0, 5)
    n5 = surf5.num_elements
    t0 = time.perf_counter()
    op5 = build_mlfmm_tree_system(surf5, k)
    print(f"# mlfmm tree build N={n5}: {time.perf_counter()-t0:.1f}s, "
          f"levels={len(op5.data.levels)}")
    pre5 = ClusterBlockPreconditioner.from_operator(op5)
    rhs5 = inc.pressure(jnp.asarray(surf5.centers), k)
    t0 = time.perf_counter()
    sol5 = gmres(op5, rhs5, config=config, preconditioner=pre5)
    t_solve = time.perf_counter() - t0
    ex = exact_surface(k, surf5)
    rel5 = np.linalg.norm(np.asarray(sol5.x) - ex) / np.linalg.norm(ex)
    print(f"stage3 N={n5} mlfmm solve: iters={int(sol5.iterations)} "
          f"converged={bool(sol5.converged)} {t_solve:.1f}s, "
          f"surface rel L2 vs Mie = {rel5:.3e} "
          f"{'PASS' if rel5 < 0.5 else 'FAIL'} (reference coarse gate 0.5)")
    ok &= bool(sol5.converged) and rel5 < 0.5

    # --- stage 4: N=20480 mixed-BC (pulsating sphere) solve
    from mathaudio_tpu.bem.fmm import build_mlfmm_tree_mixed_system
    from mathaudio_tpu.bem.types import BoundaryCondition
    from mathaudio_tpu.wave.analytical.solutions_3d import pulsating_sphere_3d

    ka_m, v0 = 1.3, 1.0
    bc = BoundaryCondition(types=np.zeros(n5, np.int32),
                           values=np.full(n5, v0, complex))
    t0 = time.perf_counter()
    op_m, rhs_m, up = build_mlfmm_tree_mixed_system(surf5, ka_m, bc, beta=0.0)
    print(f"# mixed mlfmm tree build N={n5}: {time.perf_counter()-t0:.1f}s")
    assert bool(np.asarray(up).all())
    t0 = time.perf_counter()
    sol_m = gmres(op_m, rhs_m,
                  config=KrylovConfig(max_iterations=400, tolerance=1e-7, restart=60))
    t_solve = time.perf_counter() - t0
    exact_m = np.asarray(
        pulsating_sphere_3d(ka_m, 1.0, surf5.centers, velocity=v0).pressure
    )
    rel_m = np.linalg.norm(np.asarray(sol_m.x) - exact_m) / np.linalg.norm(exact_m)
    print(f"stage4 N={n5} MIXED mlfmm solve (pulsating sphere ka={ka_m}): "
          f"iters={int(sol_m.iterations)} converged={bool(sol_m.converged)} "
          f"{t_solve:.1f}s, surface rel L2 = {rel_m:.3e} "
          f"{'PASS' if rel_m < 0.05 else 'FAIL'} (gate 0.05)")
    ok &= bool(sol_m.converged) and rel_m < 0.05

    print("OVERALL:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
