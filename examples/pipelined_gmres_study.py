"""Pipelined-GMRES decision study (VERDICT r1 item 9).

Measures standard CGS2-GMRES vs the true Ghysels p(1) pipelined variant
(one fused reduction/iteration, solvers/krylov.py:gmres_pipelined_ghysels)
on a row-sharded banded operator over an 8-virtual-device mesh — the
setting the reference's gmres_pipelined.rs:1-18 targets (hide reduction
latency behind SpMV). Prints wall-clock per solve and iteration counts;
the decision is recorded in gmres_pipelined's docstring.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PYTHONPATH=. python examples/pipelined_gmres_study.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from jax.sharding import Mesh  # noqa: E402

from mathaudio_tpu.parallel.spmd import build_sharded_system, sharded_gmres_fn, unshard  # noqa: E402
from mathaudio_tpu.solvers import KrylovConfig  # noqa: E402
from mathaudio_tpu.solvers.krylov import gmres, gmres_pipelined_ghysels  # noqa: E402
from mathaudio_tpu.solvers.sparse import CsrMatrix  # noqa: E402


def banded_system(n, k=1.2):
    rows = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    vals = np.concatenate([
        (4.0 - k**2 + 0.4j) * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)
    ]).astype(np.complex128)
    csr = CsrMatrix.from_triplets(rows, cols, vals, (n, n))
    x = np.linspace(0, 1, n)
    rhs = np.exp(-((x - 0.4) ** 2) / 0.01).astype(np.complex128)
    return csr, rhs


def main():
    n_dev = 8
    devices = jax.devices()
    assert len(devices) >= n_dev, "run with xla_force_host_platform_device_count=8"
    mesh = Mesh(np.asarray(devices[:n_dev]), ("dof",))

    n = 262144
    csr, rhs = banded_system(n)
    system = build_sharded_system(csr, rhs, n_dev, schwarz_overlap=None)
    config = KrylovConfig(max_iterations=240, tolerance=1e-12, restart=40)

    results = {}
    for name, solver in [("cgs2", gmres), ("ghysels_p1", gmres_pipelined_ghysels)]:
        solve = jax.jit(sharded_gmres_fn(mesh, config, solver=solver))
        sol = solve(system)
        sol.x.block_until_ready()  # compile + first run
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            sol = solve(system)
            sol.x.block_until_ready()
            times.append(time.perf_counter() - t0)
        t = min(times)
        x = np.asarray(unshard(sol.x, n))
        res = np.linalg.norm(csr.matvec(x) - rhs) / np.linalg.norm(rhs)
        results[name] = (t, int(sol.iterations), res)
        print(f"{name:12s}: {t*1e3:8.1f} ms/solve  iters={int(sol.iterations):4d}  "
              f"true_rel_res={res:.2e}  converged={bool(sol.converged)}")

    speedup = results["cgs2"][0] / results["ghysels_p1"][0]
    print(f"ghysels_p1 speedup over cgs2: {speedup:.3f}x "
          f"({'pipelined wins' if speedup > 1.05 else 'standard wins/tie'})")


if __name__ == "__main__":
    main()
