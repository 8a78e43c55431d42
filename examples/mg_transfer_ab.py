"""A/B/C microbench of the node-major multigrid transfer lowerings.

The roofline (examples/fem_roofline_nm.py) shows the V-cycle is ~80% of
the headline sweep and its prolong/restrict passes run ~10x off the
streaming floor (reads+writes ~0.5 ms at copy BW vs ~4-5 ms measured for
both the gather and the separable-matmul forms). Three lowerings of the
SAME operator (trilinear P / full-weighting R = P^T):

  gather : padded row-gather stencils (p_idx/r_idx) — production default
  tp     : separable per-axis einsum matmuls (pads 21/41-sized grid axes
           to 128 MXU tiles — suspected source of the 4-5 ms)
  stream : separable per-axis slice/interleave on the VPU
           (fem/multigrid_batched._prolong_stream/_restrict_stream)

Usage: python examples/mg_transfer_ab.py [--n 20] [--freqs 2048]
       [--device tpu|cpu]
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
    ap.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--freqs", type=int, default=2048)
    ap.add_argument("--repeats", type=int, default=20)
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.lax as lax
    import jax.numpy as jnp

    from mathaudio_tpu.fem.multigrid import (
        GeometricMultigrid,
        box_grid_dims,
        box_hierarchy,
    )
    from mathaudio_tpu.fem.multigrid_batched import (
        _prolong_b,
        _prolong_stream,
        _prolong_tp,
        _restrict_b,
        _restrict_stream,
        _restrict_tp,
    )
    from mathaudio_tpu.models import RoomSweepModel
    from mathaudio_tpu.models.room_sweep_nm import NodeMajorRoomSweep

    F, R = args.freqs, args.repeats
    meshes = box_hierarchy(args.n, 3)
    mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
    model = RoomSweepModel(
        meshes[0], wall_tags=(1, 2, 3, 4, 5, 6), absorption=0.15,
        listening_positions=((0.25, 0.25, 0.25),), assembler=mg.assemblers[0],
    )
    nm = NodeMajorRoomSweep(model, mg)
    params = nm.params()
    lvl0 = params.levels[0]
    tp0 = params.tp[0] if params.tp else ()
    dims_f = box_grid_dims(meshes[0])
    dims_c = box_grid_dims(meshes[1])
    nf_nodes = meshes[0].num_nodes
    nc_nodes = meshes[1].num_nodes
    cd = params.rhs.dtype
    print(f"# fine {dims_f} = {nf_nodes} nodes, coarse {dims_c} = {nc_nodes}, "
          f"F={F}, dtype={cd}")

    # correctness first (small random, vs the gather stencil)
    rng = np.random.default_rng(0)
    xc_np = rng.standard_normal((nc_nodes, 4)) + 1j * rng.standard_normal((nc_nodes, 4))
    rf_np = rng.standard_normal((nf_nodes, 4)) + 1j * rng.standard_normal((nf_nodes, 4))
    # complex never crosses the tunnel: recombine re/im planes in-trace
    _mk = jax.jit(lambda a, b: (a + 1j * b).astype(cd))
    xc_s = _mk(jnp.asarray(xc_np.real, jnp.float32), jnp.asarray(xc_np.imag, jnp.float32))
    rf_s = _mk(jnp.asarray(rf_np.real, jnp.float32), jnp.asarray(rf_np.imag, jnp.float32))
    @jax.jit
    def _rel_errs(xc, rf):
        p_ref = _prolong_b(lvl0, xc)
        p_new = _prolong_stream(dims_c, xc)
        r_ref = _restrict_b(lvl0, rf, nc_nodes)
        r_new = _restrict_stream(dims_f, rf)
        ep = jnp.max(jnp.abs(p_new - p_ref)) / jnp.maximum(jnp.max(jnp.abs(p_ref)), 1e-30)
        er = jnp.max(jnp.abs(r_new - r_ref)) / jnp.maximum(jnp.max(jnp.abs(r_ref)), 1e-30)
        return ep.astype(jnp.float32), er.astype(jnp.float32)

    ep, er = (float(v) for v in _rel_errs(xc_s, rf_s))
    print(f"# stream vs gather: prolong rel {ep:.2e}, restrict rel {er:.2e}")
    assert ep < 1e-5 and er < 1e-5, "stream transfer does not match the stencil"

    # timing at bench shape
    xc0 = jax.jit(lambda: (jnp.ones((nc_nodes, F), jnp.float32) / nc_nodes).astype(cd))()
    rf0 = jax.jit(lambda: (jnp.ones((nf_nodes, F), jnp.float32) / nf_nodes).astype(cd))()
    _sync_jit = jax.jit(lambda o: jnp.sum(jnp.real(o)).astype(jnp.float32))

    def _sync(out):
        return float(_sync_jit(out))

    tiny = jax.jit(lambda: jnp.zeros((8,), jnp.float32))()
    _sync(tiny)
    t_fetch = min(
        (lambda t0: (_sync(tiny), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(5)
    )

    def timed(fn, *a):
        out = fn(*a)
        _sync(out)
        t0 = time.perf_counter()
        out = fn(*a)
        _sync(out)
        return max((time.perf_counter() - t0 - t_fetch) / R, 1e-9)

    def loop(body, x0):
        @jax.jit
        def fn(x):
            return lax.fori_loop(
                0, R, lambda i, x: body(x) * (1.0 / (1.0 + 1e-9 * i)), x
            )

        return fn

    # prolong variants: (N_c, F) -> scalar-perturbed (N_c, F) round trips
    # are impossible (shapes change), so perturb the INPUT from the output
    def p_round(p_fn):
        def body(xc):
            xf = p_fn(xc)
            return xc * (1.0 + 1e-9 * jnp.real(xf[0, 0]))

        return loop(body, xc0)

    def r_round(r_fn):
        def body(rf):
            rc = r_fn(rf)
            return rf * (1.0 + 1e-9 * jnp.real(rc[0, 0]))

        return loop(body, rf0)

    rows = []
    for name, p_fn, r_fn in (
        ("gather", lambda xc: _prolong_b(lvl0, xc),
         lambda rf: _restrict_b(lvl0, rf, nc_nodes)),
        ("tp", (lambda xc: _prolong_tp(tp0, xc)) if tp0 else None,
         (lambda rf: _restrict_tp(tp0, rf)) if tp0 else None),
        ("stream", lambda xc: _prolong_stream(dims_c, xc),
         lambda rf: _restrict_stream(dims_f, rf)),
    ):
        if p_fn is None:
            continue
        tp_ms = timed(p_round(p_fn), xc0) * 1e3
        tr_ms = timed(r_round(r_fn), rf0) * 1e3
        rows.append((name, tp_ms, tr_ms))
        print(f"{name:7s}: prolong {tp_ms:6.2f} ms  restrict {tr_ms:6.2f} ms")

    base = rows[0]
    for name, tp_ms, tr_ms in rows[1:]:
        print(f"# {name} vs gather: prolong {base[1]/tp_ms:.2f}x, "
              f"restrict {base[2]/tr_ms:.2f}x")


if __name__ == "__main__":
    main()
