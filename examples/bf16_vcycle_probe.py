"""Probe: can the V-cycle preconditioner run its interior in bf16 planes?

The roofline shows the V-cycle is ~80% of the headline sweep and is pure
HBM traffic (matvecs + transfers + smoothing passes over (N, F) c64
arrays). A preconditioner does not need f32: applying it in bf16 only
perturbs M^-1 by ~1e-2 relative, and GMRES's outer true-residual restart
guards accuracy. Complex-bf16 doesn't exist, so the candidate layout is
TWO SEPARATE bf16 planes (xr, xi) — all complex arithmetic explicit,
no lane mixing, half the bytes of c64.

This measures the candidate pieces at bench shape vs the c64 production
forms:
  M1  c64 DIA matvec              (production, 3.2 ms measured)
  M2  bf16-plane DIA matvec       (same 15 shifted slices on 2 planes)
  T1  c64 stream restrict+prolong (multigrid_batched stream forms)
  T2  bf16-plane stream restrict+prolong

Usage: python examples/bf16_vcycle_probe.py [--n 20] [--freqs 2048]
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

    from mathaudio_tpu.fem.dia import _pad_amount, dia_matvec
    from mathaudio_tpu.fem.multigrid import GeometricMultigrid, box_grid_dims, box_hierarchy
    from mathaudio_tpu.fem.multigrid_batched import _prolong_stream, _restrict_stream
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
    tables = params.fine_tables
    offsets = nm.offsets[0]
    dims_f = box_grid_dims(meshes[0])
    dims_c = box_grid_dims(meshes[1])
    N, Nc = meshes[0].num_nodes, meshes[1].num_nodes
    cd = params.rhs.dtype
    ks = jnp.linspace(0.55, 2.2, F, dtype=model.dtype)
    print(f"# N={N}, F={F}, c64 vector = {N*F*8/1e6:.0f} MB; bf16 plane pair = {N*F*4/1e6:.0f} MB")

    def _scalars(kk):
        k = kk.astype(cd)
        return k * k, jnp.asarray(-1j * 0.15, cd) * k

    x0 = jax.jit(lambda: (jnp.ones((N, F), jnp.float32) / N).astype(cd))()
    xr0 = jax.jit(lambda: (jnp.ones((N, F), jnp.bfloat16) / N))()
    xi0 = jax.jit(lambda: (jnp.ones((N, F), jnp.bfloat16) / (2 * N)))()
    xcr0 = jax.jit(lambda: (jnp.ones((Nc, F), jnp.bfloat16) / Nc))()
    rfr0 = jax.jit(lambda: (jnp.ones((N, F), jnp.bfloat16) / N))()
    xc0 = jax.jit(lambda: (jnp.ones((Nc, F), jnp.float32) / Nc).astype(cd))()
    rf0 = jax.jit(lambda: (jnp.ones((N, F), jnp.float32) / N).astype(cd))()

    _sync_jit = jax.jit(lambda o: jnp.sum(jnp.asarray(o, jnp.float32)
                                          if not jnp.iscomplexobj(o)
                                          else jnp.real(o).astype(jnp.float32)))

    def _sync(out):
        if isinstance(out, tuple):
            out = out[0]
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

    # --- M1: production c64 matvec ---
    @jax.jit
    def m1(x, tabs, kk):
        cmv, cbv = _scalars(kk)

        def body(i, x):
            return dia_matvec(offsets, tabs, cmv, cbv, x) * (1.0 / (1.0 + 1e-9 * i))

        return lax.fori_loop(0, R, body, x)

    t1 = timed(m1, x0, tables, ks)
    print(f"M1 c64 matvec        : {t1*1e3:6.2f} ms/pass")

    # --- M2: bf16-plane matvec (explicit complex on two planes) ---
    tk16 = jax.jit(lambda t: t.astype(jnp.bfloat16))(tables.k)
    tm16 = jax.jit(lambda t: t.astype(jnp.bfloat16))(tables.m)
    tb16 = jax.jit(lambda t: t.astype(jnp.bfloat16))(tables.b)

    def mv_planes(tk, tm, tb, cmr, cmi, cbr, cbi, xr, xi):
        n = xr.shape[0]
        pad = _pad_amount(offsets)
        xpr = jnp.pad(xr, ((pad, pad), (0, 0)))
        xpi = jnp.pad(xi, ((pad, pad), (0, 0)))
        akr = jnp.zeros_like(xr)
        aki = jnp.zeros_like(xi)
        amr = jnp.zeros_like(xr)
        ami = jnp.zeros_like(xi)
        abr = jnp.zeros_like(xr)
        abi = jnp.zeros_like(xi)
        for d, off in enumerate(offsets):
            sr = jax.lax.dynamic_slice_in_dim(xpr, pad + off, n, axis=0)
            si = jax.lax.dynamic_slice_in_dim(xpi, pad + off, n, axis=0)
            akr = akr + tk[d][:, None] * sr
            aki = aki + tk[d][:, None] * si
            amr = amr + tm[d][:, None] * sr
            ami = ami + tm[d][:, None] * si
            abr = abr + tb[d][:, None] * sr
            abi = abi + tb[d][:, None] * si
        yr = akr - (cmr * amr - cmi * ami) + (cbr * abr - cbi * abi)
        yi = aki - (cmr * ami + cmi * amr) + (cbr * abi + cbi * abr)
        return yr, yi

    @jax.jit
    def m2(xr, xi, tk, tm, tb, kk):
        cm, cb = _scalars(kk)
        cmr = jnp.real(cm).astype(jnp.bfloat16)[None, :]
        cmi = jnp.imag(cm).astype(jnp.bfloat16)[None, :]
        cbr = jnp.real(cb).astype(jnp.bfloat16)[None, :]
        cbi = jnp.imag(cb).astype(jnp.bfloat16)[None, :]

        def body(i, c):
            xr, xi = c
            yr, yi = mv_planes(tk, tm, tb, cmr, cmi, cbr, cbi, xr, xi)
            s = jnp.bfloat16(1.0)
            return yr * s, yi * s

        return lax.fori_loop(0, R, body, (xr, xi))

    t2 = timed(m2, xr0, xi0, tk16, tm16, tb16, ks)
    print(f"M2 bf16-plane matvec : {t2*1e3:6.2f} ms/pass  ({t1/t2:.2f}x vs c64)")

    # --- T1/T2: stream transfers c64 vs bf16 planes ---
    def loop_inp(body):
        @jax.jit
        def fn(x):
            return lax.fori_loop(0, R, lambda i, x: body(x) * (1 + 1e-9 * i).astype(x.dtype)
                                 if hasattr((1 + 1e-9 * i), "astype") else body(x), x)

        return fn

    @jax.jit
    def t_r1(rf):
        def body(i, rf):
            rc = _restrict_stream(dims_f, rf)
            return rf * (1.0 + 1e-9 * jnp.real(rc[0, 0]))

        return lax.fori_loop(0, R, body, rf)

    @jax.jit
    def t_r2(rfr):
        def body(i, rfr):
            rc = _restrict_stream(dims_f, rfr)
            return rfr * (jnp.bfloat16(1.0) + jnp.bfloat16(1e-6) * rc[0, 0])

        return lax.fori_loop(0, R, body, rfr)

    @jax.jit
    def t_p1(xc):
        def body(i, xc):
            xf = _prolong_stream(dims_c, xc)
            return xc * (1.0 + 1e-9 * jnp.real(xf[0, 0]))

        return lax.fori_loop(0, R, body, xc)

    @jax.jit
    def t_p2(xcr):
        def body(i, xcr):
            xf = _prolong_stream(dims_c, xcr)
            return xcr * (jnp.bfloat16(1.0) + jnp.bfloat16(1e-6) * xf[0, 0])

        return lax.fori_loop(0, R, body, xcr)

    tr1 = timed(t_r1, rf0)
    tr2 = timed(t_r2, rfr0)
    tp1 = timed(t_p1, xc0)
    tp2 = timed(t_p2, xcr0)
    print(f"T1 c64 stream restrict : {tr1*1e3:6.2f} ms  prolong {tp1*1e3:6.2f} ms")
    print(f"T2 bf16 plane restrict : {tr2*1e3:6.2f} ms  prolong {tp2*1e3:6.2f} ms"
          f"  (x2 planes -> {2*tr2*1e3:.2f}/{2*tp2*1e3:.2f} ms effective)")


if __name__ == "__main__":
    main()
