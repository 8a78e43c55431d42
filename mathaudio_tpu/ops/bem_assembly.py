"""Pallas kernel: pairwise double-layer (dG/dn_y) quadrature sums.

Computes, for all collocation points x_i and elements j,

    D[i, j] = sum_q w[j, q] * dG/dn_y(x_i, y[j, q])         (Helmholtz)
    D0[i, j] = sum_q w[j, q] * dG0/dn_y(x_i, y[j, q])       (Laplace)

— the inner O(N^2 nq) loop of the dense BEM assembly
(bem/assembly._assemble_jit) and of the Kirchhoff–Helmholtz field
evaluation. Tiling: grid over (TI x TJ) blocks; each program holds one
block of collocation points and one block of elements (all nq quadrature
points) in VMEM and runs pure VPU math (rsqrt/sin/cos on (TI, TJ)
tiles), writing complex tiles as separate f32 planes.

Layout rule (hard-won on the tunneled chip): every per-*element* (j)
input is passed pre-transposed with j in the minor/lane dimension —
yq as (nq*3, TJ), ny as (3, TJ), w as (nq, TJ) — so each in-kernel
slice is already a lane row vector and broadcasting against the
collocation column (TI, 1) is a free outer product. The original
(TJ, nq, 3) layout required a sublane->lane relayout per use; Mosaic
compiles each such transpose slowly enough (~30 s for ONE in a toy
kernel, measured 2026-08-17) that the full nq-unrolled kernel never
finished compiling — the round-1 "remote Mosaic compile hangs" was
exactly this, not a service limitation.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from mathaudio_tpu.xtypes import complex_dtype_for

_PI4 = 4.0 * np.pi


def _kernel(x_ref, nx_unused, yqT_ref, nyT_ref, wT_ref, k_ref,  # nx slot kept for the BM variant
            dkr_ref, dki_ref, d0_ref):
    # x: (TI, 3); yqT: (nq*3, TJ); nyT: (3, TJ); wT: (nq, TJ)
    # Static Python loop over the nq quadrature points: every intermediate
    # is a (TI, TJ) tile, and every element-side slice is already a lane
    # row vector (see module docstring) — no sublane->lane relayouts.
    nq = wT_ref.shape[0]
    k = k_ref[0, 0]
    nyx = nyT_ref[0, :][None, :]
    nyy = nyT_ref[1, :][None, :]
    nyz = nyT_ref[2, :][None, :]
    xx = x_ref[:, 0][:, None]
    xy = x_ref[:, 1][:, None]
    xz = x_ref[:, 2][:, None]

    acc_re = jnp.zeros(dkr_ref.shape, dkr_ref.dtype)
    acc_im = jnp.zeros(dkr_ref.shape, dkr_ref.dtype)
    acc_0 = jnp.zeros(dkr_ref.shape, dkr_ref.dtype)
    for q in range(nq):
        dx = yqT_ref[3 * q + 0, :][None, :] - xx  # (TI, TJ)
        dy = yqT_ref[3 * q + 1, :][None, :] - xy
        dz = yqT_ref[3 * q + 2, :][None, :] - xz
        r2 = dx * dx + dy * dy + dz * dz
        inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
        r = r2 * inv_r
        r_dot_n = dx * nyx + dy * nyy + dz * nyz
        kr = k * r
        c = jnp.cos(kr)
        s = jnp.sin(kr)
        wq = wT_ref[q, :][None, :]
        # dG/dn_y = (ik - 1/r) e^{ikr}/(4 pi r) (rv.n)/r
        common = (wq / _PI4) * r_dot_n * inv_r * inv_r
        acc_re += common * (-c * inv_r - k * s)
        acc_im += common * (k * c - s * inv_r)
        acc_0 += -common * inv_r
    dkr_ref[:] = acc_re
    dki_ref[:] = acc_im
    d0_ref[:] = acc_0


def pairwise_double_layer_pallas(x, yq, ny, w, k, tile_i: int = 128, tile_j: int = 128):
    """(D_k complex, D_0 real), shapes (Ni, Nj). Inputs padded to tiles."""
    ni, nj, nq = x.shape[0], yq.shape[0], yq.shape[1]
    pi = (-ni) % tile_i
    pj = (-nj) % tile_j
    x_p = jnp.pad(x, ((0, pi), (0, 0)))
    yq_p = jnp.pad(yq, ((0, pj), (0, 0), (0, 0)), constant_values=1e6)  # far away
    ny_p = jnp.pad(ny, ((0, pj), (0, 0)))
    w_p = jnp.pad(w, ((0, pj), (0, 0)))
    mi, mj = ni + pi, nj + pj
    k_arr = jnp.asarray([[k]], x.dtype)
    # Lane-oriented element inputs (module docstring): j minor everywhere.
    yqT = yq_p.transpose(1, 2, 0).reshape(nq * 3, mj)
    nyT = ny_p.T
    wT = w_p.T

    grid = (mi // tile_i, mj // tile_j)
    out_shape = [
        jax.ShapeDtypeStruct((mi, mj), x.dtype),
        jax.ShapeDtypeStruct((mi, mj), x.dtype),
        jax.ShapeDtypeStruct((mi, mj), x.dtype),
    ]
    in_specs = [
        pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0)),
        pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0)),  # unused normals slot
        pl.BlockSpec((nq * 3, tile_j), lambda i, j: (0, j)),
        pl.BlockSpec((3, tile_j), lambda i, j: (0, j)),
        pl.BlockSpec((nq, tile_j), lambda i, j: (0, j)),
        pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
    ]
    out_specs = [
        pl.BlockSpec((tile_i, tile_j), lambda i, j: (i, j)),
        pl.BlockSpec((tile_i, tile_j), lambda i, j: (i, j)),
        pl.BlockSpec((tile_i, tile_j), lambda i, j: (i, j)),
    ]
    dkr, dki, d0 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
    )(x_p, x_p, yqT, nyT, wT, k_arr)
    cd = complex_dtype_for(x.dtype)
    dk = (dkr + 1j * dki.astype(cd))[:ni, :nj]
    return dk, d0[:ni, :nj]


def pairwise_double_layer_xla(x, yq, ny, w, k):
    """Reference XLA implementation (identical semantics)."""
    cd = complex_dtype_for(x.dtype)
    rv = yq[None, :, :, :] - x[:, None, None, :]
    r2 = jnp.sum(rv * rv, axis=-1)
    r = jnp.sqrt(r2)
    inv_r = 1.0 / jnp.maximum(r, 1e-15)
    r_dot_n = jnp.sum(rv * ny[None, :, None, :], axis=-1)
    g = jnp.exp(1j * (k * r).astype(cd)) * (inv_r / _PI4).astype(cd)
    dg = (1j * k - inv_r.astype(cd)) * g * (r_dot_n * inv_r).astype(cd)
    d0 = -(inv_r**3) * r_dot_n / _PI4
    wb = w[None, :, :]
    return jnp.sum(dg * wb.astype(cd), axis=-1), jnp.sum(d0 * wb, axis=-1)


def pairwise_double_layer(x, yq, ny, w, k, force: str = "auto"):
    """Dispatch. History of a flipped default: the Pallas kernels beat
    the ONE-SHOT XLA assembly decisively in round 2 (bench chip
    2026-08-17, 4-kernel BM variant, nq=4, pipelined x8: N=10240 Pallas
    29.9 ms vs XLA 75.7 ms = 2.53x, and Pallas ran N=20480 where the
    (N, N, nq) one-shot XLA intermediates OOMed at 25 GB) and became the
    TPU f32 default. The ROW-CHUNKED XLA assembly added later removed
    the materialization the kernels existed to avoid, and the round-4
    driver-reproducible A/B (`bench.py --metric bem --ab-pallas`)
    measures XLA AHEAD in the full sweep: N=5120 89.5 vs 103.3 ms
    (0.866x), N=20480 254.3 vs 274.7 ms (0.926x), no OOM. XLA is the
    default again; the kernels stay tested and opt-in
    (MATHAUDIO_PALLAS=1 or force='pallas') — the same measured-decision
    treatment as gmres_pipelined and the Pallas DIA matvec. Matches XLA
    to 1e-12 (interpret) / f32 roundoff (chip)."""
    if _use_pallas(force, x.dtype):
        return pairwise_double_layer_pallas(x, yq, ny, w, k)
    return pairwise_double_layer_xla(x, yq, ny, w, k)


def _use_pallas(force: str, dtype) -> bool:
    if force == "pallas":
        return True
    if force != "auto" or jax.default_backend() != "tpu":
        return False
    if os.environ.get("MATHAUDIO_PALLAS") != "1":
        return False  # round-4 default: row-chunked XLA (see dispatch doc)
    # f64 never hits the MXU/VPU natively on TPU; keep the XLA path for it.
    return jnp.dtype(dtype) == jnp.float32


# ---------------------------------------------------------------------------
# Full Burton–Miller kernel set: D_k, D_0, T_k, T_0 in one pass
# (VERDICT r1 item 3: all four kernels + the nx slot filled).


def _bm_kernel(x_ref, nx_ref, yqT_ref, nyT_ref, wT_ref, k_ref,
               dkr_ref, dki_ref, d0_ref, tkr_ref, tki_ref, t0_ref):
    """Per-tile quadrature sums of the double layer dG/dn_y and the true
    hypersingular n_x.grad_x(n_y.grad_y G), Helmholtz + Laplace limits
    (the regularization pairs of bem/assembly._assemble_rows). Pure VPU
    math on (TI, TJ) tiles; the nq loop is a static Python unroll.
    Element inputs arrive lane-oriented (module docstring)."""
    nq = wT_ref.shape[0]
    k = k_ref[0, 0]
    nyx = nyT_ref[0, :][None, :]
    nyy = nyT_ref[1, :][None, :]
    nyz = nyT_ref[2, :][None, :]
    xx = x_ref[:, 0][:, None]
    xy = x_ref[:, 1][:, None]
    xz = x_ref[:, 2][:, None]
    nxx = nx_ref[:, 0][:, None]
    nxy = nx_ref[:, 1][:, None]
    nxz = nx_ref[:, 2][:, None]
    nxny = nxx * nyx + nxy * nyy + nxz * nyz

    z = jnp.zeros(dkr_ref.shape, dkr_ref.dtype)
    acc_dre, acc_dim, acc_d0 = z, z, z
    acc_tre, acc_tim, acc_t0 = z, z, z
    for q in range(nq):
        dx = yqT_ref[3 * q + 0, :][None, :] - xx
        dy = yqT_ref[3 * q + 1, :][None, :] - xy
        dz = yqT_ref[3 * q + 2, :][None, :] - xz
        r2 = dx * dx + dy * dy + dz * dz
        inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
        r = r2 * inv_r
        inv_r2 = inv_r * inv_r
        rny = dx * nyx + dy * nyy + dz * nyz
        rnx = dx * nxx + dy * nxy + dz * nxz
        kr = k * r
        c = jnp.cos(kr)
        s = jnp.sin(kr)
        wq = wT_ref[q, :][None, :]
        w4 = wq / _PI4
        # double layer: dG/dn_y = (ik - 1/r) e^{ikr}/(4 pi r) rny/r
        common = w4 * rny * inv_r2
        acc_dre += common * (-c * inv_r - k * s)
        acc_dim += common * (k * c - s * inv_r)
        acc_d0 += -common * inv_r
        # hypersingular: -(A + iB)(c + is)/(4 pi r) with
        # A = (-k^2 + 3/r^2) rnx rny / r^2 - nxny / r^2
        # B = -(3k/r) rnx rny / r^2 + k nxny / r
        rr = rnx * rny * inv_r2
        a_re = (3.0 * inv_r2 - k * k) * rr - nxny * inv_r2
        b_im = k * nxny * inv_r - 3.0 * k * rr * inv_r
        g4 = w4 * inv_r
        acc_tre += -g4 * (a_re * c - b_im * s)
        acc_tim += -g4 * (a_re * s + b_im * c)
        # Laplace limit: hyp0 = -(3 rnx rny / r^4 - nxny / r^2) / (4 pi r)
        acc_t0 += -g4 * (3.0 * rr * inv_r2 - nxny * inv_r2)
    dkr_ref[:] = acc_dre
    dki_ref[:] = acc_dim
    d0_ref[:] = acc_d0
    tkr_ref[:] = acc_tre
    tki_ref[:] = acc_tim
    t0_ref[:] = acc_t0


def pairwise_bm_pallas(x, nx, yq, ny, w, k, tile_i: int = 128, tile_j: int = 128):
    """(D_k, D_0, T_k, T_0), shapes (Ni, Nj); D_k/T_k complex."""
    ni, nj, nq = x.shape[0], yq.shape[0], yq.shape[1]
    pi = (-ni) % tile_i
    pj = (-nj) % tile_j
    x_p = jnp.pad(x, ((0, pi), (0, 0)))
    nx_p = jnp.pad(nx, ((0, pi), (0, 0)))
    yq_p = jnp.pad(yq, ((0, pj), (0, 0), (0, 0)), constant_values=1e6)  # far away
    ny_p = jnp.pad(ny, ((0, pj), (0, 0)))
    w_p = jnp.pad(w, ((0, pj), (0, 0)))
    mi, mj = ni + pi, nj + pj
    k_arr = jnp.asarray([[k]], x.dtype)
    yqT = yq_p.transpose(1, 2, 0).reshape(nq * 3, mj)
    nyT = ny_p.T
    wT = w_p.T

    grid = (mi // tile_i, mj // tile_j)
    out_shape = [jax.ShapeDtypeStruct((mi, mj), x.dtype) for _ in range(6)]
    in_specs = [
        pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0)),
        pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0)),
        pl.BlockSpec((nq * 3, tile_j), lambda i, j: (0, j)),
        pl.BlockSpec((3, tile_j), lambda i, j: (0, j)),
        pl.BlockSpec((nq, tile_j), lambda i, j: (0, j)),
        pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
    ]
    out_specs = [pl.BlockSpec((tile_i, tile_j), lambda i, j: (i, j)) for _ in range(6)]
    dkr, dki, d0, tkr, tki, t0 = pl.pallas_call(
        _bm_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
    )(x_p, nx_p, yqT, nyT, wT, k_arr)
    cd = complex_dtype_for(x.dtype)
    dk = (dkr + 1j * dki.astype(cd))[:ni, :nj]
    tk = (tkr + 1j * tki.astype(cd))[:ni, :nj]
    return dk, d0[:ni, :nj], tk, t0[:ni, :nj]


def pairwise_bm_xla(x, nx, yq, ny, w, k):
    """Reference XLA implementation of the four-kernel pass (identical
    semantics to bem/assembly's inline math)."""
    from mathaudio_tpu.bem.assembly import _pair_kernels, _static_pair_kernels

    cd = complex_dtype_for(x.dtype)
    xb = x[:, None, None, :]
    nxb = nx[:, None, None, :]
    yb = yq[None, :, :, :]
    nyb = ny[None, :, None, :]
    dg, hyp = _pair_kernels(xb, nxb, yb, nyb, k)
    dg0, hyp0 = _static_pair_kernels(xb, nxb, yb, nyb)
    wc = w[None, :, :].astype(cd)
    w0 = w[None, :, :]
    return (
        jnp.sum(dg * wc, axis=-1),
        jnp.sum(dg0 * w0, axis=-1),
        jnp.sum(hyp * wc, axis=-1),
        jnp.sum(hyp0 * w0, axis=-1),
    )


def pairwise_bm(x, nx, yq, ny, w, k, force: str = "auto"):
    """Dispatch for the Burton–Miller kernel set (same policy as
    pairwise_double_layer: Pallas by default on TPU f32)."""
    if _use_pallas(force, x.dtype):
        return pairwise_bm_pallas(x, nx, yq, ny, w, k)
    return pairwise_bm_xla(x, nx, yq, ny, w, k)


# ---------------------------------------------------------------------------
# Mixed-BC kernel set: D_k, D_0, S_k (+ T_k, T_0, K'_k with Burton–Miller)
# in one pass — everything bem/assembly._mixed_rows needs off-diagonal
# (VERDICT r2 item 5: route radiating/impedance assembly through Pallas).


def _mixed_kernel(with_bm, x_ref, nx_ref, yqT_ref, nyT_ref, wT_ref, k_ref,
                  *out_refs):
    """Per-tile quadrature sums for the mixed velocity/pressure system
    (tbem.rs:234-340 BC-dependent columns): double layer D (Helmholtz +
    Laplace), single layer S, and with ``with_bm`` the hypersingular T
    (both limits) and the adjoint double layer K' = dG/dn_x. Same
    lane-oriented element layout and static nq unroll as _bm_kernel."""
    if with_bm:
        (dkr_ref, dki_ref, d0_ref, skr_ref, ski_ref,
         tkr_ref, tki_ref, t0_ref, kpr_ref, kpi_ref) = out_refs
    else:
        dkr_ref, dki_ref, d0_ref, skr_ref, ski_ref = out_refs
    nq = wT_ref.shape[0]
    k = k_ref[0, 0]
    nyx = nyT_ref[0, :][None, :]
    nyy = nyT_ref[1, :][None, :]
    nyz = nyT_ref[2, :][None, :]
    xx = x_ref[:, 0][:, None]
    xy = x_ref[:, 1][:, None]
    xz = x_ref[:, 2][:, None]
    nxx = nx_ref[:, 0][:, None]
    nxy = nx_ref[:, 1][:, None]
    nxz = nx_ref[:, 2][:, None]
    if with_bm:
        nxny = nxx * nyx + nxy * nyy + nxz * nyz

    z = jnp.zeros(dkr_ref.shape, dkr_ref.dtype)
    acc_dre, acc_dim, acc_d0 = z, z, z
    acc_sre, acc_sim = z, z
    if with_bm:
        acc_tre, acc_tim, acc_t0 = z, z, z
        acc_kre, acc_kim = z, z
    for q in range(nq):
        dx = yqT_ref[3 * q + 0, :][None, :] - xx
        dy = yqT_ref[3 * q + 1, :][None, :] - xy
        dz = yqT_ref[3 * q + 2, :][None, :] - xz
        r2 = dx * dx + dy * dy + dz * dz
        inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
        r = r2 * inv_r
        inv_r2 = inv_r * inv_r
        rny = dx * nyx + dy * nyy + dz * nyz
        kr = k * r
        c = jnp.cos(kr)
        s = jnp.sin(kr)
        wq = wT_ref[q, :][None, :]
        w4 = wq / _PI4
        # double layer dG/dn_y = (ik - 1/r) e^{ikr}/(4 pi r) rny/r
        common = w4 * rny * inv_r2
        acc_dre += common * (-c * inv_r - k * s)
        acc_dim += common * (k * c - s * inv_r)
        acc_d0 += -common * inv_r
        # single layer w G = (w/(4 pi r)) (c + i s)
        g4 = w4 * inv_r
        acc_sre += g4 * c
        acc_sim += g4 * s
        if with_bm:
            rnx = dx * nxx + dy * nxy + dz * nxz
            # hypersingular (see _bm_kernel)
            rr = rnx * rny * inv_r2
            a_re = (3.0 * inv_r2 - k * k) * rr - nxny * inv_r2
            b_im = k * nxny * inv_r - 3.0 * k * rr * inv_r
            acc_tre += -g4 * (a_re * c - b_im * s)
            acc_tim += -g4 * (a_re * s + b_im * c)
            acc_t0 += -g4 * (3.0 * rr * inv_r2 - nxny * inv_r2)
            # adjoint double layer dG/dn_x = -(ik - 1/r) e^{ikr}/(4 pi r) rnx/r
            ck = w4 * rnx * inv_r2
            acc_kre += ck * (c * inv_r + k * s)
            acc_kim += ck * (s * inv_r - k * c)
    dkr_ref[:] = acc_dre
    dki_ref[:] = acc_dim
    d0_ref[:] = acc_d0
    skr_ref[:] = acc_sre
    ski_ref[:] = acc_sim
    if with_bm:
        tkr_ref[:] = acc_tre
        tki_ref[:] = acc_tim
        t0_ref[:] = acc_t0
        kpr_ref[:] = acc_kre
        kpi_ref[:] = acc_kim


def pairwise_mixed_pallas(x, nx, yq, ny, w, k, with_bm: bool,
                          tile_i: int = 128, tile_j: int = 128):
    """(D_k, D_0, S_k, T_k, T_0, K'_k) with shapes (Ni, Nj); the last
    three are None when ``with_bm`` is False."""
    ni, nj, nq = x.shape[0], yq.shape[0], yq.shape[1]
    pi = (-ni) % tile_i
    pj = (-nj) % tile_j
    x_p = jnp.pad(x, ((0, pi), (0, 0)))
    nx_p = jnp.pad(nx, ((0, pi), (0, 0)))
    yq_p = jnp.pad(yq, ((0, pj), (0, 0), (0, 0)), constant_values=1e6)  # far away
    ny_p = jnp.pad(ny, ((0, pj), (0, 0)))
    w_p = jnp.pad(w, ((0, pj), (0, 0)))
    mi, mj = ni + pi, nj + pj
    k_arr = jnp.asarray([[k]], x.dtype)
    yqT = yq_p.transpose(1, 2, 0).reshape(nq * 3, mj)
    nyT = ny_p.T
    wT = w_p.T

    grid = (mi // tile_i, mj // tile_j)
    n_out = 10 if with_bm else 5
    out_shape = [jax.ShapeDtypeStruct((mi, mj), x.dtype) for _ in range(n_out)]
    in_specs = [
        pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0)),
        pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0)),
        pl.BlockSpec((nq * 3, tile_j), lambda i, j: (0, j)),
        pl.BlockSpec((3, tile_j), lambda i, j: (0, j)),
        pl.BlockSpec((nq, tile_j), lambda i, j: (0, j)),
        pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
    ]
    out_specs = [pl.BlockSpec((tile_i, tile_j), lambda i, j: (i, j))
                 for _ in range(n_out)]
    outs = pl.pallas_call(
        partial(_mixed_kernel, with_bm),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
    )(x_p, nx_p, yqT, nyT, wT, k_arr)
    cd = complex_dtype_for(x.dtype)

    def cpx(re, im):
        return (re + 1j * im.astype(cd))[:ni, :nj]

    if with_bm:
        dkr, dki, d0, skr, ski, tkr, tki, t0, kpr, kpi = outs
        return (cpx(dkr, dki), d0[:ni, :nj], cpx(skr, ski),
                cpx(tkr, tki), t0[:ni, :nj], cpx(kpr, kpi))
    dkr, dki, d0, skr, ski = outs
    return cpx(dkr, dki), d0[:ni, :nj], cpx(skr, ski), None, None, None


def pairwise_mixed_xla(x, nx, yq, ny, w, k, with_bm: bool):
    """Reference XLA implementation (the math previously inlined in
    bem/assembly._mixed_rows)."""
    from mathaudio_tpu.bem.assembly import _pair_kernels, _static_pair_kernels

    cd = complex_dtype_for(x.dtype)
    xb = x[:, None, None, :]
    nxb = nx[:, None, None, :]
    yb = yq[None, :, :, :]
    nyb = ny[None, :, None, :]
    dg, hyp = _pair_kernels(xb, nxb, yb, nyb, k)
    dg0, hyp0 = _static_pair_kernels(xb, nxb, yb, nyb)
    wc = w[None, :, :].astype(cd)
    w0 = w[None, :, :]
    rv = yb - xb
    r = jnp.sqrt(jnp.sum(rv * rv, axis=-1))
    rs = jnp.where(r < 1e-15, 1.0, r)
    g = jnp.exp(1j * (k * rs).astype(cd)) / (_PI4 * rs)
    s_mat = jnp.sum(g * wc, axis=-1)
    d_mat = jnp.sum(dg * wc, axis=-1)
    d0_mat = jnp.sum(dg0 * w0, axis=-1)
    if not with_bm:
        return d_mat, d0_mat, s_mat, None, None, None
    ik = jnp.asarray(1j * k, cd)
    r_dot_nx = jnp.sum(rv * nxb, axis=-1)
    kp = -(ik - 1.0 / rs) * g * r_dot_nx / rs
    return (
        d_mat,
        d0_mat,
        s_mat,
        jnp.sum(hyp * wc, axis=-1),
        jnp.sum(hyp0 * w0, axis=-1),
        jnp.sum(kp * wc, axis=-1),
    )


def pairwise_mixed(x, nx, yq, ny, w, k, with_bm: bool, force: str = "auto"):
    """Dispatch for the mixed-BC kernel set (Pallas by default on TPU
    f32, same policy as pairwise_double_layer)."""
    if _use_pallas(force, x.dtype):
        return pairwise_mixed_pallas(x, nx, yq, ny, w, k, with_bm)
    return pairwise_mixed_xla(x, nx, yq, ny, w, k, with_bm)


# ---------------------------------------------------------------------------
# Kirchhoff–Helmholtz field-evaluation kernel: single layer S = sum_q w G and
# double layer D = sum_q w dG/dn_y in one pass, for exterior field points
# (bem/postprocess._kh_rows; math-bem/src/core/postprocess/pressure.rs).


def _kh_kernel(want_single, x_ref, yqT_ref, nyT_ref, wT_ref, k_ref, *out_refs):
    """(TI, TJ) tiles of S (Helmholtz single layer) and D (double layer).
    Same lane-oriented element layout and static nq unroll as _kernel;
    field points are exterior so no regularization planes are needed.
    ``want_single=False`` (rigid scatterers, q = dp/dn = 0) drops the two
    S output planes entirely — unlike XLA, Pallas outputs cannot be
    dead-code-eliminated downstream."""
    if want_single:
        skr_ref, ski_ref, dkr_ref, dki_ref = out_refs
    else:
        dkr_ref, dki_ref = out_refs
    nq = wT_ref.shape[0]
    k = k_ref[0, 0]
    nyx = nyT_ref[0, :][None, :]
    nyy = nyT_ref[1, :][None, :]
    nyz = nyT_ref[2, :][None, :]
    xx = x_ref[:, 0][:, None]
    xy = x_ref[:, 1][:, None]
    xz = x_ref[:, 2][:, None]

    z = jnp.zeros(dkr_ref.shape, dkr_ref.dtype)
    acc_sre, acc_sim, acc_dre, acc_dim = z, z, z, z
    for q in range(nq):
        dx = yqT_ref[3 * q + 0, :][None, :] - xx
        dy = yqT_ref[3 * q + 1, :][None, :] - xy
        dz = yqT_ref[3 * q + 2, :][None, :] - xz
        r2 = dx * dx + dy * dy + dz * dz
        inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
        r = r2 * inv_r
        rny = dx * nyx + dy * nyy + dz * nyz
        kr = k * r
        c = jnp.cos(kr)
        s = jnp.sin(kr)
        wq = wT_ref[q, :][None, :]
        g4 = (wq / _PI4) * inv_r  # w |G| = w/(4 pi r)
        if want_single:
            # single layer: w G = g4 (c + i s)
            acc_sre += g4 * c
            acc_sim += g4 * s
        # double layer: w dG/dn_y = g4 (ik - 1/r)(c + i s) rny / r
        common = g4 * rny * inv_r
        acc_dre += common * (-c * inv_r - k * s)
        acc_dim += common * (k * c - s * inv_r)
    if want_single:
        skr_ref[:] = acc_sre
        ski_ref[:] = acc_sim
    dkr_ref[:] = acc_dre
    dki_ref[:] = acc_dim


def pairwise_kh_pallas(x, yq, ny, w, k, tile_i: int = 128, tile_j: int = 128,
                       want_single: bool = True):
    """(S complex, D complex), shapes (Ni, Nj); S is None when
    ``want_single=False`` (the kernel then writes only the D planes)."""
    ni, nj, nq = x.shape[0], yq.shape[0], yq.shape[1]
    pi = (-ni) % tile_i
    pj = (-nj) % tile_j
    x_p = jnp.pad(x, ((0, pi), (0, 0)))
    yq_p = jnp.pad(yq, ((0, pj), (0, 0), (0, 0)), constant_values=1e6)  # far away
    ny_p = jnp.pad(ny, ((0, pj), (0, 0)))
    w_p = jnp.pad(w, ((0, pj), (0, 0)))
    mi, mj = ni + pi, nj + pj
    k_arr = jnp.asarray([[k]], x.dtype)
    yqT = yq_p.transpose(1, 2, 0).reshape(nq * 3, mj)
    nyT = ny_p.T
    wT = w_p.T

    grid = (mi // tile_i, mj // tile_j)
    n_out = 4 if want_single else 2
    out_shape = [jax.ShapeDtypeStruct((mi, mj), x.dtype) for _ in range(n_out)]
    in_specs = [
        pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0)),
        pl.BlockSpec((nq * 3, tile_j), lambda i, j: (0, j)),
        pl.BlockSpec((3, tile_j), lambda i, j: (0, j)),
        pl.BlockSpec((nq, tile_j), lambda i, j: (0, j)),
        pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
    ]
    out_specs = [pl.BlockSpec((tile_i, tile_j), lambda i, j: (i, j))
                 for _ in range(n_out)]
    outs = pl.pallas_call(
        partial(_kh_kernel, want_single),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
    )(x_p, yqT, nyT, wT, k_arr)
    cd = complex_dtype_for(x.dtype)
    if want_single:
        skr, ski, dkr, dki = outs
        s_mat = (skr + 1j * ski.astype(cd))[:ni, :nj]
    else:
        (dkr, dki), s_mat = outs, None
    d_mat = (dkr + 1j * dki.astype(cd))[:ni, :nj]
    return s_mat, d_mat


def pairwise_kh_xla(x, yq, ny, w, k):
    """Reference XLA implementation (identical semantics to the inline
    math previously in bem/postprocess._kh_rows). Always returns both
    matrices: an unused S is dead-code-eliminated by XLA under jit."""
    cd = complex_dtype_for(x.dtype)
    rv = yq[None, :, :, :] - x[:, None, None, :]
    r2 = jnp.sum(rv * rv, axis=-1)
    r = jnp.sqrt(r2)
    rs = jnp.where(r < 1e-15, 1.0, r)
    g = jnp.exp(1j * (k * rs).astype(cd)) * (1.0 / (_PI4 * rs)).astype(cd)
    ik = jnp.asarray(1j * k, cd)
    r_dot_ny = jnp.sum(rv * ny[None, :, None, :], axis=-1)
    dg = (ik - (1.0 / rs).astype(cd)) * g * (r_dot_ny / rs).astype(cd)
    wb = w[None, :, :].astype(cd)
    return jnp.sum(g * wb, axis=-1), jnp.sum(dg * wb, axis=-1)


def pairwise_kh(x, yq, ny, w, k, force: str = "auto", want_single: bool = True):
    """Dispatch for the field-evaluation kernel pair (same policy as
    pairwise_double_layer: Pallas by default on TPU f32). Rigid-scatterer
    callers (q = dp/dn = 0) pass ``want_single=False`` so the Pallas path
    never materializes the unused single-layer planes."""
    if _use_pallas(force, x.dtype):
        return pairwise_kh_pallas(x, yq, ny, w, k, want_single=want_single)
    return pairwise_kh_xla(x, yq, ny, w, k)
