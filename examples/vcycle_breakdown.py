"""Production-config V-cycle breakdown + Galerkin-fused transfer probes.

The node-major roofline (fem_roofline_nm.py) attributes ~83% of the
headline sweep to the V-cycle preconditioner (21.8 ms/application at
n=20, F=2048) — but it probes the tp (separable-matmul) transfer path,
not the production gather path. This diagnostic times the V-cycle's
pieces in the PRODUCTION configuration (gather transfers, fused
diagonals, anchored coarse inverses) and probes two fusion candidates:

  G1 "fused restrict":  rc = R r - (R A) x        (one coarse-row gather
      over x replaces the fine residual matvec + separate restrict)
  G2 "fused correction": post-residual = res - (A P) xc   (a fine-row
      gather over xc replaces prolong + second fine matvec)

Both (R A) and (A P) are host-precomposed sparse stencils over the SAME
three frequency-shared real tables as the DIA operator (K/M/B planes
with per-lane scalars), so the frequency-scalar combine still never
materializes per-frequency values.

Usage: python examples/vcycle_breakdown.py [--n 20] [--freqs 2048]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compose_ra(offsets, tabs_np, r_idx, r_w):
    """Host: (R A) as a coarse-row gather stencil over fine columns.

    A[f, f+o_d] = tab[d, f] (three planes k/m/b); R[c, f] = r_w[c, s]
    at f = r_idx[c, s]. Returns (idx (N_c, K2), wk, wm, wb (N_c, K2)).
    """
    n_c, _ = r_idx.shape
    n = tabs_np[0].shape[1]
    idx_rows, w_rows = [], []
    for c in range(n_c):
        cols = {}
        for s in range(r_idx.shape[1]):
            w = r_w[c, s]
            if w == 0.0:
                continue
            f = int(r_idx[c, s])
            for d, o in enumerate(offsets):
                j = f + o
                if 0 <= j < n:
                    acc = cols.setdefault(j, [0.0, 0.0, 0.0])
                    acc[0] += w * tabs_np[0][d, f]
                    acc[1] += w * tabs_np[1][d, f]
                    acc[2] += w * tabs_np[2][d, f]
        items = sorted(cols.items())
        idx_rows.append([j for j, _ in items])
        w_rows.append([v for _, v in items])
    k2 = max(len(r) for r in idx_rows)
    idx = np.zeros((n_c, k2), np.int32)
    wk = np.zeros((n_c, k2)); wm = np.zeros((n_c, k2)); wb = np.zeros((n_c, k2))
    for c, (ir, wr) in enumerate(zip(idx_rows, w_rows)):
        idx[c, : len(ir)] = ir
        for s, (a, b, bb) in enumerate(wr):
            wk[c, s], wm[c, s], wb[c, s] = a, b, bb
    return idx, wk, wm, wb, k2


def compose_ap(offsets, tabs_np, p_idx, p_w):
    """Host: (A P) as a fine-row gather stencil over coarse columns."""
    n = tabs_np[0].shape[1]
    idx_rows, w_rows = [], []
    for i in range(n):
        cols = {}
        for d, o in enumerate(offsets):
            j = i + o
            if not (0 <= j < n):
                continue
            a = tabs_np[0][d, i]; m = tabs_np[1][d, i]; b = tabs_np[2][d, i]
            if a == 0.0 and m == 0.0 and b == 0.0:
                continue
            for s in range(p_idx.shape[1]):
                w = p_w[j, s]
                if w == 0.0:
                    continue
                c = int(p_idx[j, s])
                acc = cols.setdefault(c, [0.0, 0.0, 0.0])
                acc[0] += a * w
                acc[1] += m * w
                acc[2] += b * w
        items = sorted(cols.items())
        idx_rows.append([c for c, _ in items])
        w_rows.append([v for _, v in items])
    k3 = max(len(r) for r in idx_rows)
    idx = np.zeros((n, k3), np.int32)
    wk = np.zeros((n, k3)); wm = np.zeros((n, k3)); wb = np.zeros((n, k3))
    for i, (ir, wr) in enumerate(zip(idx_rows, w_rows)):
        idx[i, : len(ir)] = ir
        for s, (a, b, bb) in enumerate(wr):
            wk[i, s], wm[i, s], wb[i, s] = a, b, bb
    return idx, wk, wm, wb, k3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--freqs", type=int, default=2048)
    ap.add_argument("--anchors", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=20)
    ap.add_argument("--skip-compose", action="store_true",
                    help="skip the slow host composition of RA/AP")
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.lax as lax
    import jax.numpy as jnp

    from mathaudio_tpu.fem.dia import dia_diag, dia_matvec
    from mathaudio_tpu.fem.multigrid import (
        GeometricMultigrid,
        box_hierarchy,
        build_coarse_inv_chain,
    )
    from mathaudio_tpu.fem.multigrid_batched import (
        _prolong_b,
        _prolong_stream,
        _restrict_b,
        _restrict_stream,
        make_dia_mg,
        mg_cycle_batched,
    )
    from mathaudio_tpu.models import RoomSweepModel
    from mathaudio_tpu.models.room_sweep_nm import NodeMajorRoomSweep

    F, R = args.freqs, args.repeats
    meshes = box_hierarchy(args.n, 4 if args.n >= 24 else 3)
    mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
    model = RoomSweepModel(
        meshes[0],
        wall_tags=(1, 2, 3, 4, 5, 6),
        absorption=0.15,
        listening_positions=((0.25, 0.25, 0.25), (0.7, 0.6, 0.4)),
        assembler=mg.assemblers[0],
    )
    nm = NodeMajorRoomSweep(model, mg)
    params = nm.params()
    N = meshes[0].num_nodes
    cd = params.rhs.dtype
    ks = jnp.linspace(0.55, 2.2, F, dtype=model.dtype)
    offsets = nm.offsets
    lvl0 = params.levels[0]
    n_c = params.levels[1].tables.dk.shape[0] if len(params.levels) > 1 else 0
    print(f"# n={args.n}: N={N}, N_c={n_c}, F={F}, dtype={cd}")

    n_anchor = min(args.anchors, F)

    @jax.jit
    def _anchor_setup(ks, builder):
        anchor_ks = jnp.mean(ks.reshape(n_anchor, F // n_anchor), axis=1)
        return build_coarse_inv_chain(
            builder, anchor_ks, jnp.asarray(-1j * 0.15, cd) * anchor_ks.astype(cd)
        )

    anchor_inv = _anchor_setup(ks, params.mg_builder)

    x0 = jax.jit(lambda: (jnp.ones((N, F), jnp.float32) / N).astype(cd))()
    xc0 = jax.jit(lambda: (jnp.ones((n_c, F), jnp.float32) / n_c).astype(cd))()

    _sync_jit = jax.jit(lambda o: jnp.sum(jnp.real(o)).astype(jnp.float32))

    def _sync(out):
        return float(_sync_jit(out))

    tiny = jax.jit(lambda: jnp.zeros((8,), jnp.float32))()
    _sync(tiny)
    t_fetch = min(
        (lambda t0: (_sync(tiny), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(5)
    )
    print(f"# fetch {t_fetch*1e3:.1f} ms")

    def timed(fn, *a, reps=R):
        out = fn(*a)
        _sync(out)
        t0 = time.perf_counter()
        out = fn(*a)
        _sync(out)
        return max((time.perf_counter() - t0 - t_fetch) / reps, 1e-9), out

    def _scalars(kk):
        k = kk.astype(cd)
        return k * k, jnp.asarray(-1j * 0.15, cd) * k

    # --- V-cycle full application: gather / stream / tp ---
    for name, kw in (
        ("gather", {}),
        ("stream", {"dims": nm.grid_dims}),
        ("tp", {"tp": params.tp}),
    ):
        if name == "stream" and not nm.grid_dims:
            continue
        if name == "tp" and not params.tp:
            continue

        @jax.jit
        def vc(r, lv, kk, ai, _kw=kw):
            mgp = make_dia_mg(offsets, lv, kk, 0.15, ai, **_kw)

            def body(i, r):
                x = mg_cycle_batched(mgp, offsets, r, omega=1.0, nu=1)
                return x * (1.0 / (1.0 + 1e-9 * i))

            return lax.fori_loop(0, R, body, r)

        t, _ = timed(vc, x0, params.levels, ks, anchor_inv)
        print(f"V-cycle [{name:6s}] : {t*1e3:7.2f} ms/pass")

    @jax.jit
    def p_smooth(r, kk):
        cmv, cbv = _scalars(kk)
        diag = dia_diag(lvl0.tables, cmv, cbv)
        inv_d = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 1.0)

        def body(i, r):
            return inv_d * r * (1.0 + 1e-9 * i)

        return lax.fori_loop(0, R, body, r)

    t_sm, _ = timed(p_smooth, x0, ks)
    print(f"smooth apply      : {t_sm*1e3:7.2f} ms/pass (D^-1 r, fused diag)")

    @jax.jit
    def p_mv(x, kk):
        cmv, cbv = _scalars(kk)

        def body(i, x):
            return dia_matvec(offsets[0], lvl0.tables, cmv, cbv, x) * (
                1.0 / (1.0 + 1e-9 * i)
            )

        return lax.fori_loop(0, R, body, x)

    t_mv, _ = timed(p_mv, x0, ks)
    print(f"level-0 matvec    : {t_mv*1e3:7.2f} ms/pass")

    # single-accumulator DIA matvec: per-diagonal complex coefficient
    # computed in-register, ONE fused accumulation -> x is read exactly
    # once per diagonal (the 3-accumulator form lets XLA split the
    # fusion into per-table passes that re-read the slices).
    from mathaudio_tpu.fem.dia import _pad_amount

    def dia_matvec_1acc(offs, tables, cmv, cbv, x):
        n = x.shape[0]
        pad = _pad_amount(offs)
        xp = jnp.pad(x, ((pad, pad), (0, 0)))
        y = jnp.zeros_like(x)
        for d, off in enumerate(offs):
            xs = jax.lax.dynamic_slice_in_dim(xp, pad + off, n, axis=0)
            coef = (
                tables.k[d][:, None]
                - cmv[None, :] * tables.m[d][:, None]
                + cbv[None, :] * tables.b[d][:, None]
            )
            y = y + coef * xs
        return y

    @jax.jit
    def p_mv1(x, kk):
        cmv, cbv = _scalars(kk)

        def body(i, x):
            return dia_matvec_1acc(offsets[0], lvl0.tables, cmv, cbv, x) * (
                1.0 / (1.0 + 1e-9 * i)
            )

        return lax.fori_loop(0, R, body, x)

    @jax.jit
    def _check_mv1(x, kk):
        cmv, cbv = _scalars(kk)
        y0 = dia_matvec(offsets[0], lvl0.tables, cmv, cbv, x)
        y1 = dia_matvec_1acc(offsets[0], lvl0.tables, cmv, cbv, x)
        return (jnp.max(jnp.abs(y1 - y0)) / jnp.max(jnp.abs(y0))).real.astype(
            jnp.float32
        )

    print(f"# matvec 1acc vs 3acc: rel={float(_check_mv1(x0, ks)):.2e}")
    t_mv1, _ = timed(p_mv1, x0, ks)
    print(f"level-0 matvec[1a]: {t_mv1*1e3:7.2f} ms/pass (single accumulator)")

    @jax.jit
    def p_rst_g(rf):
        def body(i, rf_):
            rc = _restrict_b(lvl0, rf_, n_c)
            return rf_ * (1.0 + 1e-9 * jnp.real(rc[0, 0]))

        return lax.fori_loop(0, R, body, rf)

    t_rg, _ = timed(p_rst_g, x0)
    print(f"restrict [gather] : {t_rg*1e3:7.2f} ms/pass")
    if nm.grid_dims:

        @jax.jit
        def p_rst_s(rf):
            def body(i, rf_):
                rc = _restrict_stream(nm.grid_dims[0], rf_)
                return rf_ * (1.0 + 1e-9 * jnp.real(rc[0, 0]))

            return lax.fori_loop(0, R, body, rf)

        t_rs, _ = timed(p_rst_s, x0)
        print(f"restrict [stream] : {t_rs*1e3:7.2f} ms/pass")

    @jax.jit
    def p_prl_g(xc):
        def body(i, xc_):
            xf = _prolong_b(lvl0, xc_)
            return xc_ * (1.0 + 1e-9 * jnp.real(xf[0, 0]))

        return lax.fori_loop(0, R, body, xc)

    t_pg, _ = timed(p_prl_g, xc0)
    print(f"prolong  [gather] : {t_pg*1e3:7.2f} ms/pass")
    if nm.grid_dims:

        @jax.jit
        def p_prl_s(xc):
            def body(i, xc_):
                xf = _prolong_stream(nm.grid_dims[1], xc_)
                return xc_ * (1.0 + 1e-9 * jnp.real(xf[0, 0]))

            return lax.fori_loop(0, R, body, xc)

        t_ps, _ = timed(p_prl_s, xc0)
        print(f"prolong  [stream] : {t_ps*1e3:7.2f} ms/pass")

    # direct 27-term strided-slice restriction: pad once, then every
    # (dz, dy, dx) stencil term is one strided slab read — no gather
    # tables, no per-axis intermediates.
    if nm.grid_dims:
        nxf, nyf, nzf = nm.grid_dims[0]
        nxc, nyc, nzc = nm.grid_dims[1]
        w1 = (0.5, 1.0, 0.5)

        def restrict27(rf):
            x4 = rf.reshape(nzf, nyf, nxf, F)
            x4 = jnp.pad(x4, ((1, 1), (1, 1), (1, 1), (0, 0)))
            out = None
            for dz in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        w = w1[dz + 1] * w1[dy + 1] * w1[dx + 1]
                        sl = x4[
                            1 + dz : 1 + dz + 2 * nzc - 1 : 2,
                            1 + dy : 1 + dy + 2 * nyc - 1 : 2,
                            1 + dx : 1 + dx + 2 * nxc - 1 : 2,
                            :,
                        ]
                        out = w * sl if out is None else out + w * sl
            return out.reshape(nzc * nyc * nxc, F)

        @jax.jit
        def p_rst_27(rf):
            def body(i, rf_):
                rc = restrict27(rf_)
                return rf_ * (1.0 + 1e-9 * jnp.real(rc[0, 0]))

            return lax.fori_loop(0, R, body, rf)

        # correctness vs the gather stencil (jitted: eager complex ops
        # crash the axon worker)
        @jax.jit
        def _check27(x):
            rc_ref = _restrict_b(lvl0, x, n_c)
            e = jnp.max(jnp.abs(restrict27(x) - rc_ref)) / jnp.max(jnp.abs(rc_ref))
            return e.real.astype(jnp.float32)

        print(f"# restrict27 vs gather: rel={float(_check27(x0)):.2e}")
        t_r27, _ = timed(p_rst_27, x0)
        print(f"restrict [r27]    : {t_r27*1e3:7.2f} ms/pass (27 strided slabs)")

        # direct 8-term prolongation: each coarse point spreads to the
        # <=8 fine parities; as slices it is 27 strided READS of the
        # coarse array into fine parity slabs via one interleave write.
        def prolong27(xc):
            c4 = xc.reshape(nzc, nyc, nxc, F)
            c4 = jnp.pad(c4, ((0, 1), (0, 1), (0, 1), (0, 0)))
            # fine node (2i+pz, 2j+py, 2k+px): parity p in {0,1}^3 reads
            # coarse (i + {0,pz}, ...) with weight (1/2)^{#odd parities}
            slabs = {}
            for pz in (0, 1):
                for py in (0, 1):
                    for px in (0, 1):
                        acc = None
                        for bz in range(pz + 1):
                            for by in range(py + 1):
                                for bx in range(px + 1):
                                    w = 0.5 ** (pz + py + px)
                                    sl = c4[
                                        bz : bz + nzc - (1 if pz else 0),
                                        by : by + nyc - (1 if py else 0),
                                        bx : bx + nxc - (1 if px else 0),
                                        :,
                                    ]
                                    acc = w * sl if acc is None else acc + w * sl
                        slabs[(pz, py, px)] = acc
            # interleave parities back: stack along new axes then reshape
            rows = []
            for pz in (0, 1):
                planes = []
                for py in (0, 1):
                    pair = []
                    for px in (0, 1):
                        s = slabs[(pz, py, px)]
                        # pad truncated odd-parity slabs back to (nzc, nyc, nxc)
                        s = jnp.pad(
                            s,
                            (
                                (0, nzc - s.shape[0]),
                                (0, nyc - s.shape[1]),
                                (0, nxc - s.shape[2]),
                                (0, 0),
                            ),
                        )
                        pair.append(s)
                    # interleave x: (nzc, nyc, nxc, 2, F) -> (nzc, nyc, 2nxc, F)
                    planes.append(
                        jnp.stack(pair, axis=3).reshape(nzc, nyc, 2 * nxc, F)
                    )
                rows.append(
                    jnp.stack(planes, axis=2).reshape(nzc, 2 * nyc, 2 * nxc, F)
                )
            full = jnp.stack(rows, axis=1).reshape(2 * nzc, 2 * nyc, 2 * nxc, F)
            return full[: nzf, : nyf, : nxf, :].reshape(nzf * nyf * nxf, F)

        @jax.jit
        def _checkp(xc):
            pr_ref = _prolong_b(lvl0, xc)
            e = jnp.max(jnp.abs(prolong27(xc) - pr_ref)) / jnp.max(jnp.abs(pr_ref))
            return e.real.astype(jnp.float32)

        print(f"# prolong27 vs gather: rel={float(_checkp(xc0)):.2e}")

        @jax.jit
        def p_prl_27(xc):
            def body(i, xc_):
                xf = prolong27(xc_)
                return xc_ * (1.0 + 1e-9 * jnp.real(xf[0, 0]))

            return lax.fori_loop(0, R, body, xc)

        t_p27, _ = timed(p_prl_27, xc0)
        print(f"prolong  [p27]    : {t_p27*1e3:7.2f} ms/pass (parity slabs)")

    # level-1 subtree (everything below level 0)
    @jax.jit
    def p_sub(rc, lv, kk, ai):
        mgp = make_dia_mg(offsets, lv, kk, 0.15, ai)

        def body(i, rc_):
            xc = mg_cycle_batched(mgp, offsets, rc_, omega=1.0, nu=1, level=1)
            return xc * (1.0 / (1.0 + 1e-9 * i))

        return lax.fori_loop(0, R, body, rc)

    t_sub, _ = timed(p_sub, xc0, params.levels, ks, anchor_inv)
    print(f"level>=1 subtree  : {t_sub*1e3:7.2f} ms/pass")

    if args.skip_compose:
        return

    # --- Galerkin-fused prototypes ---
    tabs_np = [np.asarray(t, np.float64) for t in (lvl0.tables.k, lvl0.tables.m, lvl0.tables.b)]
    r_idx = np.asarray(lvl0.r_idx)
    r_w = np.asarray(lvl0.r_w, np.float64)
    p_idx = np.asarray(lvl0.p_idx)
    p_w = np.asarray(lvl0.p_w, np.float64)

    t0 = time.perf_counter()
    ra_idx, ra_k, ra_m, ra_b, k2 = compose_ra(offsets[0], tabs_np, r_idx, r_w)
    print(f"# RA composed: K2={k2} cols/coarse row ({time.perf_counter()-t0:.1f}s host)")
    t0 = time.perf_counter()
    ap_idx, ap_k, ap_m, ap_b, k3 = compose_ap(offsets[0], tabs_np, p_idx, p_w)
    print(f"# AP composed: K3={k3} cols/fine row ({time.perf_counter()-t0:.1f}s host)")

    rdt = jnp.float32
    ra_t = [jnp.asarray(a, rdt) for a in (ra_k, ra_m, ra_b)]
    ap_t = [jnp.asarray(a, rdt) for a in (ap_k, ap_m, ap_b)]
    ra_i = jnp.asarray(ra_idx)
    ap_i = jnp.asarray(ap_idx)

    def gather_mv(idx, wk, wm, wb, x, cmv, cbv):
        xg = jnp.take(x, idx, axis=0)  # (rows, K, F)
        ak = jnp.sum(wk.astype(x.dtype)[:, :, None] * xg, axis=1)
        am = jnp.sum(wm.astype(x.dtype)[:, :, None] * xg, axis=1)
        ab = jnp.sum(wb.astype(x.dtype)[:, :, None] * xg, axis=1)
        return ak - cmv[None, :] * am + cbv[None, :] * ab

    # correctness vs reference composition
    @jax.jit
    def _check(x, xc, kk):
        cmv, cbv = _scalars(kk)
        y_ref = _restrict_b(lvl0, dia_matvec(offsets[0], lvl0.tables, cmv, cbv, x), n_c)
        y_ra = gather_mv(ra_i, *ra_t, x, cmv, cbv)
        e1 = jnp.max(jnp.abs(y_ra - y_ref)) / jnp.max(jnp.abs(y_ref))
        y_ref2 = dia_matvec(offsets[0], lvl0.tables, cmv, cbv, _prolong_b(lvl0, xc))
        y_ap = gather_mv(ap_i, *ap_t, xc, cmv, cbv)
        e2 = jnp.max(jnp.abs(y_ap - y_ref2)) / jnp.max(jnp.abs(y_ref2))
        return jnp.real(e1).astype(jnp.float32), jnp.real(e2).astype(jnp.float32)

    e1, e2 = _check(x0, xc0, ks)
    print(f"# RA gather vs R(Ax): rel={float(e1):.2e}")
    print(f"# AP gather vs A(Pxc): rel={float(e2):.2e}")

    @jax.jit
    def p_ra(x, kk):
        cmv, cbv = _scalars(kk)

        def body(i, x):
            rc = gather_mv(ra_i, *ra_t, x, cmv, cbv)
            return x * (1.0 + 1e-9 * jnp.real(rc[0, 0]))

        return lax.fori_loop(0, R, body, x)

    t_ra, _ = timed(p_ra, x0, ks)
    print(f"G1 RA gather      : {t_ra*1e3:7.2f} ms/pass  (vs matvec+restrict "
          f"{(t_mv+t_rg)*1e3:.2f})")

    @jax.jit
    def p_ap(xc, kk):
        cmv, cbv = _scalars(kk)

        def body(i, xc_):
            xf = gather_mv(ap_i, *ap_t, xc_, cmv, cbv)
            return xc_ * (1.0 + 1e-9 * jnp.real(xf[0, 0]))

        return lax.fori_loop(0, R, body, xc)

    t_ap, _ = timed(p_ap, xc0, ks)
    print(f"G2 AP gather      : {t_ap*1e3:7.2f} ms/pass  (vs prolong+matvec "
          f"{(t_pg+t_mv)*1e3:.2f})")


if __name__ == "__main__":
    main()
