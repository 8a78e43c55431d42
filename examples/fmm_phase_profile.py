"""Phase-by-phase on-chip breakdown of the FMM matvec + solve step.

Times the pieces of the (gather-form, planes-shipped) FMM matvec on the
chip so optimization aims at the dominant phase:

  - aggregation  mu = T x           (leaf einsum, MXU)
  - translation  lam = D mu         (SLFMM dense / per-level pairs)
  - M2M / L2L    (tree tiers only)
  - disaggregation far = S lam
  - near-field   block GEMMs + target reduction
  - preconditioner application (cluster-block LU)
  - one full matvec / one full preconditioned GMRES iteration

Usage: python examples/fmm_phase_profile.py [--tier slfmm|mlfmm]
       [--subdiv N] [--ka K]  (CPU smoke: --device cpu --subdiv 2)
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
    ap.add_argument("--tier", default="mlfmm", choices=["slfmm", "mlfmm"])
    ap.add_argument("--subdiv", type=int, default=0, help="0 = tier default")
    ap.add_argument("--ka", type=float, default=0.0, help="0 = tier default")
    ap.add_argument("--repeats", type=int, default=50)
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from mathaudio_tpu.bem.fmm import (
        ClusterBlockPreconditioner,
        build_mlfmm_tree_system,
        build_slfmm_system,
        gather_form,
        sel_form,
    )
    from mathaudio_tpu.bem.fmm_chip import (
        fmm_chip_matvec_fn,
        join_planes,
        split_planes,
    )
    from mathaudio_tpu.bem.mesh import icosphere

    subdiv = args.subdiv or (4 if args.tier == "slfmm" else 5)
    ka = args.ka or (8.0 if args.tier == "slfmm" else 16.0)
    beta = 1j / ka if args.tier == "slfmm" else 0.0
    R = args.repeats

    cpu = jax.devices("cpu")[0]
    x64_was = bool(jax.config.jax_enable_x64)
    jax.config.update("jax_enable_x64", True)
    t0 = time.perf_counter()
    try:
        with jax.default_device(cpu):
            surf = icosphere(1.0, subdiv)
            n = surf.num_elements
            if args.tier == "slfmm":
                op = build_slfmm_system(surf, ka, beta=beta, stability_tau=1e4)
            else:
                op = build_mlfmm_tree_system(surf, ka, beta=beta,
                                             stability_tau=1e4, max_per_leaf=32)
            pre = ClusterBlockPreconditioner.from_operator(op)
            op = sel_form(op) if args.device != "cpu" else gather_form(op)
    finally:
        jax.config.update("jax_enable_x64", x64_was or args.device == "cpu")
    print(f"# {args.tier} N={n} ka={ka}: host build {time.perf_counter()-t0:.1f}s")

    pdt = np.float64 if args.device == "cpu" else np.float32
    planes = jax.device_put(split_planes(op, dtype=pdt))
    pre_planes = jax.device_put(split_planes(pre, dtype=pdt))
    jax.block_until_ready(planes)

    d = op.data
    if args.tier == "slfmm":
        c, q, m = d.t_tensor.shape[0], d.t_tensor.shape[1], d.t_tensor.shape[2]
        print(f"# C={c} clusters, Q={q} dirs, m={m} elems/cluster, "
              f"near pairs P={d.near_blocks.shape[0]}")
    else:
        c, q, m = d.t_tensor.shape[0], d.t_tensor.shape[1], d.t_tensor.shape[2]
        print(f"# C_leaf={c}, Q_leaf={q}, m={m}, near P={d.near_blocks.shape[0]}, "
              f"levels={len(d.levels)}")
        for i, lv in enumerate(d.levels):
            print(f"#   level {i}: nodes={lv.parent.shape[0]} "
                  f"pairs={lv.trans_tgt.shape[0]} Q={lv.trans_op.shape[1] if lv.trans_op.size else 0}")

    _sync_jit = jax.jit(lambda o: jnp.sum(o).astype(jnp.float32))

    def _sync(o):
        return float(_sync_jit(o))

    tiny = jax.jit(lambda: jnp.zeros((8,), jnp.float32))()
    _sync(tiny)
    t_fetch = min(
        (lambda t0: (_sync(tiny), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(5)
    )
    print(f"# fetch {t_fetch*1e3:.1f} ms")

    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal(n).astype(pdt))
    xi = jnp.asarray(rng.standard_normal(n).astype(pdt))

    def timed(fn, *a, reps=R):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        return max((time.perf_counter() - t0) / reps, 1e-9), out

    import jax.lax as lax

    # Every phase body derives its INPUT from the loop carry — a naive
    # "recompute the same phase R times" loop gets hoisted by XLA (the
    # computation is loop-invariant) and measures nothing; caught in
    # round 4 when the phases summed to 1/5 of the real matvec.
    def loop(body, z0):
        return lax.fori_loop(0, R, body, z0)

    def chain(x, scalar):
        """Fold a phase-output scalar back into the carried x (cheap)."""
        return x * (1.0 + 1e-12 * jnp.real(scalar).astype(x.dtype))

    # Phase jits take the planes pytree and recombine in-trace.
    @jax.jit
    def p_agg(planes, xr, xi):
        with jax.default_matmul_precision("float32"):
            dd = join_planes(planes).data
            x0 = jax.lax.complex(xr, xi)

            def body(i, x):
                xc = x[dd.clusters] * dd.cluster_mask.astype(x.dtype)
                mu = jnp.einsum("cqm,cm->cq", dd.t_tensor, xc)
                return chain(x, mu[0, 0])

            return jnp.abs(loop(body, x0))

    t_agg, mu_abs = timed(p_agg, planes, xr, xi)
    print(f"aggregation T x    : {t_agg*1e3:7.3f} ms")

    if args.tier == "slfmm":

        @jax.jit
        def p_trans(planes, xr, xi):
            with jax.default_matmul_precision("float32"):
                dd = join_planes(planes).data
                x = jax.lax.complex(xr, xi)
                xc = x[dd.clusters] * dd.cluster_mask.astype(x.dtype)
                mu0 = jnp.einsum("cqm,cm->cq", dd.t_tensor, xc)

                def body(i, mu):
                    lam = jnp.einsum("baq,aq->bq", dd.d_tensor, mu)
                    return chain(mu, lam[0, 0])

                return jnp.abs(loop(body, mu0))

        t_tr, _ = timed(p_trans, planes, xr, xi)
        print(f"translation D mu   : {t_tr*1e3:7.3f} ms")
    else:

        @jax.jit
        def p_tree(planes, xr, xi):
            """Upward M2M + per-level translations + downward L2L (the
            full far-field pipeline minus leaf agg/disagg einsums)."""
            with jax.default_matmul_precision("float32"):
                dd = join_planes(planes).data
                x = jax.lax.complex(xr, xi)
                xc = x[dd.clusters] * dd.cluster_mask.astype(x.dtype)
                mu_leaf0 = jnp.einsum("cqm,cm->cq", dd.t_tensor, xc)
                nlev = len(dd.levels)

                def far_pipeline(mu_leaf):
                    mu = [None] * nlev
                    mu[-1] = mu_leaf
                    for i in range(nlev - 1, 0, -1):
                        lv = dd.levels[i]
                        up = (mu[i] @ lv.interp_up.T.astype(mu[i].dtype)) * lv.shift_up
                        mu[i - 1] = jnp.sum(
                            jnp.take(up, lv.children_idx, axis=0)
                            * lv.children_mask[:, :, None].astype(up.dtype),
                            axis=1,
                        )
                    loc = None
                    for i in range(nlev):
                        lv = dd.levels[i]
                        if lv.trans_op.shape[0]:
                            contrib = lv.trans_op.astype(mu[i].dtype) * mu[i][lv.trans_src]
                            if lv.sel is not None:  # production sel_form path
                                lam = jax.lax.complex(
                                    lv.sel @ jnp.real(contrib),
                                    lv.sel @ jnp.imag(contrib),
                                ).astype(contrib.dtype)
                            else:
                                cp = jnp.concatenate(
                                    [contrib, jnp.zeros((1, contrib.shape[1]), contrib.dtype)]
                                )
                                lam = jnp.sum(jnp.take(cp, lv.trans_of_tgt, axis=0), axis=1)
                        else:
                            lam = jnp.zeros_like(mu[i])
                        if loc is not None:
                            lam = lam + (loc[lv.parent] * lv.shift_down) @ lv.interp_down.T.astype(lam.dtype)
                        loc = lam
                    return loc

                def body(i, mu_leaf):
                    loc = far_pipeline(mu_leaf)
                    return chain(mu_leaf, loc[0, 0])

                return jnp.abs(loop(body, mu_leaf0))

        t_tr, _ = timed(p_tree, planes, xr, xi)
        print(f"tree far pipeline  : {t_tr*1e3:7.3f} ms (M2M+translate+L2L)")

    @jax.jit
    def p_near(planes, xr, xi):
        with jax.default_matmul_precision("float32"):
            dd = join_planes(planes).data
            x0 = jax.lax.complex(xr, xi)

            def body(i, x):
                xa = x[dd.clusters[dd.near_a]] * dd.cluster_mask[dd.near_a].astype(x.dtype)
                near = jnp.einsum("pij,pj->pi", dd.near_blocks, xa)
                nearp = jnp.concatenate(
                    [near, jnp.zeros((1, near.shape[1]), near.dtype)]
                )
                near_t = jnp.sum(jnp.take(nearp, dd.near_of_tgt, axis=0), axis=1)
                return chain(x, near_t[0, 0])

            return jnp.abs(loop(body, x0))

    t_near, _ = timed(p_near, planes, xr, xi)
    print(f"near blocks+reduce : {t_near*1e3:7.3f} ms")

    @jax.jit
    def p_disagg(planes, xr, xi):
        with jax.default_matmul_precision("float32"):
            dd = join_planes(planes).data
            x = jax.lax.complex(xr, xi)
            xc = x[dd.clusters] * dd.cluster_mask.astype(x.dtype)
            loc0 = jnp.einsum("cqm,cm->cq", dd.t_tensor, xc)  # stand-in local expansion

            def body(i, loc):
                far = dd.prefactor * jnp.einsum(
                    "q,cqm,cq->cm", dd.quad_w.astype(loc.dtype), dd.s_tensor, loc
                )
                out = (far * dd.cluster_mask.astype(loc.dtype)).reshape(-1)[dd.elem_pos]
                return chain(loc, out[0])

            return jnp.abs(loop(body, loc0))

    t_dis, _ = timed(p_disagg, planes, xr, xi)
    print(f"disagg S loc+place : {t_dis*1e3:7.3f} ms")

    # ---- sub-phase decomposition of the two hotspots ----
    @jax.jit
    def p_near_gather(planes, xr, xi):
        """n1 (current production form): xa = xc[near_a] — a P-row
        gather of the already-gathered masked cluster values. (The old
        x[clusters[near_a]] form was 876k SCALAR gathers = 12.1 ms; the
        row form replaced it in round 4.)"""
        with jax.default_matmul_precision("float32"):
            dd = join_planes(planes).data
            x0 = jax.lax.complex(xr, xi)

            def body(i, x):
                xc = x[dd.clusters] * dd.cluster_mask.astype(x.dtype)
                xa = xc[dd.near_a]
                return chain(x, xa[0, 0])

            return jnp.abs(loop(body, x0))

    t_n1, _ = timed(p_near_gather, planes, xr, xi)
    print(f"  near n1 xc+rowsel: {t_n1*1e3:7.3f} ms (incl. the xc gather)")

    @jax.jit
    def p_near_bmv(planes, xr, xi):
        """n2: the block products given a resident xa."""
        from mathaudio_tpu.bem.fmm import _bmv
        with jax.default_matmul_precision("float32"):
            dd = join_planes(planes).data
            x = jax.lax.complex(xr, xi)
            xc = x[dd.clusters] * dd.cluster_mask.astype(x.dtype)
            xa0 = xc[dd.near_a]

            def body(i, xa):
                near = _bmv(dd.near_blocks, xa)
                return chain(xa, near[0, 0])

            return jnp.abs(loop(body, xa0))

    t_n2, _ = timed(p_near_bmv, planes, xr, xi)
    print(f"  near n2 blocks   : {t_n2*1e3:7.3f} ms")

    @jax.jit
    def p_near_reduce(planes, xr, xi):
        """n3: the target-side pair reduction take(near_of_tgt)+sum."""
        from mathaudio_tpu.bem.fmm import _bmv
        with jax.default_matmul_precision("float32"):
            dd = join_planes(planes).data
            x = jax.lax.complex(xr, xi)
            xc = x[dd.clusters] * dd.cluster_mask.astype(x.dtype)
            near0 = _bmv(dd.near_blocks, xc[dd.near_a])

            def body(i, near):
                nearp = jnp.concatenate(
                    [near, jnp.zeros((1, near.shape[1]), near.dtype)]
                )
                near_t = jnp.sum(jnp.take(nearp, dd.near_of_tgt, axis=0), axis=1)
                return chain(near, near_t[0, 0])

            return jnp.abs(loop(body, near0))

    t_n3, _ = timed(p_near_reduce, planes, xr, xi)
    print(f"  near n3 reduce   : {t_n3*1e3:7.3f} ms")

    if args.tier == "mlfmm":
        @jax.jit
        def p_tree_trans(planes, xr, xi):
            """t1+t2 only: per-level translation multiply + target reduce
            (no M2M/L2L) — mu per level approximated by broadcasting the
            leaf spectrum through interp to keep shapes honest."""
            with jax.default_matmul_precision("float32"):
                dd = join_planes(planes).data
                x = jax.lax.complex(xr, xi)
                xc = x[dd.clusters] * dd.cluster_mask.astype(x.dtype)
                from mathaudio_tpu.bem.fmm import _bmv
                mu_leaf0 = _bmv(dd.t_tensor, xc)
                nlev = len(dd.levels)

                def body(i, mu_leaf):
                    # build per-level spectra via the real M2M chain once
                    mu = [None] * nlev
                    mu[-1] = mu_leaf
                    for j in range(nlev - 1, 0, -1):
                        lv = dd.levels[j]
                        up = (mu[j] @ lv.interp_up.T.astype(mu[j].dtype)) * lv.shift_up
                        mu[j - 1] = jnp.sum(
                            jnp.take(up, lv.children_idx, axis=0)
                            * lv.children_mask[:, :, None].astype(up.dtype),
                            axis=1,
                        )
                    acc = None
                    for j in range(nlev):
                        lv = dd.levels[j]
                        if lv.trans_op.shape[0]:
                            contrib = lv.trans_op.astype(mu[j].dtype) * mu[j][lv.trans_src]
                            cp = jnp.concatenate(
                                [contrib, jnp.zeros((1, contrib.shape[1]), contrib.dtype)]
                            )
                            lam = jnp.sum(jnp.take(cp, lv.trans_of_tgt, axis=0), axis=1)
                            acc = lam[0, 0] if acc is None else acc + lam[0, 0]
                    return chain(mu_leaf, acc)

                return jnp.abs(loop(body, mu_leaf0))

        t_tt, _ = timed(p_tree_trans, planes, xr, xi)
        print(f"  tree M2M+translate+reduce (no L2L): {t_tt*1e3:7.3f} ms")

        @jax.jit
        def p_tree_m2m(planes, xr, xi):
            """M2M chain only (interp matmuls + shifts + children sums)."""
            with jax.default_matmul_precision("float32"):
                dd = join_planes(planes).data
                x = jax.lax.complex(xr, xi)
                xc = x[dd.clusters] * dd.cluster_mask.astype(x.dtype)
                from mathaudio_tpu.bem.fmm import _bmv
                mu_leaf0 = _bmv(dd.t_tensor, xc)
                nlev = len(dd.levels)

                def body(i, mu_leaf):
                    mu = [None] * nlev
                    mu[-1] = mu_leaf
                    acc = None
                    for j in range(nlev - 1, 0, -1):
                        lv = dd.levels[j]
                        up = (mu[j] @ lv.interp_up.T.astype(mu[j].dtype)) * lv.shift_up
                        mu[j - 1] = jnp.sum(
                            jnp.take(up, lv.children_idx, axis=0)
                            * lv.children_mask[:, :, None].astype(up.dtype),
                            axis=1,
                        )
                        acc = mu[j - 1][0, 0] if acc is None else acc + mu[j - 1][0, 0]
                    return chain(mu_leaf, acc)

                return jnp.abs(loop(body, mu_leaf0))

        t_m2m, _ = timed(p_tree_m2m, planes, xr, xi)
        print(f"  tree M2M only    : {t_m2m*1e3:7.3f} ms")

        @jax.jit
        def p_tree_srcgather(planes, xr, xi):
            """per-level mu[trans_src] row gathers + trans_op multiply,
            with mu held FIXED per level (leaf spectrum interp'd once)."""
            with jax.default_matmul_precision("float32"):
                dd = join_planes(planes).data
                x = jax.lax.complex(xr, xi)
                xc = x[dd.clusters] * dd.cluster_mask.astype(x.dtype)
                from mathaudio_tpu.bem.fmm import _bmv
                mu_leaf = _bmv(dd.t_tensor, xc)
                nlev = len(dd.levels)
                mu = [None] * nlev
                mu[-1] = mu_leaf
                for j in range(nlev - 1, 0, -1):
                    lv = dd.levels[j]
                    up = (mu[j] @ lv.interp_up.T.astype(mu[j].dtype)) * lv.shift_up
                    mu[j - 1] = jnp.sum(
                        jnp.take(up, lv.children_idx, axis=0)
                        * lv.children_mask[:, :, None].astype(up.dtype),
                        axis=1,
                    )

                def body(i, z):
                    acc = None
                    for j in range(nlev):
                        lv = dd.levels[j]
                        if lv.trans_op.shape[0]:
                            contrib = lv.trans_op.astype(z.dtype) * (
                                z[0, 0] + mu[j]
                            )[lv.trans_src]
                            acc = contrib[0, 0] if acc is None else acc + contrib[0, 0]
                    return chain(z, acc)

                return jnp.abs(loop(body, mu_leaf))

        t_sg, _ = timed(p_tree_srcgather, planes, xr, xi)
        print(f"  tree src gathers : {t_sg*1e3:7.3f} ms (mu[trans_src] * op)")

    @jax.jit
    def p_pre(pre_planes, xr, xi):
        with jax.default_matmul_precision("float32"):
            pp = join_planes(pre_planes)
            x0 = jax.lax.complex(xr, xi)

            def body(i, x):
                return pp.matvec(x)

            return jnp.abs(loop(body, x0))

    t_pre, _ = timed(p_pre, pre_planes, xr, xi)
    print(f"preconditioner     : {t_pre*1e3:7.3f} ms")

    mv = jax.jit(fmm_chip_matvec_fn())

    def p_mv(planes, xr, xi):
        return mv(planes, xr, xi)

    # full matvec: R sequential applications in one jit
    @jax.jit
    def p_mv_loop(planes, xr, xi):
        with jax.default_matmul_precision("float32"):
            opj = join_planes(planes)
            x = jax.lax.complex(xr, xi)

            def body(z):
                return opj.matvec(z)

            z = x
            z = jax.lax.fori_loop(0, R, lambda i, z: body(z) / jnp.maximum(
                jnp.max(jnp.abs(z)), 1e-30), z)
            return jnp.abs(z)

    t_mv, _ = timed(p_mv_loop, planes, xr, xi)
    print(f"full matvec        : {t_mv*1e3:7.3f} ms (chained, incl. norm scale)")


if __name__ == "__main__":
    main()
