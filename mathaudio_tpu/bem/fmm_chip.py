"""FMM execution on TPU backends whose transport cannot ship complex
arrays (the tunneled dev-TPU case): every complex tensor of an FMM
operator pytree is split into (re, im) REAL planes at the host/device
boundary and recombined in-trace with ``lax.complex`` — the same trick
the dense sweep uses for its matrices (bem/sweep.py, bench.py run_bem),
applied to ``SlfmmData`` / ``MlfmmTreeData`` / preconditioners / RHS.

This puts the reference's production large-N tier on the MXU it was
shaped for: the batched cluster GEMMs of
math-bem/src/core/solver/batched_blas.rs:237 (slfmm_matvec_batched) and
the N>20000 "Fmm + batched" row of the solver-selection table
(math-bem/bin/qa_suite.rs:9-14) run as c64 einsums on the chip, fed by
f32 re/im planes that transports without complex serialization can ship.

Host side (``split_planes``) is pure numpy; device side
(``join_planes``) runs inside jit. ``fmm_chip_solve_fn`` packages the
whole GMRES solve (operator join + Krylov + |x| or re/im extraction) as
one jittable function whose inputs and outputs are real-only pytrees.

Build note: constructing the FMM operator itself needs complex host
compute (Hankel series, near-field quadrature). On an axon-default
process run the build under ``with jax.default_device(jax.devices(
"cpu")[0])`` so its jitted build kernels target the in-process CPU
backend (available alongside axon — probed 2026-08-19), then split
planes and hand them to the TPU jit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from mathaudio_tpu.solvers.krylov import KrylovConfig, gmres


class Planes(NamedTuple):
    """A complex array as two real planes (transport-safe pytree leaf pair)."""

    re: jnp.ndarray
    im: jnp.ndarray


def split_planes(tree, dtype=np.float32):
    """Host-side: complex leaves -> ``Planes`` of ``dtype``; float leaves
    cast to ``dtype``; integer/bool leaves untouched. Works on any pytree
    (operators registered as pytrees included). ``dtype=None`` keeps the
    original precision (re/im split only)."""

    def f(x):
        a = np.asarray(x)
        if np.issubdtype(a.dtype, np.complexfloating):
            rd = a.real.dtype if dtype is None else dtype
            return Planes(
                np.ascontiguousarray(a.real.astype(rd)),
                np.ascontiguousarray(a.imag.astype(rd)),
            )
        if dtype is not None and np.issubdtype(a.dtype, np.floating):
            return a.astype(dtype)
        return a

    return jax.tree_util.tree_map(f, tree)


def join_planes(tree):
    """In-trace inverse of ``split_planes``: Planes -> complex via
    ``lax.complex``; everything else passes through."""

    def f(x):
        if isinstance(x, Planes):
            return jax.lax.complex(jnp.asarray(x.re), jnp.asarray(x.im))
        return x

    return jax.tree_util.tree_map(f, tree, is_leaf=lambda x: isinstance(x, Planes))


def fmm_chip_matvec_fn():
    """Jittable ``(op_planes, x_re, x_im) -> (y_re, y_im)``: one FMM
    matvec with complex state living only inside the trace. Works for any
    LinearOperator pytree whose complex leaves were split."""

    def mv(op_planes, x_re, x_im):
        # TPU matmul precision defaults to bf16-truncated inputs; the FMM
        # einsums carry stability-screened amplitudes up to tau=1e4 that
        # must cancel through the quadrature, so true-f32 accumulation is
        # required (measured: default precision -> 1.5e-2 matvec rel err
        # at N=5120/ka=8, float32 -> ~1e-5).
        with jax.default_matmul_precision("float32"):
            op = join_planes(op_planes)
            y = op.matvec(jax.lax.complex(x_re, x_im))
            return jnp.real(y), jnp.imag(y)

    return mv


def fmm_chip_solve_fn(config: Optional[KrylovConfig] = None):
    """Jittable ``(op_planes, pre_planes, rhs_re, rhs_im) ->
    (x_re, x_im, iterations, converged)``: the full preconditioned GMRES
    solve through a planes-split FMM operator. ``pre_planes`` may be
    ``None`` (unpreconditioned; pass it statically via functools.partial
    or a wrapper since None is not a pytree placeholder here).

    The reference analog is gmres(SlfmmOperator)
    (room_acoustics/solver.rs:975 solve_bem_fmm_gmres_ilu /
    fmm_interface.rs:236 gmres_solve_fmm_batched)."""
    config = config or KrylovConfig(max_iterations=400, tolerance=1e-5, restart=60)

    def solve(op_planes, pre_planes, rhs_re, rhs_im):
        # true-f32 matmul accumulation (see fmm_chip_matvec_fn)
        with jax.default_matmul_precision("float32"):
            op = join_planes(op_planes)
            pre = None if pre_planes is None else join_planes(pre_planes)
            rhs = jax.lax.complex(rhs_re, rhs_im)
            sol = gmres(op, rhs, config=config, preconditioner=pre)
            return jnp.real(sol.x), jnp.imag(sol.x), sol.iterations, sol.converged

    return solve


def build_on_host(build_fn, *args, **kwargs):
    """Run an FMM build on the in-process CPU backend (complex host
    compute stays off the tunneled device), returning the built object.
    On a CPU-default process this is a plain call."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        return build_fn(*args, **kwargs)


def fmm_chip_solve_cm_fn(config: Optional[KrylovConfig] = None):
    """Cluster-major chip solve: the whole Krylov space lives in the
    padded (C*m,) leaf-cluster layout, so the matvec and preconditioner
    never re-gather element order — ``x[clusters]`` (44k SCALAR gathers
    from the (N,) vector at the N=20480 tier) and the ``elem_pos``
    placement gather disappear from every iteration; element order is
    restored ONCE on the final solution. Works for MlfmmTreeOperator and
    SlfmmOperator data in gather/sel form (the only forms the chip
    runs). Numerically the same operator conjugated by the
    elements->cluster-slots permutation (padded slots carry exact zeros
    end to end: rhs pads are zero and every stage masks them).

    Returns a jittable ``(op_planes, pre_planes, rhs_re, rhs_im) ->
    (x_re, x_im, iterations, converged)`` with x in ELEMENT order —
    drop-in for fmm_chip_solve_fn.
    """
    from mathaudio_tpu.bem.fmm import MlfmmTreeOperator, SlfmmOperator, _bmv

    config = config or KrylovConfig(max_iterations=400, tolerance=1e-5, restart=60)

    def solve(op_planes, pre_planes, rhs_re, rhs_im):
        with jax.default_matmul_precision("float32"):
            op = join_planes(op_planes)
            pre = None if pre_planes is None else join_planes(pre_planes)
            d = op.data
            c, m = d.clusters.shape
            mask = d.cluster_mask
            diag_cm = (d.diag_add[d.clusters] * mask.astype(d.diag_add.dtype))

            rhs = jax.lax.complex(rhs_re, rhs_im)
            # one-time permutation into cluster-major: the (C, m) slot
            # gather IS the layout (pads masked to exact zero) — no
            # scatter anywhere (TPU scatters serialize per row)
            rhs_cm = (rhs[d.clusters] * mask.astype(rhs.dtype)).reshape(-1)

            if isinstance(op, MlfmmTreeOperator):

                def mv(y):
                    xc = y.reshape(c, m)
                    nlev = len(d.levels)
                    mu = [None] * nlev
                    mu[-1] = _bmv(d.t_tensor, xc)
                    for i in range(nlev - 1, 0, -1):
                        lv = d.levels[i]
                        up = (mu[i] @ lv.interp_up.T.astype(mu[i].dtype)) * lv.shift_up
                        mu[i - 1] = jnp.sum(
                            jnp.take(up, lv.children_idx, axis=0)
                            * lv.children_mask[:, :, None].astype(up.dtype),
                            axis=1,
                        )
                    loc = None
                    for i in range(nlev):
                        lv = d.levels[i]
                        if lv.trans_op.shape[0]:
                            contrib = lv.trans_op.astype(mu[i].dtype) * mu[i][lv.trans_src]
                            if lv.sel is not None:
                                lam = jax.lax.complex(
                                    lv.sel @ jnp.real(contrib),
                                    lv.sel @ jnp.imag(contrib),
                                ).astype(contrib.dtype)
                            else:
                                cp = jnp.concatenate(
                                    [contrib,
                                     jnp.zeros((1, contrib.shape[1]), contrib.dtype)]
                                )
                                lam = jnp.sum(
                                    jnp.take(cp, lv.trans_of_tgt, axis=0), axis=1
                                )
                        else:
                            lam = jnp.zeros_like(mu[i])
                        if loc is not None:
                            lam = lam + (loc[lv.parent] * lv.shift_down) @ (
                                lv.interp_down.T.astype(lam.dtype)
                            )
                        loc = lam
                    far = d.prefactor * jnp.sum(
                        d.s_tensor
                        * (d.quad_w.astype(y.dtype)[None, :, None] * loc[:, :, None]),
                        axis=1,
                    )
                    near = _bmv(d.near_blocks, xc[d.near_a])
                    nearp = jnp.concatenate(
                        [near, jnp.zeros((1, near.shape[1]), near.dtype)]
                    )
                    near_t = jnp.sum(jnp.take(nearp, d.near_of_tgt, axis=0), axis=1)
                    tot = (far + near_t) * mask.astype(y.dtype)
                    return (tot + diag_cm * xc).reshape(-1)

            elif isinstance(op, SlfmmOperator):

                def mv(y):
                    xc = y.reshape(c, m)
                    mu = _bmv(d.t_tensor, xc)
                    lam = jnp.sum(d.d_tensor * mu[None, :, :], axis=1)
                    far = d.prefactor * jnp.sum(
                        d.s_tensor
                        * (d.quad_w.astype(y.dtype)[None, :, None] * lam[:, :, None]),
                        axis=1,
                    )
                    near = _bmv(d.near_blocks, xc[d.near_a])
                    nearp = jnp.concatenate(
                        [near, jnp.zeros((1, near.shape[1]), near.dtype)]
                    )
                    near_t = jnp.sum(jnp.take(nearp, d.near_of_tgt, axis=0), axis=1)
                    tot = (far + near_t) * mask.astype(y.dtype)
                    return (tot + diag_cm * xc).reshape(-1)

            else:  # pragma: no cover - guarded by the public builders
                raise TypeError(f"unsupported operator {type(op).__name__}")

            if pre is not None:
                pinv = pre.inv

                def pre_mv(r):
                    rc = r.reshape(c, m) * pre.mask.astype(r.dtype)
                    b2 = jnp.concatenate([jnp.real(rc), jnp.imag(rc)], axis=1)
                    x2 = _bmv(pinv.astype(b2.dtype), b2)
                    xc = jax.lax.complex(x2[:, :m], x2[:, m:]).astype(r.dtype)
                    return (xc * pre.mask.astype(r.dtype)).reshape(-1)

            else:
                pre_mv = None

            sol = gmres(mv, rhs_cm, config=config, preconditioner=pre_mv)
            x = sol.x[d.elem_pos]  # back to element order, once
            return jnp.real(x), jnp.imag(x), sol.iterations, sol.converged

    return solve
