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
