"""Krylov solvers: CG, BiCGStab, CGS, restarted GMRES — pure JAX.

Counterpart of math-solvers/src/iterative/ (gmres.rs:96-434, cg.rs:49,
bicgstab.rs:46, cgs.rs:46, gmres_pipelined.rs). Differences by design:

- Everything runs inside ``lax.while_loop``/``lax.fori_loop`` with static
  shapes, so solvers jit once and vmap over frequency batches (the
  reference parallelizes over frequencies with rayon instead;
  room_simulator_fem.rs:1139).
- GMRES orthogonalizes with *twice-iterated classical Gram-Schmidt*
  (CGS2) instead of modified Gram-Schmidt: two (m x n) matmuls per
  iteration on the MXU rather than a sequential projection loop. CGS2 is
  numerically equivalent to MGS for Krylov bases ("twice is enough").
- There is no separate pipelined GMRES: the latency the reference's
  gmres_pipelined.rs:1-18 hides (global reductions vs SpMV) is hidden by
  XLA's scheduler + ICI collective overlap when the operator is sharded.
- Complex arithmetic is native (conjugate inner products, complex Givens
  rotations) and the same code path serves f32/f64/c64/c128.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from mathaudio_tpu.solvers.operators import LinearOperator, as_matvec


class KrylovConfig(NamedTuple):
    """Solver configuration (gmres.rs:16 GmresConfig analog)."""

    max_iterations: int = 1000
    tolerance: float = 1e-8
    restart: int = 30  # GMRES only
    atol: float = 0.0


class KrylovSolution(NamedTuple):
    """Solution + convergence info (gmres.rs:84 GmresSolution analog)."""

    x: jnp.ndarray
    iterations: jnp.ndarray  # int32 scalar
    residual_norm: jnp.ndarray  # real scalar
    converged: jnp.ndarray  # bool scalar


def _vdot(x, y, axis_name=None):
    """Conjugate inner product <x, y>; psum over ``axis_name`` when the
    vectors are row-sharded under shard_map (the reference's global
    reductions, blas_helpers.rs:21, become ICI collectives)."""
    s = jnp.sum(jnp.conj(x) * y)
    return jax.lax.psum(s, axis_name) if axis_name is not None else s


def _norm(x, axis_name=None):
    s = jnp.sum(jnp.abs(x) ** 2).real
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
    return jnp.sqrt(s)


def _prep(a, m, b):
    a_mv = as_matvec(a)
    m_mv = as_matvec(m) if m is not None else (lambda x: x)
    return a_mv, m_mv


def _reduce_fns(axis_name):
    """(vdot, norm) closed over the mesh axis (None = single device)."""
    return partial(_vdot, axis_name=axis_name), partial(_norm, axis_name=axis_name)


def cg(a, b, x0=None, config: KrylovConfig = KrylovConfig(), preconditioner=None,
       axis_name=None):
    """Conjugate gradients for SPD/HPD systems (cg.rs:49).

    ``axis_name``: name of a device-mesh axis the vectors are row-sharded
    over (inside shard_map); inner products/norms then psum over it.
    """
    _vdot, _norm = _reduce_fns(axis_name)
    a_mv, m_mv = _prep(a, preconditioner, b)
    b = jnp.asarray(b)
    x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    b_norm = jnp.maximum(_norm(b), 1e-30)
    tol = config.tolerance * b_norm + config.atol

    r0 = b - a_mv(x0)
    z0 = m_mv(r0)
    p0 = z0
    rz0 = _vdot(r0, z0)

    def cond(state):
        _, r, _, _, k, _ = state
        return (_norm(r) > tol) & (k < config.max_iterations)

    def body(state):
        x, r, p, rz, k, _ = state
        ap = a_mv(p)
        alpha = rz / _vdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = m_mv(r)
        rz_new = _vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, p, rz_new, k + 1, _norm(r))

    init = (x0, r0, p0, rz0, jnp.int32(0), _norm(r0))
    x, r, _, _, k, res = jax.lax.while_loop(cond, body, init)
    return KrylovSolution(x, k, res / b_norm, res <= tol)


def bicgstab(a, b, x0=None, config: KrylovConfig = KrylovConfig(), preconditioner=None,
             axis_name=None):
    """BiCGStab for general systems (bicgstab.rs:46)."""
    _vdot, _norm = _reduce_fns(axis_name)
    a_mv, m_mv = _prep(a, preconditioner, b)
    b = jnp.asarray(b)
    x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    b_norm = jnp.maximum(_norm(b), 1e-30)
    tol = config.tolerance * b_norm + config.atol

    r0 = b - a_mv(x0)
    r_hat = r0
    one = jnp.ones((), r0.dtype)

    def cond(state):
        _, r, _, _, _, _, _, k, stag = state
        return (_norm(r) > tol) & (k < config.max_iterations) & (~stag)

    def body(state):
        x, r, p, v, rho, alpha, omega, k, _ = state
        rho_new = _vdot(r_hat, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        p_hat = m_mv(p)
        v = a_mv(p_hat)
        denom = _vdot(r_hat, v)
        alpha = rho_new / denom
        s = r - alpha * v
        s_hat = m_mv(s)
        t = a_mv(s_hat)
        tt = _vdot(t, t)
        omega = jnp.where(jnp.abs(tt) > 0, _vdot(t, s) / tt, jnp.zeros((), r.dtype))
        x = x + alpha * p_hat + omega * s_hat
        r = s - omega * t
        stag = (jnp.abs(rho_new) < 1e-30) | (jnp.abs(omega) < 1e-30)
        return (x, r, p, v, rho_new, alpha, omega, k + 1, stag)

    init = (x0, r0, jnp.zeros_like(r0), jnp.zeros_like(r0), one, one, one, jnp.int32(0), jnp.asarray(False))
    x, r, *_, k, _ = jax.lax.while_loop(cond, body, init)
    res = _norm(b - a_mv(x))
    return KrylovSolution(x, k, res / b_norm, res <= tol)


def cgs(a, b, x0=None, config: KrylovConfig = KrylovConfig(), preconditioner=None,
        axis_name=None):
    """Conjugate gradient squared (cgs.rs:46)."""
    _vdot, _norm = _reduce_fns(axis_name)
    a_mv, m_mv = _prep(a, preconditioner, b)
    b = jnp.asarray(b)
    x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    b_norm = jnp.maximum(_norm(b), 1e-30)
    tol = config.tolerance * b_norm + config.atol

    r0 = b - a_mv(x0)
    r_hat = r0
    one = jnp.ones((), r0.dtype)

    # CGS needs q from the previous iteration; carry it explicitly.
    def body2(state):
        x, r, p, q, rho, k, stag = state
        rho_new = _vdot(r_hat, r)
        beta = rho_new / rho
        u = r + beta * q
        p = u + beta * (q + beta * p)
        p_hat = m_mv(p)
        v = a_mv(p_hat)
        sigma = _vdot(r_hat, v)
        alpha = rho_new / sigma
        q = u - alpha * v
        uq_hat = m_mv(u + q)
        x = x + alpha * uq_hat
        r = r - alpha * a_mv(uq_hat)
        stag = jnp.abs(rho_new) < 1e-30
        return (x, r, p, q, rho_new, k + 1, stag)

    def cond2(state):
        _, r, _, _, _, k, stag = state
        return (_norm(r) > tol) & (k < config.max_iterations) & (~stag)

    init = (x0, r0, jnp.zeros_like(r0), jnp.zeros_like(r0), one, jnp.int32(0), jnp.asarray(False))
    x, r, *_, k, _ = jax.lax.while_loop(cond2, body2, init)
    res = _norm(b - a_mv(x))
    return KrylovSolution(x, k, res / b_norm, res <= tol)


def _givens(a, b):
    """Complex Givens rotation zeroing b against a (LAPACK clartg-style).

    Returns (c, s, r) with c real >= 0 such that
    [c, s; -conj(s), c] @ [a; b] = [r; 0].
    """
    abs_a = jnp.abs(a)
    abs_b = jnp.abs(b)
    t = jnp.sqrt(abs_a**2 + abs_b**2)
    safe_t = jnp.where(t > 0, t, 1.0)
    phase = jnp.where(abs_a > 0, a / jnp.where(abs_a > 0, abs_a, 1.0), jnp.ones((), a.dtype))
    c = jnp.where(t > 0, abs_a / safe_t, jnp.ones((), abs_a.dtype))
    s = jnp.where(t > 0, phase * jnp.conj(b) / safe_t, jnp.zeros((), a.dtype))
    r = phase * t
    return c, s, r


def qmrcgstab(a, b, x0=None, config: KrylovConfig = KrylovConfig(), preconditioner=None,
              axis_name=None):
    """QMR-CGSTAB (Chan/Gallopoulos/Simoncini/Szeto/Tong 1994): BiCGStab
    with quasi-minimal-residual smoothing — smoother convergence on the
    indefinite BEM systems (reference SolverMethod::QmrCgstab,
    core/types.rs:588)."""
    _vdot, _norm = _reduce_fns(axis_name)
    a_mv, m_mv = _prep(a, preconditioner, b)
    b = jnp.asarray(b)
    x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    b_norm = jnp.maximum(_norm(b), 1e-30)
    tol = config.tolerance * b_norm + config.atol

    r0 = b - a_mv(x0)
    r_hat = r0
    one = jnp.ones((), r0.dtype)
    zero_v = jnp.zeros_like(r0)
    rdt = _norm(r0).dtype

    def cond(state):
        tau, k, stag = state[8], state[11], state[12]
        # ||r_k|| <= tau * sqrt(2k+1) (QMR bound); stop when the bound
        # clears the tolerance, exact residual re-checked at exit
        bound = tau * jnp.sqrt(2.0 * k.astype(tau.dtype) + 1.0)
        return (bound > tol) & (k < config.max_iterations) & (~stag)

    def body(state):
        x, r, p, v, d, rho, alpha, omega, tau, theta, eta, k, _ = state
        rho_new = _vdot(r_hat, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        p_hat = m_mv(p)
        v = a_mv(p_hat)
        alpha = rho_new / _vdot(r_hat, v)
        s = r - alpha * v
        # first quasi-minimization half-step
        theta1 = _norm(s) / tau
        c1 = 1.0 / jnp.sqrt(1.0 + theta1**2)
        tau1 = tau * theta1 * c1
        eta1 = (c1**2) * alpha
        d1 = p_hat + d * ((theta**2) * eta / alpha)
        x = x + eta1 * d1
        s_hat = m_mv(s)
        t = a_mv(s_hat)
        tt = _vdot(t, t)
        omega = jnp.where(jnp.abs(tt) > 0, _vdot(t, s) / tt, jnp.zeros((), r.dtype))
        r = s - omega * t
        # second quasi-minimization half-step
        theta_n = _norm(r) / tau1
        c2 = 1.0 / jnp.sqrt(1.0 + theta_n**2)
        tau_n = tau1 * theta_n * c2
        eta_n = (c2**2) * omega
        d_n = s_hat + d1 * ((theta1**2) * eta1 / omega)
        x = x + eta_n * d_n
        stag = (jnp.abs(rho_new) < 1e-30) | (jnp.abs(omega) < 1e-30)
        return (x, r, p, v, d_n, rho_new, alpha, omega, tau_n, theta_n, eta_n,
                k + 1, stag)

    tau0 = _norm(r0)
    init = (x0, r0, zero_v, zero_v, zero_v, one, one, one, tau0,
            jnp.zeros((), rdt), jnp.zeros((), r0.dtype), jnp.int32(0),
            jnp.asarray(False))
    x, r, *_, k, _ = jax.lax.while_loop(cond, body, init)
    res = _norm(b - a_mv(x))
    return KrylovSolution(x, k, res / b_norm, res <= tol)


def gmres(
    a,
    b,
    x0=None,
    config: KrylovConfig = KrylovConfig(),
    preconditioner=None,
    axis_name=None,
):
    """Restarted GMRES(m) with left preconditioning (gmres.rs:96-434).

    Arnoldi via CGS2 (two classical Gram-Schmidt passes = two MXU
    matmuls), Givens-rotation least squares, relative-residual stopping.
    Batched use: ``jax.vmap(partial(gmres, config=...))(A_batch, b_batch)``.

    ``axis_name``: mesh axis the vectors are row-sharded over (inside
    shard_map). All inner products, norms, and CGS2 projections psum over
    it; the Hessenberg/Givens least squares is tiny and runs replicated on
    every device. The restart length is then taken from config as-is (the
    local shard length no longer bounds the global Krylov dimension).

    Two constraints from the early-exit Arnoldi ``lax.while_loop``:

    - Not reverse-differentiable: ``while_loop`` has no transpose rule,
      so ``jax.grad`` through gmres fails at trace time. Use a custom
      implicit-function VJP (solve A^H lambda = dL/dx) if gradients are
      ever needed.
    - Inside ``shard_map`` (check_vma=False) the ``done`` flag MUST be
      bitwise-replicated across devices: it is derived exclusively from
      psum-reduced scalars (norms / Givens residuals), which keeps it
      uniform. A future operator whose matvec mixes in device-varying
      state would make devices exit on different iterations and deadlock
      the collectives inside the matvec.
    """
    if isinstance(x0, KrylovConfig):
        raise TypeError("pass the solver config as gmres(a, b, config=...); "
                        "the third positional argument is the initial guess x0")
    _vdot, _norm = _reduce_fns(axis_name)
    psum = (lambda v: jax.lax.psum(v, axis_name)) if axis_name is not None else (lambda v: v)
    a_mv, m_mv = _prep(a, preconditioner, b)
    b = jnp.asarray(b)
    n = b.shape[0]
    m = config.restart if axis_name is not None else min(config.restart, n)
    dtype = b.dtype
    rdtype = jnp.zeros((), dtype).real.dtype

    # One preconditioner application M b serves three roles: the
    # left-preconditioned reference norm, the initial residual (when
    # x0 is None, r0 = M(b - A*0) = M b), and the first Arnoldi vector.
    # With an expensive preconditioner (e.g. a multigrid V-cycle) this
    # saves two full applications per solve versus recomputing each.
    mb = m_mv(b)
    b_norm = jnp.maximum(_norm(mb), 1e-30)
    tol = jnp.asarray(config.tolerance, rdtype) * b_norm + config.atol
    if x0 is None:
        x0 = jnp.zeros_like(b)
        r_pre0 = mb
    else:
        x0 = jnp.asarray(x0)
        r_pre0 = m_mv(b - a_mv(x0))

    def cycle(x, r0, total_it):
        beta = _norm(r0)
        safe_beta = jnp.where(beta > 0, beta, 1.0)
        v0 = r0 / safe_beta.astype(dtype)

        basis = jnp.zeros((m + 1, n), dtype).at[0].set(v0)
        hess = jnp.zeros((m + 1, m), dtype)  # Givens-reduced in place
        cs = jnp.zeros((m,), rdtype)
        sn = jnp.zeros((m,), dtype)
        g = jnp.zeros((m + 1,), dtype).at[0].set(beta.astype(dtype))

        def arnoldi_step(j, carry):
            basis, hess, cs, sn, g, res, done, cnt = carry
            cnt = cnt + jnp.where(done, 0, 1).astype(jnp.int32)
            w = m_mv(a_mv(basis[j]))
            mask = (jnp.arange(m + 1) <= j).astype(dtype)
            # CGS2: two classical Gram-Schmidt passes. Under a sharded
            # basis each projection is a local (m+1, n_loc) matvec + one
            # psum — exactly the single-reduction-per-pass structure
            # pipelined GMRES exists to optimize (see gmres_pipelined).
            h1 = mask * psum(jnp.conj(basis) @ w)
            w = w - basis.T @ h1
            h2 = mask * psum(jnp.conj(basis) @ w)
            w = w - basis.T @ h2
            h = h1 + h2  # (m+1,), full column j of H
            h_last = _norm(w)
            safe_h = jnp.where(h_last > 1e-30, h_last, 1.0)
            basis = basis.at[j + 1].set(jnp.where(done, basis[j + 1], w / safe_h.astype(dtype)))
            h = h.at[j + 1].set(h_last.astype(dtype))

            # Apply previous rotations to column h (rows 0..j).
            def rot(i, hcol):
                hi = hcol[i]
                hi1 = hcol[i + 1]
                active = i < j
                new_i = cs[i] * hi + sn[i] * hi1
                new_i1 = -jnp.conj(sn[i]) * hi + cs[i] * hi1
                hcol = hcol.at[i].set(jnp.where(active, new_i, hi))
                hcol = hcol.at[i + 1].set(jnp.where(active, new_i1, hi1))
                return hcol

            h = jax.lax.fori_loop(0, m, rot, h)
            c_j, s_j, r_j = _givens(h[j], h[j + 1])
            h = h.at[j].set(r_j).at[j + 1].set(jnp.zeros((), dtype))
            g_j = g[j]
            g = g.at[j].set(jnp.where(done, g[j], c_j * g_j))
            g = g.at[j + 1].set(jnp.where(done, g[j + 1], -jnp.conj(s_j) * g_j))
            cs = cs.at[j].set(jnp.where(done, cs[j], c_j))
            sn = sn.at[j].set(jnp.where(done, sn[j], s_j))
            hess = jnp.where(done, hess, hess.at[:, j].set(h))
            new_res = jnp.abs(g[j + 1])
            res = jnp.where(done, res, new_res)
            done = done | (new_res <= tol)
            return basis, hess, cs, sn, g, res, done, cnt

        # Early-exit Arnoldi: the masked step is a no-op once ``done``,
        # so iterating while any work remains is numerically identical
        # to the full fori_loop but skips the dead matvecs after
        # convergence — at restart 48 with 37 useful iterations (the
        # chip FMM tier) the fori form burned 23% of the solve in
        # post-convergence operator applications. Under vmap the loop
        # runs to the slowest lane (lockstep max, never more than m);
        # under shard_map ``done`` derives from psum-reduced quantities,
        # so the condition is replicated across devices.
        carry = (basis, hess, cs, sn, g, beta, beta <= tol, jnp.int32(0),
                 jnp.int32(0))

        def step_cond(carry):
            done, j = carry[6], carry[8]
            return (j < m) & ~done

        def step_body(carry):
            j = carry[8]
            out = arnoldi_step(j, carry[:8])
            return out + (j + 1,)

        basis, hess, cs, sn, g, res, done, cnt, _ = jax.lax.while_loop(
            step_cond, step_body, carry
        )

        # Back-substitution R y = g on the m x m reduced system. Rows that
        # never ran (post-convergence) have R[i,i]=0: mask them to identity.
        r_mat = hess[:m, :]
        diag = jnp.abs(jnp.diagonal(r_mat))
        ok = diag > 1e-30
        r_mat = r_mat + jnp.diag(jnp.where(ok, jnp.zeros((m,), dtype), jnp.ones((m,), dtype)))
        rhs = jnp.where(ok, g[:m], jnp.zeros((m,), dtype))
        y = jax.scipy.linalg.solve_triangular(r_mat, rhs, lower=False)
        x_new = x + basis[:m].T @ y
        return x_new, total_it + cnt, res

    # First cycle unrolled outside the while loop: in the common case
    # (restart chosen so one cycle converges) no restart residual is
    # ever computed — the loop body pays for its own starting residual
    # only when a further cycle actually runs. Convergence is decided on
    # the cycle's Givens residual estimate (gmres.rs stops the same
    # way): deciding on the true residual instead makes marginal lanes
    # of a vmapped batch rerun a whole restart cycle, which the entire
    # batch then pays for.
    r_init = _norm(r_pre0)
    if config.max_iterations <= 0:
        # Iteration budget of zero: report convergence state of x0 only.
        return KrylovSolution(x0, jnp.int32(0), r_init / b_norm, r_init <= tol)

    x1, it1, res1 = cycle(x0, r_pre0, jnp.int32(0))

    def outer_cond(state):
        _, it, res, converged = state
        return (~converged) & (it < config.max_iterations)

    def outer_body(state):
        x, it, _, _ = state
        r_pre = m_mv(b - a_mv(x))
        x, it, res = cycle(x, r_pre, it)
        return (x, it, res, res <= tol)

    init = (x1, it1, res1, res1 <= tol)
    x, it, res, converged = jax.lax.while_loop(outer_cond, outer_body, init)
    return KrylovSolution(x, it, res / b_norm, converged)


def gmres_pipelined_ghysels(a, b, x0=None, config=KrylovConfig(), preconditioner=None,
                            axis_name=None):
    """True Ghysels p(1)-GMRES (Ghysels, Ashby, Meerbergen, Vanroose 2013;
    gmres_pipelined.rs:1-18): one *fused* global reduction per iteration.

    The classical-Gram-Schmidt projections and the candidate norm are
    computed in a single reduction (the norm via the Pythagorean trick
    ||w_perp||^2 = ||w||^2 - sum|h_i|^2), and the auxiliary basis
    Z = M A V advances by the same recurrence as V, so the next matvec
    M A z_j is issued before the current reduction's results are needed —
    the latency-hiding structure the reference implements. Kept as an
    experimental variant for measurement (see gmres_pipelined's decision
    record): the Pythagorean norm is less robust than CGS2 near
    convergence, so the production solver remains ``gmres``.
    """
    _vdot, _norm = _reduce_fns(axis_name)
    psum = (lambda v: jax.lax.psum(v, axis_name)) if axis_name is not None else (lambda v: v)
    a_mv, m_mv = _prep(a, preconditioner, b)
    ma_mv = lambda x: m_mv(a_mv(x))
    b = jnp.asarray(b)
    n = b.shape[0]
    m = config.restart if axis_name is not None else min(config.restart, n)
    dtype = b.dtype
    rdtype = jnp.zeros((), dtype).real.dtype

    mb = m_mv(b)
    b_norm = jnp.maximum(_norm(mb), 1e-30)
    tol = jnp.asarray(config.tolerance, rdtype) * b_norm + config.atol
    if x0 is None:
        x0 = jnp.zeros_like(b)
        r_pre0 = mb
    else:
        x0 = jnp.asarray(x0)
        r_pre0 = m_mv(b - a_mv(x0))

    def cycle(x, r0, total_it):
        beta = _norm(r0)
        safe_beta = jnp.where(beta > 0, beta, 1.0)
        v0 = r0 / safe_beta.astype(dtype)

        basis = jnp.zeros((m + 1, n), dtype).at[0].set(v0)
        zbasis = jnp.zeros((m + 1, n), dtype).at[0].set(ma_mv(v0))
        hess = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros((m,), rdtype)
        sn = jnp.zeros((m,), dtype)
        g = jnp.zeros((m + 1,), dtype).at[0].set(beta.astype(dtype))

        def step(j, carry):
            basis, zbasis, hess, cs, sn, g, res, done, cnt = carry
            cnt = cnt + jnp.where(done, 0, 1).astype(jnp.int32)
            z = zbasis[j]  # = M A v_j, computed one iteration ahead
            # THE single fused reduction: projections + candidate norm^2.
            mask = (jnp.arange(m + 1) <= j).astype(dtype)
            local = jnp.concatenate(
                [jnp.conj(basis) @ z, jnp.sum(jnp.abs(z) ** 2)[None].astype(dtype)]
            )
            red = psum(local)
            h = mask * red[: m + 1]
            z2 = red[m + 1].real
            # issue the next matvec before using the reduction (XLA is free
            # to overlap the collective with this local work)
            w = ma_mv(z)
            h2 = z2 - jnp.sum(jnp.abs(h) ** 2)
            # Square-root breakdown (the p1 recurrence's known weakness):
            # the Pythagorean subtraction cancels to rounding noise once
            # the candidate is nearly in span(V). Stop the cycle and let
            # the outer loop restart from the true residual.
            breakdown = h2 <= 4.0 * jnp.finfo(rdtype).eps * z2
            h_last = jnp.sqrt(jnp.maximum(h2, 0.0))
            safe_h = jnp.where(h_last > 1e-30, h_last, 1.0)
            v_next = (z - basis.T @ h) / safe_h.astype(dtype)
            z_next = (w - zbasis.T @ h) / safe_h.astype(dtype)
            basis = basis.at[j + 1].set(jnp.where(done, basis[j + 1], v_next))
            zbasis = zbasis.at[j + 1].set(jnp.where(done, zbasis[j + 1], z_next))
            h = h.at[j + 1].set(h_last.astype(dtype))

            def rot(i, hcol):
                hi, hi1 = hcol[i], hcol[i + 1]
                active = i < j
                new_i = cs[i] * hi + sn[i] * hi1
                new_i1 = -jnp.conj(sn[i]) * hi + cs[i] * hi1
                hcol = hcol.at[i].set(jnp.where(active, new_i, hi))
                hcol = hcol.at[i + 1].set(jnp.where(active, new_i1, hi1))
                return hcol

            h = jax.lax.fori_loop(0, m, rot, h)
            c_j, s_j, r_j = _givens(h[j], h[j + 1])
            h = h.at[j].set(r_j).at[j + 1].set(jnp.zeros((), dtype))
            g_j = g[j]
            g = g.at[j].set(jnp.where(done, g[j], c_j * g_j))
            g = g.at[j + 1].set(jnp.where(done, g[j + 1], -jnp.conj(s_j) * g_j))
            cs = cs.at[j].set(jnp.where(done, cs[j], c_j))
            sn = sn.at[j].set(jnp.where(done, sn[j], s_j))
            hess = jnp.where(done, hess, hess.at[:, j].set(h))
            new_res = jnp.abs(g[j + 1])
            # on breakdown the Givens residual is meaningless (s_j ~ 0):
            # freeze the previous estimate so convergence isn't declared
            res = jnp.where(done | breakdown, res, new_res)
            done = done | (new_res <= tol) | breakdown
            return basis, zbasis, hess, cs, sn, g, res, done, cnt

        carry = (basis, zbasis, hess, cs, sn, g, beta, beta <= tol, jnp.int32(0))
        basis, zbasis, hess, cs, sn, g, res, done, cnt = jax.lax.fori_loop(0, m, step, carry)

        r_mat = hess[:m, :]
        diag = jnp.abs(jnp.diagonal(r_mat))
        ok = diag > 1e-30
        r_mat = r_mat + jnp.diag(jnp.where(ok, jnp.zeros((m,), dtype), jnp.ones((m,), dtype)))
        rhs = jnp.where(ok, g[:m], jnp.zeros((m,), dtype))
        y = jax.scipy.linalg.solve_triangular(r_mat, rhs, lower=False)
        return x + basis[:m].T @ y, total_it + cnt, res

    if config.max_iterations <= 0:
        r_init = _norm(r_pre0)
        return KrylovSolution(x0, jnp.int32(0), r_init / b_norm, r_init <= tol)

    x1, it1, res1 = cycle(x0, r_pre0, jnp.int32(0))

    def outer_cond(state):
        _, it, res, converged = state
        return (~converged) & (it < config.max_iterations)

    def outer_body(state):
        x, it, _, _ = state
        r_pre = m_mv(b - a_mv(x))
        x, it, res = cycle(x, r_pre, it)
        return (x, it, res, res <= tol)

    init = (x1, it1, res1, res1 <= tol)
    x, it, res, converged = jax.lax.while_loop(outer_cond, outer_body, init)
    return KrylovSolution(x, it, res / b_norm, converged)


def gmres_with_guess(a, b, x0, config=KrylovConfig(), preconditioner=None, axis_name=None):
    """Parity alias (gmres.rs:105 gmres_with_guess)."""
    return gmres(a, b, x0=x0, config=config, preconditioner=preconditioner,
                 axis_name=axis_name)


def gmres_pipelined(a, b, x0=None, config=KrylovConfig(), preconditioner=None,
                    axis_name=None):
    """Pipelined GMRES entry point (gmres_pipelined.rs:1-18, Ghysels 2013).

    Decision record (VERDICT r1 item 9, measured with
    examples/pipelined_gmres_study.py; correctness gated by
    tests/test_spmd.py::test_pipelined_gmres_decision): on an 8-device
    mesh with a row-sharded n=262144 banded operator, the true Ghysels
    p(1) variant (``gmres_pipelined_ghysels``: one fused reduction per
    iteration, next SpMV issued before the reduction is consumed) ran at
    0.46x the speed of standard CGS2-GMRES at identical iteration counts
    (17.2 s vs 7.8 s per solve, tol 1e-12). XLA already overlaps the
    psum with local SpMV work, so the p1 rearrangement buys nothing here,
    while its auxiliary Z-basis costs one extra preconditioned matvec of
    local work per iteration and its Pythagorean norm breaks down near
    convergence (forcing restarts). The standard solver therefore remains
    the implementation; the name is kept so SolverType dispatch tables
    match the reference.
    """
    return gmres(a, b, x0=x0, config=config, preconditioner=preconditioner,
                 axis_name=axis_name)
