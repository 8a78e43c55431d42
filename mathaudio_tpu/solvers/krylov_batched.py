"""Node-major batched GMRES: one explicit trace solving F systems at once.

The frequency-sweep solvers elsewhere vmap a single-vector GMRES over the
band, which places the batch axis first: vectors are (F, N) and every
SpMV gathers along the 128-lane minor axis — the address-bound form
(ARCHITECTURE.md §10, 142 GB/s effective). This module is the same
algorithm — restarted GMRES(m), CGS2 Arnoldi, Givens least squares,
lockstep per-lane convergence (solvers/krylov.py gmres; gmres.rs:96-434)
— written directly on node-major (N, F) batches so the operator can be a
DIA streaming matvec (fem/dia.py, 716 GB/s) and the frequency axis lives
in vector lanes end to end.

Everything per-frequency becomes an (F,) lane vector: norms, Givens
rotations, the reduced Hessenberg system, convergence flags, iteration
counts. The while/fori control mirrors the single-vector solver exactly
(first restart cycle unrolled; convergence decided on the Givens
residual) so iteration counts match the vmapped solver lane for lane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mathaudio_tpu.solvers.krylov import KrylovConfig, KrylovSolution, _givens


def _bnorm(v):
    """(N, F) -> (F,) 2-norm over nodes."""
    return jnp.sqrt(jnp.sum(jnp.abs(v) ** 2, axis=0))


def _dotc(bj, w):
    """Lane-batched projections <b_i, w>: (j+1, N, F), (N, F) -> (j+1, F).

    Written as multiply + reduce rather than einsum: einsum lowers this
    contraction to dot_general with F as a batch dimension, which
    relayouts the (j+1, N, F) basis block (batch dims lead in the MXU
    lowering) — a full transpose of up to 1 GB per Arnoldi step at
    headline shapes. The reduce form streams the basis in place over the
    sublane axis at copy bandwidth (measured on the bench chip:
    reproduce with ``python examples/fem_roofline_nm.py`` — its cgs-dot
    stage times exactly this contraction both ways; summary in
    ARCHITECTURE.md §10)."""
    return jnp.sum(jnp.conj(bj) * w[None], axis=1)


def _expand(h, bj):
    """Sum_i h[i] b_i: (j+1, F), (j+1, N, F) -> (N, F) (same rationale)."""
    return jnp.sum(h[:, None, :] * bj, axis=0)


def gmres_batched(a_mv, b, config: KrylovConfig = KrylovConfig(), preconditioner=None,
                  orth: str = "cgs2", x0=None):
    """Solve F systems A_f x_f = b_f, vectors stored (N, F).

    ``a_mv`` / ``preconditioner``: (N, F) -> (N, F), applying each lane's
    operator to its column. Returns KrylovSolution with x (N, F),
    iterations (F,) int32, residual (F,), converged (F,) bool.

    ``x0``: optional (N, F) warm start (one extra matvec to form the
    initial residual; convergence stays gated on ``tol * ||M b||`` so a
    warm-started solve accepts exactly the solutions a cold one would —
    the anchor-interpolated sweep in models/room_sweep_nm.py is the
    production user).

    ``orth``: Arnoldi orthogonalization. "cgs2" (default, two classical
    Gram-Schmidt passes — the robust choice matching solvers.krylov.gmres)
    or "cgs1" (single pass: half the basis traffic per step, 2 sweeps
    instead of 4). CGS1 loses orthogonality like cond(H)^2, which is safe
    only for strongly preconditioned systems with short cycles (e.g. the
    MG-preconditioned room sweep at restart 6, where the measured true
    residuals match CGS2 to the convergence tolerance — see bench.py
    --orth and tests/test_nodemajor.py); keep cgs2 anywhere ill-
    conditioned. Convergence flags remain gated on the Givens residual
    either way."""
    if orth not in ("cgs1", "cgs2"):
        raise ValueError(f"unknown orthogonalization {orth!r}")
    m_mv = preconditioner if preconditioner is not None else (lambda v: v)
    b = jnp.asarray(b)
    n, nf = b.shape
    m = min(config.restart, n)
    dtype = b.dtype
    rdtype = jnp.zeros((), dtype).real.dtype

    # One preconditioner application of b: reference norm + initial
    # residual + first Arnoldi vector (same reuse as solvers.krylov.gmres).
    mb = m_mv(b)
    b_norm = jnp.maximum(_bnorm(mb), 1e-30)
    tol = jnp.asarray(config.tolerance, rdtype) * b_norm + config.atol

    if x0 is None:
        x0 = jnp.zeros_like(b)
        r_pre0 = mb
    else:
        x0 = jnp.asarray(x0, dtype)
        r_pre0 = m_mv(b - a_mv(x0))

    def cycle(x, r0, total_it):
        beta = _bnorm(r0)  # (F,)
        safe_beta = jnp.where(beta > 0, beta, 1.0)
        v0 = r0 / safe_beta.astype(dtype)[None, :]

        basis = jnp.zeros((m + 1, n, nf), dtype).at[0].set(v0)
        hess = jnp.zeros((m + 1, m, nf), dtype)
        cs = jnp.zeros((m, nf), rdtype)
        sn = jnp.zeros((m, nf), dtype)
        g = jnp.zeros((m + 1, nf), dtype).at[0].set(beta.astype(dtype))

        def arnoldi_step(j, carry):
            # ``j`` is a static Python int: the Arnoldi recurrence is
            # unrolled at trace time so each CGS2 projection reads only
            # the ``j + 1`` basis vectors that exist — the fori_loop form
            # swept the full (m+1, N, F) buffer (mask-zeroed) every step,
            # 1.56x the HBM traffic at m=6 for identical numerics.
            basis, hess, cs, sn, g, res, done, cnt = carry
            cnt = cnt + jnp.where(done, 0, 1).astype(jnp.int32)
            w = m_mv(a_mv(basis[j]))
            bj = basis[: j + 1]  # (j+1, N, F) static slice
            # CGS: classical Gram-Schmidt passes; each projection is
            # one (j+1, N, F)x(N, F) lane-batched contraction over nodes.
            h1 = _dotc(bj, w)
            w = w - _expand(h1, bj)
            if orth == "cgs2":
                h2 = _dotc(bj, w)
                w = w - _expand(h2, bj)
                h1 = h1 + h2
            pad = jnp.zeros((m - j, nf), dtype)
            h = jnp.concatenate([h1, pad])  # (m+1, F): column j
            h_last = _bnorm(w)
            safe_h = jnp.where(h_last > 1e-30, h_last, 1.0)
            v_next = w / safe_h.astype(dtype)[None, :]
            basis = basis.at[j + 1].set(
                jnp.where(done[None, :], basis[j + 1], v_next)
            )
            h = h.at[j + 1].set(h_last.astype(dtype))

            for i in range(j):  # static: apply the j existing rotations
                hi, hi1 = h[i], h[i + 1]
                h = h.at[i].set(cs[i] * hi + sn[i] * hi1)
                h = h.at[i + 1].set(-jnp.conj(sn[i]) * hi + cs[i] * hi1)
            # _givens is fully elementwise, so it applies per-lane on (F,)
            # arrays — the single-vector solver's exact rotation, shared
            # to keep the lane-for-lane parity contract by construction.
            c_j, s_j, r_j = _givens(h[j], h[j + 1])
            h = h.at[j].set(r_j).at[j + 1].set(jnp.zeros((nf,), dtype))
            g_j = g[j]
            g = g.at[j].set(jnp.where(done, g[j], c_j * g_j))
            g = g.at[j + 1].set(jnp.where(done, g[j + 1], -jnp.conj(s_j) * g_j))
            cs = cs.at[j].set(jnp.where(done, cs[j], c_j))
            sn = sn.at[j].set(jnp.where(done, sn[j], s_j))
            hess = hess.at[:, j].set(jnp.where(done[None, :], hess[:, j], h))
            new_res = jnp.abs(g[j + 1])
            res = jnp.where(done, res, new_res)
            done = done | (new_res <= tol)
            return basis, hess, cs, sn, g, res, done, cnt

        carry = (basis, hess, cs, sn, g, beta, beta <= tol,
                 jnp.zeros((nf,), jnp.int32))
        for j in range(m):  # trace-time unroll (see arnoldi_step)
            carry = arnoldi_step(j, carry)
        basis, hess, cs, sn, g, res, done, cnt = carry

        # Per-lane back-substitution R y = g (m x m upper triangular,
        # explicit loop — m is small and everything is (F,) elementwise).
        diag = jnp.abs(hess[jnp.arange(m), jnp.arange(m)])  # (m, F)
        ok = diag > 1e-30
        rhs = jnp.where(ok, g[:m], jnp.zeros((m, nf), dtype))
        y = jnp.zeros((m, nf), dtype)

        def back(i_rev, y):
            i = m - 1 - i_rev
            acc = rhs[i] - jnp.sum(hess[i, :, :] * y, axis=0)
            di = jnp.where(ok[i], hess[i, i], jnp.ones((nf,), dtype))
            return y.at[i].set(jnp.where(ok[i], acc / di, jnp.zeros((nf,), dtype)))

        y = jax.lax.fori_loop(0, m, back, y)
        x_new = x + _expand(y, basis[:m])
        return x_new, total_it + cnt, res

    r_init = _bnorm(r_pre0)
    if config.max_iterations <= 0:
        return KrylovSolution(x0, jnp.zeros((nf,), jnp.int32),
                              r_init / b_norm, r_init <= tol)

    x1, it1, res1 = cycle(x0, r_pre0, jnp.zeros((nf,), jnp.int32))

    def outer_cond(state):
        _, it, res, converged = state
        return jnp.any((~converged) & (it < config.max_iterations))

    def outer_body(state):
        x, it, _, _ = state
        # Converged lanes pass through unchanged: their restart residual
        # is below tol, so the cycle's done-masking leaves basis rows
        # unwritten, back-substitution sees zero diagonals and returns
        # y = 0 (same lockstep protection as the vmapped solver).
        r_pre = m_mv(b - a_mv(x))
        x, it, res = cycle(x, r_pre, it)
        return (x, it, res, res <= tol)

    init = (x1, it1, res1, res1 <= tol)
    x, it, res, converged = jax.lax.while_loop(outer_cond, outer_body, init)
    return KrylovSolution(x, it, res / b_norm, converged)
