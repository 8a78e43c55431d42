"""Multi-device FMM: cluster-sharded SLFMM matvec + solve over a mesh.

The SLFMM matvec A x = c x + N x + S D T x is dominated by three batched
cluster GEMM families (aggregation T, translation D, disaggregation S —
math-bem/src/core/solver/batched_blas.rs:21-320) plus the near-field
block GEMMs. This module shards all four along the TARGET-CLUSTER axis
of a device mesh while keeping the vector x replicated — the
tensor-parallel layout for an operator whose spectra are small but whose
per-cluster tensors are large:

- each device owns C/n_dev clusters: its rows of the aggregation /
  disaggregation tensors, its target rows of the translation tensor, and
  exactly the near-field pairs whose TARGET cluster it owns;
- one ``all_gather`` (tiled, over ICI) publishes the per-device outgoing
  spectra mu = T x so every device can translate from all sources;
- a second ``all_gather`` collects the per-device element outputs; the
  (replicated) identity/self-term diagonal closes the matvec.

Two collectives per matvec, both small (spectra (C, Q) and outputs
(N,)); all heavy GEMMs stay device-local. The whole GMRES solve runs
inside one ``shard_map`` with the vector replicated, so reductions need
no psum (every device computes them identically).

Reference analog: the rayon-parallel batched FMM matvec
(batched_blas.rs:237 slfmm_matvec_batched) — re-expressed as SPMD over
the TPU device mesh instead of shared-memory threads.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mathaudio_tpu.bem.fmm import SlfmmData
from mathaudio_tpu.solvers import KrylovConfig, gmres
from mathaudio_tpu.solvers.krylov import KrylovSolution


class ShardedSlfmm(NamedTuple):
    """SLFMM tensors stacked on a leading device axis (S, ...).

    Padded so every device owns the same counts: ``c_pad`` clusters and
    ``p_pad`` near pairs (zero blocks / masked slots are inert). Element
    ids of near-pair SOURCE clusters are precomputed (``near_src_elems``)
    so the local near product gathers straight from the replicated x
    without the global cluster table.
    """

    clusters: jnp.ndarray  # (S, Cb, m) element ids of OWNED clusters
    cluster_mask: jnp.ndarray  # (S, Cb, m)
    t_tensor: jnp.ndarray  # (S, Cb, Q, m)
    s_tensor: jnp.ndarray  # (S, Cb, Q, m)
    d_tensor: jnp.ndarray  # (S, Cb, C_pad, Q) target rows of translations
    quad_w: jnp.ndarray  # (Q,) replicated
    near_src_elems: jnp.ndarray  # (S, Pb, m) global element ids
    near_src_mask: jnp.ndarray  # (S, Pb, m)
    near_blocks: jnp.ndarray  # (S, Pb, m, m)
    near_of_tgt: jnp.ndarray  # (S, Cb, Kn) LOCAL pair ids (pad = Pb)
    diag_add: jnp.ndarray  # (N,) replicated
    prefactor: jnp.ndarray  # scalar
    elem_pos: jnp.ndarray  # (N,) flat index into (C_pad * m), replicated


def shard_slfmm(data: SlfmmData, n_shards: int) -> ShardedSlfmm:
    """Host-side build: partition clusters and near pairs by target.

    ``data`` must NOT be in gather_form (the local gather tables are
    rebuilt per shard here); pass the operator's ``.data`` as built by
    ``build_slfmm_system``.
    """
    clusters = np.asarray(data.clusters)
    mask = np.asarray(data.cluster_mask)
    near_a = np.asarray(data.near_a)
    near_b = np.asarray(data.near_b)
    near_blocks = np.asarray(data.near_blocks)

    c, m = clusters.shape
    q = data.t_tensor.shape[1]
    cb = -(-c // n_shards)
    c_pad = cb * n_shards

    def pad_c(a):
        out = np.zeros((c_pad,) + a.shape[1:], a.dtype)
        out[:c] = a
        return out

    clusters_p = pad_c(clusters)
    mask_p = pad_c(mask)
    # Large per-cluster tensors stay on the jax side: a numpy round-trip
    # of the (C, C, Q) translation tensor costs cold-page host bandwidth
    # (~30 MB/s on this host — CLAUDE.md) that dominates the sharded
    # build at production sizes. jnp.pad allocates once in the backend.
    pad_j = lambda a: jnp.pad(jnp.asarray(a), [(0, c_pad - c)] + [(0, 0)] * (a.ndim - 1))
    t_p = pad_j(data.t_tensor)
    s_p = pad_j(data.s_tensor)
    # translations: pad target axis AND source axis to c_pad
    d_p = jnp.pad(jnp.asarray(data.d_tensor),
                  ((0, c_pad - c), (0, c_pad - c), (0, 0)))

    # near pairs grouped by owning device of the TARGET cluster
    dev_of_pair = near_b // cb
    p_per = [np.flatnonzero(dev_of_pair == s) for s in range(n_shards)]
    p_max = max((len(p) for p in p_per), default=1)
    p_max = max(p_max, 1)

    near_src_elems = np.zeros((n_shards, p_max, m), np.int32)
    near_src_mask = np.zeros((n_shards, p_max, m), near_blocks.real.dtype)
    blocks_s = np.zeros((n_shards, p_max, m, m), near_blocks.dtype)
    kn = 1
    tgt_tables = []
    for s in range(n_shards):
        ids = p_per[s]
        if len(ids):
            near_src_elems[s, : len(ids)] = clusters[near_a[ids]]
            near_src_mask[s, : len(ids)] = mask[near_a[ids]]
            blocks_s[s, : len(ids)] = near_blocks[ids]
        # local target table: rows = local cluster index, entries = local
        # pair ids (pad = p_max -> the zero row of the padded product)
        tgt_local = near_b[ids] - s * cb
        counts = np.bincount(tgt_local, minlength=cb) if len(ids) else np.zeros(cb, int)
        kn = max(kn, int(counts.max(initial=0)))
        tgt_tables.append(tgt_local)
    near_of_tgt = np.full((n_shards, cb, kn), p_max, np.int32)
    for s in range(n_shards):
        tgt_local = tgt_tables[s]
        fill = np.zeros(cb, np.int32)
        for p_loc, tl in enumerate(tgt_local):
            near_of_tgt[s, tl, fill[tl]] = p_loc
            fill[tl] += 1

    # element positions into the PADDED flat (c_pad * m) layout
    cidx, sidx = np.nonzero(mask > 0)
    n = int(clusters[cidx, sidx].max()) + 1
    elem_pos = np.zeros(n, np.int32)
    elem_pos[clusters[cidx, sidx]] = (cidx * m + sidx).astype(np.int32)

    sh = lambda a: jnp.asarray(a.reshape((n_shards, cb) + a.shape[1:]))
    return ShardedSlfmm(
        clusters=sh(clusters_p.astype(np.int32)),
        cluster_mask=sh(mask_p),
        t_tensor=sh(t_p),
        s_tensor=sh(s_p),
        d_tensor=sh(d_p),
        quad_w=jnp.asarray(np.asarray(data.quad_w)),
        near_src_elems=jnp.asarray(near_src_elems),
        near_src_mask=jnp.asarray(near_src_mask),
        near_blocks=jnp.asarray(blocks_s),
        near_of_tgt=jnp.asarray(near_of_tgt),
        diag_add=jnp.asarray(np.asarray(data.diag_add)),
        prefactor=jnp.asarray(np.asarray(data.prefactor)),
        elem_pos=jnp.asarray(elem_pos),
    )


def _local_matvec(shard: ShardedSlfmm, x, axis: str):
    """Per-device matvec body (leading shard axis already stripped):
    replicated x in, replicated y out (two tiled all_gathers)."""
    from mathaudio_tpu.bem.fmm import _bmv

    dt = x.dtype
    xc = x[shard.clusters] * shard.cluster_mask.astype(dt)  # (Cb, m)
    # multiply+reduce forms match bem.fmm's matvec lowering exactly
    # (no tiny batched MXU matmuls — see fmm._bmv) and keep the sharded
    # path bit-compatible with the single-device operator
    mu_local = _bmv(shard.t_tensor, xc)  # (Cb, Q)
    mu_full = jax.lax.all_gather(mu_local, axis, tiled=True)  # (C_pad, Q)
    lam = jnp.sum(shard.d_tensor * mu_full[None, :, :], axis=1)  # (Cb, Q)
    far = shard.prefactor * jnp.sum(
        shard.s_tensor
        * (shard.quad_w.astype(dt)[None, :, None] * lam[:, :, None]),
        axis=1,
    )
    xa = x[shard.near_src_elems] * shard.near_src_mask.astype(dt)  # (Pb, m)
    near = _bmv(shard.near_blocks, xa)  # (Pb, m)
    nearp = jnp.concatenate([near, jnp.zeros((1, near.shape[1]), near.dtype)])
    near_t = jnp.sum(jnp.take(nearp, shard.near_of_tgt, axis=0), axis=1)
    tot_local = (far + near_t) * shard.cluster_mask.astype(dt)  # (Cb, m)
    tot_full = jax.lax.all_gather(tot_local, axis, tiled=True)  # (C_pad, m)
    return tot_full.reshape(-1)[shard.elem_pos] + shard.diag_add * x


_STACKED_FIELDS = (
    "clusters", "cluster_mask", "t_tensor", "s_tensor", "d_tensor",
    "near_src_elems", "near_src_mask", "near_blocks", "near_of_tgt",
)


def _shard_spec(axis: str) -> ShardedSlfmm:
    """Per-leaf PartitionSpecs: stacked leaves shard on ``axis``,
    replicated leaves (quadrature, diagonal, element map) don't."""
    return ShardedSlfmm(
        clusters=P(axis), cluster_mask=P(axis), t_tensor=P(axis),
        s_tensor=P(axis), d_tensor=P(axis), quad_w=P(),
        near_src_elems=P(axis), near_src_mask=P(axis),
        near_blocks=P(axis), near_of_tgt=P(axis), diag_add=P(),
        prefactor=P(), elem_pos=P(),
    )


def _strip_device_slice(shard: ShardedSlfmm) -> ShardedSlfmm:
    """Inside shard_map each stacked leaf arrives as a (1, ...) slice."""
    return shard._replace(
        **{f: getattr(shard, f)[0] for f in _STACKED_FIELDS}
    )


def sharded_slfmm_matvec_fn(mesh: Mesh, axis: str = "fmm"):
    """Jittable ``(sharded, x) -> y`` with x and y replicated; the
    cluster GEMMs run device-local inside shard_map."""

    def mv(sharded: ShardedSlfmm, x):
        def local(shard, xv):
            return _local_matvec(_strip_device_slice(shard), xv, axis)

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(_shard_spec(axis), P()),
            out_specs=P(),
            check_vma=False,
        )(sharded, x)

    return mv


def sharded_slfmm_solve_fn(
    mesh: Mesh,
    config: Optional[KrylovConfig] = None,
    axis: str = "fmm",
):
    """Jittable ``(sharded, pre, rhs) -> KrylovSolution``: the whole
    preconditioned GMRES runs inside one shard_map; x stays replicated so
    reductions are computed identically on every device (no psum), while
    every operator application's cluster GEMMs are device-local.

    ``pre`` is any replicated preconditioner pytree with ``.matvec`` (e.g.
    ``ClusterBlockPreconditioner``) or ``None``.
    """
    config = config or KrylovConfig(max_iterations=200, tolerance=1e-5, restart=48)

    def solve(sharded: ShardedSlfmm, pre, rhs):
        pre_spec = jax.tree_util.tree_map(lambda _: P(), pre)

        def local(shard, pre, rhs):
            shard = _strip_device_slice(shard)
            mv = lambda v: _local_matvec(shard, v, axis)
            sol = gmres(mv, rhs, config=config, preconditioner=pre)
            return sol.x, sol.iterations, sol.residual_norm, sol.converged

        x, it, res, conv = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(_shard_spec(axis), pre_spec, P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )(sharded, pre, rhs)
        return KrylovSolution(x, it, res, conv)

    return solve
