"""True multi-device execution: shard_map SpMV with halo exchange,
collective Krylov, device-level additive Schwarz, row-sharded dense BEM.

This is the TPU realization of the reference's shared-memory parallel
numerics as explicit SPMD over a device mesh (SURVEY.md §2.10):

- rayon row-parallel CSR matvec (math-solvers/src/sparse/csr.rs:240)
  -> row-block-sharded ELL SpMV inside ``shard_map``. Two forms: an
  ``all_gather`` form (general sparsity) and a *halo* form for banded
  matrices (structured FEM meshes) where each device fetches only the
  boundary rows of its neighbors via ``ppermute`` — the halo exchange
  rides ICI point-to-point links instead of an all-to-all.
- global reductions in GMRES/CG (blas_helpers.rs:21-130) -> ``psum``
  over the mesh axis (solvers/krylov.py ``axis_name``).
- additive Schwarz (math-solvers/src/preconditioners/schwarz.rs:31-125)
  -> one overlapping subdomain per device: local dense block-inverse
  GEMM + ``ppermute`` halo exchange of residual/solution overlap.
- dense BEM matvec -> row-block sharding of the (N, N) matrix
  (SURVEY.md §5 "shard the dense BEM matrix by row blocks").

Everything here is built host-side from a ``CsrMatrix`` (or dense array)
into static-shape per-shard tensors whose leading axis is the device
axis; inside ``shard_map`` each device sees its own (1, ...) slice.
Static partition metadata (halo widths, true size) lives in pytree aux
data so jitting over these containers keeps it concrete.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mathaudio_tpu.solvers import KrylovConfig, gmres
from mathaudio_tpu.solvers.krylov import KrylovSolution
from mathaudio_tpu.solvers.sparse import CsrMatrix


def partition_rows(n: int, n_shards: int) -> int:
    """Rows per shard, padding n up to a multiple of n_shards."""
    return -(-n // n_shards)


def _neighbor_perm(n_shards: int, shift: int):
    """ppermute permutation sending data from device i to device i+shift."""
    return [(i, (i + shift) % n_shards) for i in range(n_shards)]


def halo_exchange(x_local, halo: int, axis_name: str, n_shards: int):
    """[left-neighbor tail | x_local | right-neighbor head] via ppermute.

    Edge shards receive wrapped data in their outer halo, but remapped
    indices never reference it (no row reaches outside the global
    range). ``halo == 0`` (block-diagonal) skips the exchange entirely.
    """
    if halo == 0:
        return x_local
    from_left = jax.lax.ppermute(
        x_local[-halo:], axis_name, perm=_neighbor_perm(n_shards, +1)
    )
    from_right = jax.lax.ppermute(
        x_local[:halo], axis_name, perm=_neighbor_perm(n_shards, -1)
    )
    return jnp.concatenate([from_left, x_local, from_right])


# ---------------------------------------------------------------------------
# Row-block-sharded ELL with halo-remapped indices


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShardedEll:
    """Row-block-sharded ELL matrix with halo-remapped column indices.

    ``indices``/``values`` are (n_shards, rows_per_shard, width). Column
    indices are *buffer-local*: they point into the per-device halo
    buffer ``[left_halo | own rows | right_halo]`` of length
    ``halo + rows_per_shard + halo``. Padding slots have value 0 and
    point at an own-block slot (always in-buffer). ``halo`` and ``n``
    (true global dimension) are static aux data.
    """

    indices: jnp.ndarray  # (S, R, W) int32, buffer-local
    values: jnp.ndarray  # (S, R, W)
    halo: int
    n: int

    @property
    def n_shards(self) -> int:
        return self.indices.shape[0]

    @property
    def rows_per_shard(self) -> int:
        return self.indices.shape[1]

    def tree_flatten(self):
        return (self.indices, self.values), (self.halo, self.n)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])


def shard_ell(csr: CsrMatrix, n_shards: int, pad_to_multiple: int = 1) -> ShardedEll:
    """Build a ShardedEll from host CSR.

    The halo width is the max distance any column index reaches outside
    its own row block; it must stay within the two neighbor blocks
    (halo <= rows_per_shard), which holds for banded matrices with
    bandwidth < rows_per_shard — the structured-mesh FEM case. Raises
    for wider stencils (use the all_gather path instead).
    """
    n = csr.shape[0]
    r = partition_rows(n, n_shards)
    n_pad = r * n_shards
    width, rows, offsets = csr._ell_slots(pad_to_multiple)

    # Global padded ELL; padding points at its own block's first row to
    # keep the halo reach zero for padding slots.
    idx = np.tile((np.arange(n_pad)[:, None] // r) * r, (1, width)).astype(np.int64)
    val = np.zeros((n_pad, width), csr.data.dtype)
    idx[rows, offsets] = csr.indices
    val[rows, offsets] = csr.data

    block_of_row = np.arange(n_pad)[:, None] // r
    block_of_col = idx // r
    reach = block_of_col - block_of_row  # in blocks
    if reach.size and (reach.min() < -1 or reach.max() > 1):
        raise ValueError(
            "matrix bandwidth exceeds one neighbor block per side "
            f"(reach {reach.min()}..{reach.max()} blocks); use all_gather "
            "sharding or fewer shards"
        )
    into_left = np.where(reach < 0, (block_of_row * r) - idx, 0)
    into_right = np.where(reach > 0, idx - (block_of_row * r + r - 1), 0)
    halo = int(max(into_left.max(initial=0), into_right.max(initial=0)))

    # Remap to buffer-local indices: buffer = [left halo | own | right halo]
    local = idx - block_of_row * r + halo
    assert local.min() >= 0 and local.max() < r + 2 * halo
    return ShardedEll(
        jnp.asarray(local.reshape(n_shards, r, width), jnp.int32),
        jnp.asarray(val.reshape(n_shards, r, width)),
        halo,
        n,
    )


def ell_local_matvec(indices_local, values_local, x_local, halo: int,
                     axis_name: str, n_shards: int):
    """Per-device SpMV: halo-exchange x, then gather + contract.
    ``indices_local``/``values_local`` are this device's (R, W) slices."""
    buf = halo_exchange(x_local, halo, axis_name, n_shards)
    return jnp.sum(values_local * jnp.take(buf, indices_local, axis=0), axis=1)


def ell_allgather_matvec(indices_global, values_local, x_local, axis_name: str):
    """General-sparsity fallback: all_gather x, gather with *global*
    column indices. One collective of the full vector per matvec."""
    x_full = jax.lax.all_gather(x_local, axis_name, tiled=True)
    return jnp.sum(values_local * jnp.take(x_full, indices_global, axis=0), axis=1)


# ---------------------------------------------------------------------------
# Device-level additive Schwarz (schwarz.rs:31-125 across devices)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceSchwarz:
    """One overlapping subdomain per device (padded to a uniform size).

    ``gather_idx`` indexes the per-device halo buffer
    ``[overlap | own rows | overlap]``; the local solve is a dense
    inverse GEMM; overlap contributions destined for neighbor-owned rows
    are shipped back with ``ppermute`` and summed, and the precomputed
    1/count ``weights`` make the overlapped sum an average — the
    reference's overlap weighting (schwarz.rs:125).
    """

    gather_idx: jnp.ndarray  # (S, bs) int32 into the halo buffer
    inv_blocks: jnp.ndarray  # (S, bs, bs)
    valid: jnp.ndarray  # (S, bs) 1.0 where the slot is a real DoF
    weights: jnp.ndarray  # (S, R) per-owned-row 1/count
    overlap: int  # static: halo rows per side

    def tree_flatten(self):
        return (self.gather_idx, self.inv_blocks, self.valid, self.weights), self.overlap

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux)

    @classmethod
    def from_csr(cls, csr: CsrMatrix, n_shards: int, overlap: int = 1):
        """Contiguous row blocks extended by ``overlap`` adjacency layers
        (must stay within the two neighbor blocks). Blocks are gathered
        directly from CSR rows (csr_diag_blocks) — O(N*bs) work/memory,
        no global densify, so production-FEM sizes (N ~ 1e5+) build fine
        (schwarz.rs:67 builds from CSR rows the same way)."""
        from mathaudio_tpu.solvers.preconditioners.schwarz import (
            _extend_partition,
            csr_diag_blocks,
        )

        n = csr.shape[0]
        r = partition_rows(n, n_shards)
        n_pad = r * n_shards
        parts = []
        for s in range(n_shards):
            own = list(range(s * r, min((s + 1) * r, n)))
            ext = _extend_partition(own, csr.indptr, csr.indices, overlap, n) if own else []
            parts.append(ext)

        halo = 0
        for s, p in enumerate(parts):
            lo, hi = s * r, (s + 1) * r
            for i in p:
                if i < lo:
                    halo = max(halo, lo - i)
                elif i >= hi:
                    halo = max(halo, i - hi + 1)
        if halo > r:
            raise ValueError(f"overlap reaches beyond neighbor blocks (halo {halo} > {r})")

        counts = np.zeros(n_pad, np.int64)
        for p in parts:
            counts[np.asarray(p, np.int64)] += 1
        weights = (1.0 / np.maximum(counts, 1)).reshape(n_shards, r)

        bs = max((len(p) for p in parts if p), default=1)
        if bs > 8192:
            import warnings

            warnings.warn(
                f"DeviceSchwarz block size {bs} requires dense "
                f"{bs}x{bs} inversions (~{bs*bs*16/1e9:.1f} GB each as "
                f"complex128) — use more subdomains (n_shards) so blocks "
                f"stay in the low thousands",
                stacklevel=2,
            )
        blocks = csr_diag_blocks(csr, parts, bs)
        gather = np.zeros((n_shards, bs), np.int32)
        valid = np.zeros((n_shards, bs), np.float64)
        for s, p in enumerate(parts):
            idx = np.asarray(p, np.int64)
            m = len(idx)
            gather[s, :m] = idx - s * r + halo  # buffer-local
            valid[s, :m] = 1.0
        inv_blocks = np.linalg.inv(blocks)
        wdtype = np.zeros(1, csr.data.dtype).real.dtype
        return cls(
            jnp.asarray(gather),
            jnp.asarray(inv_blocks),
            jnp.asarray(valid.astype(wdtype)),
            jnp.asarray(weights.astype(wdtype)),
            halo,
        )


def schwarz_apply_local(gather_idx, inv_block, valid, weights, r_local,
                        overlap: int, axis_name: str, n_shards: int):
    """Per-device Schwarz apply inside shard_map (shard axis stripped):
    halo-gather residual -> dense inverse GEMM -> scatter-add -> ship
    overlap contributions back to their owners -> weight."""
    r_buf = halo_exchange(r_local, overlap, axis_name, n_shards)
    vm = valid.astype(r_local.dtype)
    rb = jnp.take(r_buf, gather_idx, axis=0) * vm
    xb = (inv_block.astype(r_local.dtype) @ rb) * vm
    out_buf = jnp.zeros_like(r_buf).at[gather_idx].add(xb)
    if overlap:
        own = out_buf[overlap:-overlap]
        # contributions this device computed for neighbor-owned rows
        to_left = jax.lax.ppermute(
            out_buf[:overlap], axis_name, perm=_neighbor_perm(n_shards, -1)
        )
        to_right = jax.lax.ppermute(
            out_buf[-overlap:], axis_name, perm=_neighbor_perm(n_shards, +1)
        )
        own = own.at[-overlap:].add(to_left)
        own = own.at[:overlap].add(to_right)
    else:
        own = out_buf
    return own * weights.astype(own.dtype)


# ---------------------------------------------------------------------------
# Sharded sparse solve (the user-facing layer)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShardedSystem:
    """Device state for a row-sharded sparse solve (pytree)."""

    ell: ShardedEll
    schwarz: Optional[DeviceSchwarz]
    rhs: jnp.ndarray  # (S, R)

    def tree_flatten(self):
        return (self.ell, self.schwarz, self.rhs), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def build_sharded_system(
    csr: CsrMatrix,
    rhs: np.ndarray,
    n_shards: int,
    schwarz_overlap: Optional[int] = 1,
) -> ShardedSystem:
    """Host-side build: shard rows, remap halos, factor Schwarz blocks."""
    ell = shard_ell(csr, n_shards)
    schwarz = (
        DeviceSchwarz.from_csr(csr, n_shards, schwarz_overlap)
        if schwarz_overlap is not None
        else None
    )
    r = ell.rows_per_shard
    rhs_pad = np.zeros(r * n_shards, np.asarray(rhs).dtype)
    rhs_pad[: csr.shape[0]] = np.asarray(rhs)
    return ShardedSystem(ell, schwarz, jnp.asarray(rhs_pad.reshape(n_shards, r)))


def sharded_gmres_fn(mesh: Mesh, config: KrylovConfig, axis: str = "dof",
                     solver=gmres):
    """Return a jittable ``system -> KrylovSolution`` whose whole solve
    runs inside one shard_map over ``axis``: halo-exchange SpMV,
    psum-reduced Krylov iterations, per-device Schwarz preconditioning
    (or none if the system carries no Schwarz blocks).

    The returned ``x`` has shape (S, R) (shard-major rows);
    ``unshard(x, n)`` flattens back to the global vector. ``solver`` is
    any krylov solver accepting ``axis_name`` (gmres default).
    """
    n_shards = mesh.shape[axis]
    spec = P(axis)

    def solve(system: ShardedSystem):
        ell, schwarz = system.ell, system.schwarz
        halo = ell.halo
        has_schwarz = schwarz is not None
        overlap = schwarz.overlap if has_schwarz else 0
        # Placeholder arrays keep the shard_map signature static.
        sz = schwarz if has_schwarz else DeviceSchwarz(
            jnp.zeros((n_shards, 1), jnp.int32),
            jnp.zeros((n_shards, 1, 1), ell.values.dtype),
            jnp.zeros((n_shards, 1), jnp.float32),
            jnp.zeros((n_shards, ell.rows_per_shard), jnp.float32),
            0,
        )

        def local_solve(indices, values, rhs, sz_gather, sz_inv, sz_valid, sz_w):
            indices, values, rhs = indices[0], values[0], rhs[0]
            mv = lambda x: ell_local_matvec(indices, values, x, halo, axis, n_shards)
            pre = (
                (lambda r_: schwarz_apply_local(
                    sz_gather[0], sz_inv[0], sz_valid[0], sz_w[0], r_,
                    overlap, axis, n_shards))
                if has_schwarz else None
            )
            sol = solver(mv, rhs, config=config, preconditioner=pre, axis_name=axis)
            return (sol.x[None], sol.iterations[None],
                    sol.residual_norm[None], sol.converged[None])

        x, it, res, conv = jax.shard_map(
            local_solve,
            mesh=mesh,
            in_specs=(spec,) * 7,
            out_specs=(spec,) * 4,
            check_vma=False,
        )(ell.indices, ell.values, system.rhs,
          sz.gather_idx, sz.inv_blocks, sz.valid, sz.weights)
        return KrylovSolution(x, it[0], res[0], conv[0])

    return solve


def unshard(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """(S, R) shard-major solution -> (n,) global vector."""
    return x.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# Row-block-sharded dense BEM (SURVEY.md §5)


def dense_rowblock_matvec(a_local, x_local, axis_name: str):
    """y_local = A_rows @ all_gather(x): the sharded dense BEM matvec.
    A is row-block sharded; each device does an (R, N) x (N,) GEMV on
    its block — the all_gather moves N words, the GEMV does N*R flops."""
    x_full = jax.lax.all_gather(x_local, axis_name, tiled=True)
    return a_local @ x_full


def shard_dense_rows(a: np.ndarray, rhs: np.ndarray, n_shards: int):
    """Host-side: pad + reshape (N, N) -> (S, R, N_pad), rhs -> (S, R).
    Identity on padding rows keeps the system nonsingular."""
    n = a.shape[0]
    r = partition_rows(n, n_shards)
    n_pad = r * n_shards
    a_pad = np.zeros((n_pad, n_pad), a.dtype)
    a_pad[:n, :n] = a
    a_pad[np.arange(n, n_pad), np.arange(n, n_pad)] = 1.0
    rhs_pad = np.zeros(n_pad, np.asarray(rhs).dtype)
    rhs_pad[:n] = rhs
    return (
        jnp.asarray(a_pad.reshape(n_shards, r, n_pad)),
        jnp.asarray(rhs_pad.reshape(n_shards, r)),
    )


def sharded_dense_gmres_fn(mesh: Mesh, config: KrylovConfig, axis: str = "dof",
                           solver=gmres):
    """Jittable row-sharded dense solve: (a_blocks (S, R, N), rhs (S, R))
    -> KrylovSolution with x of shape (S, R). Jacobi-preconditioned with
    each device's slice of the global diagonal."""
    n_shards = mesh.shape[axis]
    spec = P(axis)

    def solve(a_blocks, rhs):
        def local(a_blk, rhs_l):
            a_blk, rhs_l = a_blk[0], rhs_l[0]
            mv = lambda x: dense_rowblock_matvec(a_blk, x, axis)
            r = a_blk.shape[0]
            idx = jax.lax.axis_index(axis)
            diag = a_blk[jnp.arange(r), idx * r + jnp.arange(r)]
            inv_d = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 1.0)
            sol = solver(mv, rhs_l, config=config,
                         preconditioner=lambda v: inv_d * v, axis_name=axis)
            return (sol.x[None], sol.iterations[None],
                    sol.residual_norm[None], sol.converged[None])

        x, it, res, conv = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(spec, spec),
            out_specs=(spec,) * 4,
            check_vma=False,
        )(a_blocks, rhs)
        return KrylovSolution(x, it[0], res[0], conv[0])

    return solve
