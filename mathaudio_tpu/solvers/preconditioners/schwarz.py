"""Additive Schwarz / block-Jacobi preconditioners
(math-solvers/src/preconditioners/schwarz.rs:31-125).

Same algorithm as the reference (contiguous partition, adjacency-layer
overlap extension, dense local solves, 1/count overlap weighting), but
the subdomain solves are *batched*: blocks are padded to one uniform
size and factored/solved as a single (k, bs, bs) batched LU — one MXU
batch instead of rayon threads.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mathaudio_tpu.solvers.operators import LinearOperator
from mathaudio_tpu.solvers.sparse import CsrMatrix


def _extend_partition(part, indptr, indices, overlap, n):
    current = set(part)
    frontier = set(part)
    for _ in range(overlap):
        new = set()
        for i in frontier:
            new.update(int(j) for j in indices[indptr[i]: indptr[i + 1]])
        frontier = new - current
        current |= frontier
        if not frontier:
            break
    return sorted(current)


def csr_diag_blocks(csr: CsrMatrix, parts, bs: int) -> np.ndarray:
    """(k, bs, bs) dense subdomain blocks A[idx, idx] extracted directly
    from CSR rows — O(sum nnz over part rows) work and O(k*bs^2) memory,
    never densifying the global matrix (the reference builds its Schwarz
    blocks from CSR rows the same way, schwarz.rs:67). Padded slots
    (beyond each part's length) carry identity so the batched inverse
    stays well-posed."""
    k = len(parts)
    blocks = np.tile(np.eye(bs, dtype=csr.data.dtype), (k, 1, 1))
    n = csr.shape[0]
    pos = np.full(n, -1, np.int64)
    indptr = csr.indptr.astype(np.int64)
    for bi, p in enumerate(parts):
        idx = np.asarray(p, np.int64)
        m = len(idx)
        if m == 0:
            continue
        pos[idx] = np.arange(m)
        blocks[bi, :m, :m] = 0.0
        counts = indptr[idx + 1] - indptr[idx]
        total = int(counts.sum())
        if total:
            # flat CSR slot indices of all entries in the part's rows
            flat = np.repeat(indptr[idx], counts) + (
                np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
            )
            cols = csr.indices[flat]
            keep = pos[cols] >= 0  # columns inside the subdomain
            rloc = np.repeat(np.arange(m), counts)[keep]
            np.add.at(blocks[bi], (rloc, pos[cols[keep]]), csr.data[flat][keep])
        pos[idx] = -1
    return blocks


@jax.tree_util.register_pytree_node_class
class AdditiveSchwarz(LinearOperator):
    """Overlapping-subdomain additive Schwarz with batched dense solves."""

    def __init__(self, gather_idx, inv_blocks, weights, valid_mask):
        self.gather_idx = gather_idx  # (k, bs) int32 global index per slot
        self.inv_blocks = inv_blocks  # (k, bs, bs) explicit block inverses
        self.weights = weights  # (n,) 1/overlap-count
        self.valid_mask = valid_mask  # (k, bs) 1.0 where slot is a real DoF

    @classmethod
    def from_csr(cls, csr: CsrMatrix, num_subdomains: int, overlap: int = 1):
        n = csr.shape[0]
        k = max(1, min(num_subdomains, n))
        base, rem = divmod(n, k)
        parts = []
        start = 0
        for i in range(k):
            size = base + (1 if i < rem else 0)
            parts.append(list(range(start, start + size)))
            start += size
        parts = [
            _extend_partition(p, csr.indptr, csr.indices, overlap, n) for p in parts
        ]

        counts = np.zeros(n, np.int64)
        for p in parts:
            counts[np.asarray(p, np.int64)] += 1
        weights = 1.0 / np.maximum(counts, 1)

        bs = max(len(p) for p in parts)
        blocks = csr_diag_blocks(csr, parts, bs)
        gather = np.zeros((k, bs), np.int32)
        valid = np.zeros((k, bs), np.float64)
        for bi, p in enumerate(parts):
            idx = np.asarray(p, np.int64)
            m = len(idx)
            gather[bi, :m] = idx
            valid[bi, :m] = 1.0

        # explicit block inverses (host): the apply is then one batched
        # GEMM on the MXU instead of latency-bound triangular solves
        inv_blocks = np.linalg.inv(blocks)
        wdtype = jnp.asarray(blocks).real.dtype
        return cls(
            jnp.asarray(gather),
            jnp.asarray(inv_blocks),
            jnp.asarray(weights, wdtype),
            jnp.asarray(valid, wdtype),
        )

    def matvec(self, r):
        r_blocks = jnp.take(r, self.gather_idx, axis=0)  # (k, bs)
        r_blocks = r_blocks * self.valid_mask.astype(r_blocks.dtype)
        x_blocks = jnp.einsum(
            "kij,kj->ki", self.inv_blocks.astype(r_blocks.dtype), r_blocks
        )
        x_blocks = x_blocks * self.valid_mask.astype(x_blocks.dtype)
        out = jnp.zeros_like(r).at[self.gather_idx.reshape(-1)].add(x_blocks.reshape(-1))
        return out * self.weights.astype(out.dtype)

    def tree_flatten(self):
        return (self.gather_idx, self.inv_blocks, self.weights, self.valid_mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
class BlockJacobi(AdditiveSchwarz):
    """Non-overlapping special case (overlap = 0): weights are all 1."""

    @classmethod
    def from_csr(cls, csr: CsrMatrix, num_blocks: int, overlap: int = 0):
        return super().from_csr(csr, num_blocks, overlap=0)
