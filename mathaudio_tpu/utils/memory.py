"""HBM budgeting for batched frequency sweeps — the device-side analog
of the reference's MemoryEstimate batch planning
(room_simulator_fem.rs:56-120, 1043-1075)."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class MemoryEstimate:
    """Bytes needed per frequency for one batched Helmholtz solve."""

    num_dofs: int
    nnz: int
    restart: int
    levels: int = 1
    complex_bytes: int = 8  # c64

    def per_frequency_bytes(self) -> int:
        # GMRES basis (restart+1, N) dominates; plus system values on each
        # MG level (~nnz each, halving), RHS/residual vectors, MG coarse LU.
        basis = (self.restart + 1) * self.num_dofs * self.complex_bytes
        vals = int(self.nnz * self.complex_bytes * 1.6)  # ELL padding factor
        mg = sum(
            int(self.nnz / (8**l) * self.complex_bytes * 1.6) for l in range(self.levels)
        )
        vectors = 8 * self.num_dofs * self.complex_bytes
        return basis + vals + mg + vectors

    def batch_size(self, budget_bytes: int) -> int:
        return max(1, budget_bytes // max(self.per_frequency_bytes(), 1))


def hbm_frequency_batch(
    num_dofs: int,
    nnz: int,
    restart: int,
    levels: int = 1,
    budget_bytes: int = 8 * 2**30,  # leave headroom on a 16 GB v5e chip
    max_batch: int = 64,
) -> int:
    est = MemoryEstimate(num_dofs, nnz, restart, levels)
    return min(max_batch, est.batch_size(budget_bytes))
