"""Preconditioners (math-solvers/src/preconditioners/).

TPU mapping decisions (see SURVEY.md §2.10):

- Jacobi (diagonal.rs:20): elementwise multiply — unchanged.
- ILU(0): factorization stays on host (sequential by nature,
  ilu.rs:16-36); the *apply* uses fixed-point (Jacobi) iterations on the
  triangular factors instead of sequential substitution, following the
  reference's own parallel variant (ilu_parallel.rs:374
  IluFixedPointPreconditioner) — a few ELL matvecs, ideal for the VPU.
  The graph-coloring variant (ilu_parallel.rs:5) is IluColored: rows
  permuted by a greedy multicoloring make the strict triangular factors
  nilpotent of degree n_colors, so n_colors fixed-point sweeps solve
  them EXACTLY — the TPU-shaped equivalent of the level-scheduled solve
  (no serialization; each sweep is one fused ELL matvec).
- Block-Jacobi / additive Schwarz (schwarz.rs:31-125): equal-size padded
  row blocks with batched dense LU — vmap over blocks = one batched
  solve on the MXU.
"""

from mathaudio_tpu.solvers.preconditioners.basic import (  # noqa: F401
    identity_preconditioner,
    jacobi_preconditioner,
)
from mathaudio_tpu.solvers.preconditioners.ilu import (  # noqa: F401
    IluColored,
    IluFixedPoint,
    greedy_coloring,
    ilu0_factor,
)
from mathaudio_tpu.solvers.preconditioners.schwarz import (  # noqa: F401
    AdditiveSchwarz,
    BlockJacobi,
)
from mathaudio_tpu.solvers.preconditioners.amg import AmgConfig, AmgPreconditioner  # noqa: F401
