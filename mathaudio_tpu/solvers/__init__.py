"""Device-resident linear algebra: operators, sparse formats, Krylov
solvers, preconditioners.

Counterpart of the reference crate ``math-solvers``
(math-solvers/src/lib.rs:28-55): the ``ComplexField``/``LinearOperator``/
``Preconditioner`` trait triple becomes (dtype polymorphism, a matvec
callable protocol, a pytree of preconditioner state). All solvers are
pure functions built on ``lax.while_loop``/``lax.fori_loop`` so they jit,
vmap over frequency batches, and shard_map over device meshes.
"""

from mathaudio_tpu.solvers.operators import (  # noqa: F401
    LinearOperator,
    DenseOperator,
    DiagonalOperator,
    EllOperator,
    as_matvec,
)
from mathaudio_tpu.solvers.sparse import CsrMatrix, EllMatrix  # noqa: F401
from mathaudio_tpu.solvers.krylov import (  # noqa: F401
    KrylovConfig,
    KrylovSolution,
    cg,
    bicgstab,
    cgs,
    qmrcgstab,
    gmres,
)
from mathaudio_tpu.solvers.direct import lu_solve, complex_solve, LuFactorization  # noqa: F401
from mathaudio_tpu.solvers.preconditioners import (  # noqa: F401
    identity_preconditioner,
    jacobi_preconditioner,
    IluColored,
    IluFixedPoint,
    BlockJacobi,
    AdditiveSchwarz,
    AmgConfig,
    AmgPreconditioner,
)
from mathaudio_tpu.solvers import blas  # noqa: F401
