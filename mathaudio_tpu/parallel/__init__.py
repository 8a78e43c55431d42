"""Device-mesh parallelism utilities.

The reference's parallelism is rayon shared-memory (SURVEY.md §2.10);
the TPU equivalents live here: frequency-sharded sweeps (data-parallel
analog), DoF-sharded operators (tensor-parallel analog), and the
population-sharded DE evaluator — all via jax.sharding over an ICI mesh.
"""

from mathaudio_tpu.parallel.mesh import (  # noqa: F401
    sweep_mesh,
    shard_frequency_sweep,
    shard_room_params,
    pmean_convergence,
)
from mathaudio_tpu.parallel.de import shard_population_eval  # noqa: F401
