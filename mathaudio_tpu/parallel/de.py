"""Population-sharded DE evaluation: the TPU version of
math-differential-evolution/src/parallel_eval.rs:32 (rayon population
map) — shard the population over a device mesh, evaluate locally, the
deferred-update selection needs no communication."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_population_eval(mesh: Mesh, energy_fn, axis: str = "freq"):
    """jitted (pop (NP, n)) -> (NP,) with the population sharded over the
    given mesh axis. NP must divide the axis size."""
    sh_pop = NamedSharding(mesh, P(axis))

    def eval_pop(pop):
        return jax.vmap(energy_fn)(pop)

    return jax.jit(eval_pop, in_shardings=sh_pop, out_shardings=sh_pop)
