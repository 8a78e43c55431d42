"""Parallel DE: vmapped populations and device-sharded evaluation.

Analog of math-differential-evolution/examples/optde_parallel.rs. The
reference parallelizes objective evaluations with a rayon thread pool
(parallel_eval.rs:32); the TPU-first equivalents demonstrated here:
(a) the population axis — every generation evaluates the whole
    population in ONE vmapped jit (free inside differential_evolution;
    jit_loop=True keeps even the generation loop on device),
(b) multi-start over seeds (the reference's other thread axis),
(c) shard_population_eval (parallel/de.py) — the same population axis
    laid out over a jax.sharding device mesh; run under
    XLA_FLAGS=--xla_force_host_platform_device_count=8 to see it split
    8 ways (tests/test_parallel.py exercises exactly that).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time  # noqa: E402

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from mathaudio_tpu.optim import DEConfig, differential_evolution  # noqa: E402
from mathaudio_tpu.parallel import shard_population_eval  # noqa: E402

ackley = lambda x: (
    -20.0 * jnp.exp(-0.2 * jnp.sqrt(jnp.mean(x**2)))
    - jnp.exp(jnp.mean(jnp.cos(2 * jnp.pi * x)))
    + 20.0 + jnp.e
)
bounds = [(-32.0, 32.0)] * 4

# (a) one run, fully on-device generation loop
t0 = time.perf_counter()
res = differential_evolution(
    ackley, bounds, DEConfig(maxiter=600, popsize=24, seed=1, tol=0.0),
    jit_loop=True,
)
print(f"single run    : f = {res.fun:.3e}  "
      f"({time.perf_counter() - t0:.2f}s, lax.while_loop generation loop)")
assert res.fun < 1e-6, res.fun

# (b) multi-start over seeds
best = [differential_evolution(
    ackley, bounds, DEConfig(maxiter=600, popsize=24, seed=s, tol=0.0),
    jit_loop=True).fun for s in range(4)]
print(f"4-seed restart: f = {min(best):.3e} (best) / {max(best):.3e} (worst)")
assert min(best) < 1e-6, best

# (c) the population axis on a device mesh: identical energies to the
# plain vmap, laid out for scale-out (on N devices each evaluates NP/N)
devs = np.array(jax.devices())
mesh = Mesh(devs, ("pop",))
npop = 8 * max(1, len(devs))
rng = np.random.default_rng(0)
pop = jnp.asarray(rng.uniform(-32, 32, (npop, 4)))
sharded = shard_population_eval(mesh, ackley, axis="pop")(pop)
plain = jax.vmap(ackley)(pop)
err = float(jnp.max(jnp.abs(sharded - plain)))
print(f"sharded eval  : {npop} members over {len(devs)} device(s), "
      f"max |sharded - vmap| = {err:.1e}")
assert err < 1e-5, err  # f32: jit-with-sharding fuses differently than eager vmap
print("OK: thread-pool parallelism -> vmap + device-mesh sharding")
