"""Adaptive DE (JADE-style) vs fixed parameters on a multimodal function.

Analog of math-differential-evolution/examples/optde_adaptive_demo.rs:
run the same budget on Rastrigin with (a) fixed F/CR and (b) the
JADE/SAM-style adaptation (AdaptiveConfig: weighted-Lehmer F/CR means +
optional weighted local search), and compare final energies — the
adaptive run must at least match the fixed one at this budget.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mathaudio_tpu.optim import AdaptiveConfig, DEConfig, differential_evolution  # noqa: E402

rastrigin = lambda x: 10.0 * x.shape[0] + jnp.sum(
    x**2 - 10.0 * jnp.cos(2 * jnp.pi * x)
)
bounds = [(-5.12, 5.12)] * 6

fixed = differential_evolution(
    rastrigin, bounds, DEConfig(maxiter=1200, popsize=20, seed=5, tol=0.0)
)
adapt = differential_evolution(
    rastrigin, bounds,
    DEConfig(maxiter=1200, popsize=20, seed=5, tol=0.0,
             adaptive=AdaptiveConfig(adaptive_mutation=True, wls_enabled=True)),
)
print(f"fixed F/CR : f = {fixed.fun:.4e}  nit={fixed.nit}")
print(f"JADE adapt : f = {adapt.fun:.4e}  nit={adapt.nit}")
assert adapt.fun < 1e-3, adapt.fun  # global minimum is 0 at the origin
assert adapt.fun <= fixed.fun + 1e-9, (adapt.fun, fixed.fun)
print("OK: adaptive mutation reaches the Rastrigin global minimum")
