"""Basic differential evolution: minimize standard functions.

Analog of math-differential-evolution/examples/optde_basic.rs: plain DE
with default settings on sphere and Rosenbrock, printing the SciPy-style
report (x, fun, nit, nfev). The whole population evaluation is one
vmapped jit per generation — the TPU shaping of the reference's serial
objective loop.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mathaudio_tpu.optim import DEConfig, differential_evolution  # noqa: E402

sphere = lambda x: jnp.sum(x**2)
rosen = lambda x: jnp.sum(
    100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2
)

for name, fn, bounds, xstar, fstar in (
    ("sphere-5d", sphere, [(-5.0, 5.0)] * 5, np.zeros(5), 0.0),
    ("rosenbrock-4d", rosen, [(-2.0, 2.0)] * 4, np.ones(4), 0.0),
):
    res = differential_evolution(fn, bounds, DEConfig(maxiter=800, seed=11, tol=0.0))
    print(f"{name:>14}: f = {res.fun:.3e}  x = {np.round(res.x, 4)}  "
          f"nit={res.nit} nfev={res.nfev} success={res.success}")
    assert res.fun < fstar + 1e-6, (name, res.fun)
    assert np.allclose(res.x, xstar, atol=1e-3), (name, res.x)
print("OK: default DE finds both global minima")
