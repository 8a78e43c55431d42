"""Find the Hartmann 4-D global minimum by DE.

Analog of math-test-functions/examples/find_hartman_4d_min.rs: the 4-D
Hartmann function (the 4-column slice of Hartmann-6) has a minimum that
the reference located numerically to seed its registry metadata; this
script re-derives it with differential evolution and checks it against
the registered value (testfunctions/registry.py hartman_4d).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402

from mathaudio_tpu.optim import DEConfig, differential_evolution  # noqa: E402
from mathaudio_tpu.testfunctions import get_function, get_function_metadata  # noqa: E402

fn = get_function("hartman_4d")
meta = get_function_metadata("hartman_4d")
res = differential_evolution(
    fn, meta.bounds, DEConfig(maxiter=1500, popsize=25, seed=2, tol=0.0)
)
x_reg, f_reg = meta.global_minima[0]
print(f"DE found   : f = {res.fun:.10f} at x = {np.round(res.x, 6)}")
print(f"registry   : f = {f_reg:.10f} at x = {np.round(x_reg, 6)}")
assert abs(res.fun - f_reg) < 1e-6, (res.fun, f_reg)
assert np.allclose(res.x, x_reg, atol=1e-3), res.x
print("OK: DE re-derives the registered Hartmann-4D minimum")
