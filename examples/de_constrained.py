"""Constrained differential evolution: linear + nonlinear penalty
constraints (math-differential-evolution examples
optde_linear_constraints.rs / optde_nonlinear_constraints.rs)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from mathaudio_tpu.optim import (
    DEConfig,
    LinearConstraintHelper,
    NonlinearConstraintHelper,
    differential_evolution,
)

# --- linear: minimize rosenbrock s.t. x + y <= 1.6 --------------------
rosen = lambda x: 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2
cfg = DEConfig(maxiter=600, seed=7, tol=0.0)
LinearConstraintHelper(np.array([[1.0, 1.0]]), np.array([-np.inf]), np.array([1.6])).apply_to(cfg)
res = differential_evolution(rosen, [(-2, 2), (-2, 2)], cfg)
print(f"linear  : x = {np.round(res.x, 4)}  f = {res.fun:.6f}  "
      f"(x+y = {res.x.sum():.4f} <= 1.6)")

# --- nonlinear: minimize sphere s.t. x^2 + y^2 >= 1 (outside the disk) -
sphere = lambda x: jnp.sum(x**2)
cfg = DEConfig(maxiter=600, seed=3, tol=0.0)
NonlinearConstraintHelper(
    lambda x: jnp.atleast_1d(x[0] ** 2 + x[1] ** 2),
    np.array([1.0]),
    np.array([np.inf]),
).apply_to(cfg)
res = differential_evolution(sphere, [(-2, 2), (-2, 2)], cfg)
r = float(np.hypot(*res.x))
print(f"nonlinear: x = {np.round(res.x, 4)}  f = {res.fun:.6f}  (|x| = {r:.4f} ~ 1)")
