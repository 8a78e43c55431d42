"""Audio-band BEM frequency sweep on a rigid sphere: dense solve per
frequency plus an FMM cross-check at the top of the band
(math-bem examples audio_frequency_sweep.rs / audio_fmm_sweep.rs)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from mathaudio_tpu.bem import BemProblem, BemSolver, BemSolverConfig
from mathaudio_tpu.bem.fmm import build_slfmm_system
from mathaudio_tpu.bem.incident import plane_wave
from mathaudio_tpu.solvers import KrylovConfig, gmres
from mathaudio_tpu.xtypes import SPEED_OF_SOUND

RADIUS = 0.15  # m — speaker-cabinet scale
freqs = np.array([250.0, 500.0, 1000.0, 2000.0])

print(f"rigid sphere r={RADIUS} m, plane wave, field point at 1 m")
print(f"{'f [Hz]':>8} {'ka':>6} {'N':>6} {'|p| @1m':>9} {'t [s]':>7}")
solver = BemSolver(BemSolverConfig(burton_miller=True))
for f in freqs:
    k = 2 * np.pi * f / SPEED_OF_SOUND
    ka = k * RADIUS
    prob = BemProblem.rigid_sphere(ka, subdivisions=2 if ka < 1 else 3)
    # rescale: rigid_sphere builds unit radius with k = ka
    t0 = time.perf_counter()
    sol = solver.solve(prob)
    p = np.asarray(sol.evaluate_pressure(jnp.asarray([[1.0 / RADIUS, 0.0, 0.0]])))
    dt = time.perf_counter() - t0
    print(f"{f:8.0f} {ka:6.3f} {prob.mesh.num_elements:6d} {abs(p[0]):9.4f} {dt:7.2f}")

# --- FMM cross-check at the highest frequency -------------------------
k = 2 * np.pi * freqs[-1] / SPEED_OF_SOUND * RADIUS
prob = BemProblem.rigid_sphere(k, subdivisions=3)
mesh = prob.mesh
rhs = plane_wave((0.0, 0.0, 1.0)).pressure(jnp.asarray(mesh.centers), float(k))
op = build_slfmm_system(mesh, float(k), max_per_leaf=64, separation_ratio=2.0)
cfg = KrylovConfig(tolerance=1e-6, restart=40, max_iterations=400)
t0 = time.perf_counter()
sol_fmm = gmres(op.matvec, rhs, config=cfg)
dt = time.perf_counter() - t0
dense = solver.solve(prob)
rel = float(
    jnp.linalg.norm(sol_fmm.x - dense.surface_pressure)
    / jnp.linalg.norm(dense.surface_pressure)
)
print(f"\nFMM GMRES @ {freqs[-1]:.0f} Hz: {int(sol_fmm.iterations)} iters, "
      f"{dt:.2f} s, rel diff vs dense = {rel:.2e}")
