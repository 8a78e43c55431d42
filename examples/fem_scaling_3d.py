"""3D FEM scaling study: DoF throughput of the batched frequency sweep
as the mesh grows (math-fem examples/scaling_3d.rs)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax

try:  # fall back to CPU when no TPU backend is registered
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from mathaudio_tpu.fem.mesh import box_mesh_tetrahedra
from mathaudio_tpu.models import RoomSweepModel
from mathaudio_tpu.solvers import KrylovConfig
from mathaudio_tpu.xtypes import SPEED_OF_SOUND

N_FREQS = 16
print(f"{'n':>4} {'nodes':>8} {'tets':>8} {'t [s]':>8} {'DoF-solves/s':>14}")
for n in (8, 12, 16):
    mesh = box_mesh_tetrahedra(0, 4.0, 0, 5.0, 0, 2.7, n, n, n)
    model = RoomSweepModel(
        mesh, absorption=0.2, source_position=(1.0, 1.5, 1.2)
    )
    freqs = np.linspace(30.0, 120.0, N_FREQS)
    ks = jnp.asarray(2 * np.pi * freqs / SPEED_OF_SOUND)
    cfg = KrylovConfig(max_iterations=400, tolerance=1e-5, restart=30)
    fn = jax.jit(model.sweep_fn(cfg))
    params = model.params()
    fn(params, ks)[0].block_until_ready()  # compile
    t0 = time.perf_counter()
    p, iters, conv = fn(params, ks)
    p.block_until_ready()
    dt = time.perf_counter() - t0
    dof_s = model.num_nodes * N_FREQS / dt
    print(f"{n:4d} {model.num_nodes:8d} {mesh.num_elements:8d} "
          f"{dt:8.3f} {dof_s:14.3e}")
