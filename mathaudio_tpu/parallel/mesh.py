"""Frequency x DoF device meshes for the Helmholtz sweep.

Mapping (SURVEY.md §2.10):
- rayon par_iter over frequencies  -> 'freq' mesh axis (embarrassingly
  parallel; each device solves its frequencies end to end)
- DoF-parallel SpMV/assembly       -> 'dof' mesh axis (row-sharded
  operators; XLA inserts the gather/psum collectives over ICI)
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sweep_mesh(n_devices: Optional[int] = None, dof_parallel: int = 1) -> Mesh:
    """(freq x dof) mesh over the first n_devices devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n % dof_parallel == 0, (n, dof_parallel)
    grid = np.asarray(devices[:n]).reshape(n // dof_parallel, dof_parallel)
    return Mesh(grid, ("freq", "dof"))


def shard_frequency_sweep(mesh: Mesh, sweep_fn):
    """Jit a (params, ks) sweep with ks sharded over 'freq' and outputs
    sharded the same way; params replicated. The inner solve stays whole
    per device — the sweep axis scales linearly over ICI with zero
    communication (the TPU version of the rayon frequency loop)."""
    sh_freq = NamedSharding(mesh, P("freq"))
    return jax.jit(
        sweep_fn,
        # params keep their existing placement (shard_room_params may have
        # put RHS/operator rows on the 'dof' axis); only ks is constrained
        in_shardings=(None, sh_freq),
        out_shardings=sh_freq,
    )


def shard_room_params(mesh: Mesh, params, dof_axis: bool = True):
    """Place RoomParams: operator value vectors replicated, RHS and ELL
    rows sharded over 'dof' when the node count divides the axis."""
    sh_repl = NamedSharding(mesh, P())
    sh_dof = NamedSharding(mesh, P("dof"))
    n_dof_axis = mesh.shape["dof"]

    def place(name, arr):
        if (
            dof_axis
            and name in ("rhs", "ell_indices")
            and arr.shape[0] % n_dof_axis == 0
        ):
            return jax.device_put(arr, sh_dof)
        return jax.device_put(arr, sh_repl)

    return type(params)(**{k: place(k, v) for k, v in params._asdict().items()})


def pmean_convergence(values, axis_name: str = "freq"):
    """Mean convergence metric across the frequency shards (for logging
    inside shard_map'ped loops)."""
    return jax.lax.pmean(values, axis_name)
