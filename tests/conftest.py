"""Test configuration: CPU backend, 8 virtual devices, x64 enabled.

Tests validate numerics in f64 on a virtual 8-device CPU mesh (the
sharding tests use all 8). TPU performance paths are exercised by
bench.py / __graft_entry__.py on real hardware.

Note: this environment's sitecustomize imports jax and registers the
remote-TPU ("axon") PJRT plugin at interpreter start, so JAX_PLATFORMS
from the environment is already baked in — the platform override must go
through jax.config.update, and XLA_FLAGS must be set before the CPU
client is first used (it is: backends initialize lazily).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
