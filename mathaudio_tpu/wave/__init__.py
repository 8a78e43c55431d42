"""Validation oracle: analytical wave/Helmholtz solutions + special functions.

TPU-native rebuild of the reference crate ``math-wave``
(math-wave/src/lib.rs:29-33): every function here is pure, jit-able and
vmap-able, so oracles can be evaluated on-device next to the solver under
test. Recurrences (Bessel/Legendre) are expressed as ``lax.scan`` so XLA
compiles them to tight fused loops instead of per-order Python dispatch.
"""

from mathaudio_tpu.wave import special  # noqa: F401
from mathaudio_tpu.wave import analytical  # noqa: F401
