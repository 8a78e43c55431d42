"""mathaudio_tpu — TPU-native acoustic modeling & audio DSP framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the Rust
workspace ``pierreaubert/math-audio`` (reference layout documented in
SURVEY.md). Subpackage map (reference crate -> subpackage):

- ``math-wave``                   -> :mod:`mathaudio_tpu.wave`
- ``math-solvers``                -> :mod:`mathaudio_tpu.solvers`
- ``math-fem``                    -> :mod:`mathaudio_tpu.fem`
- ``math-bem``                    -> :mod:`mathaudio_tpu.bem`
- ``math-iir-fir``                -> :mod:`mathaudio_tpu.dsp`
- ``math-differential-evolution`` -> :mod:`mathaudio_tpu.optim`
- ``math-test-functions``         -> :mod:`mathaudio_tpu.testfunctions`
- ``math-convex-hull``            -> :mod:`mathaudio_tpu.hull`
- ``math-xem-common``             -> :mod:`mathaudio_tpu.common`

TPU-specific layers with no reference counterpart:

- :mod:`mathaudio_tpu.ops`      — Pallas kernels for the hot paths
- :mod:`mathaudio_tpu.parallel` — device meshes, shard_map, collectives
- :mod:`mathaudio_tpu.utils`    — profiling spans, HBM budgeting, JSON IO
- :mod:`mathaudio_tpu.models`   — high-level simulation model facades
"""

__version__ = "0.1.0"

from mathaudio_tpu.xtypes import (  # noqa: F401
    default_float,
    default_complex,
    complex_dtype_for,
    SPEED_OF_SOUND,
    AIR_DENSITY,
    REFERENCE_PRESSURE,
)
