"""Aux subsystems: profiling spans, HBM budgeting, JSON helpers
(SURVEY.md §5: the reference's Instant spans and MemoryEstimate-driven
batch planning, room_simulator_fem.rs:56-120, 962-1038)."""

from mathaudio_tpu.utils.profiling import span, Timer  # noqa: F401
from mathaudio_tpu.utils.memory import MemoryEstimate, hbm_frequency_batch  # noqa: F401
