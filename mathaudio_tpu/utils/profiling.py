"""Wall-clock phase spans (the reference's ad-hoc Instant prints,
math-fem/src/solver/mod.rs:224-273, room_simulator_fem.rs:962-1038).
For deep traces use jax.profiler alongside these."""

from __future__ import annotations

import contextlib
import sys
import time
from typing import Dict, Optional


class Timer:
    """Accumulating named-phase timer."""

    def __init__(self):
        self.phases: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def report(self, file=sys.stderr):
        for name, t in self.phases.items():
            print(f"  {name}: {t:.3f}s", file=file)


@contextlib.contextmanager
def span(name: str, verbose: int = 1, file=sys.stderr):
    """Print '<name>: <t>s' when verbose (solver/mod.rs:224 style)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if verbose:
            print(f"{name}: {time.perf_counter() - t0:.2f}s", file=file)
