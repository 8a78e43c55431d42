"""Denormal handling parity (math-iir-fir/src/denormals.rs:19-41).

The reference installs an FTZ/DAZ guard around sample loops because x86
denormal arithmetic is ~100x slower. TPUs flush denormals to zero in
hardware, and the CPU backend's XLA-generated code sets FTZ itself, so
the guard is a documented no-op here — kept for API compatibility with
code ported from the reference.
"""

from __future__ import annotations

import contextlib


class ScopedFlushToZero(contextlib.AbstractContextManager):
    """No-op context manager (denormals.rs ScopedFlushToZero parity)."""

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


@contextlib.contextmanager
def flush_denormals():
    yield
