"""Persistent XLA compilation cache for the CLI apps.

The app-level jit programs (MG-GMRES sweeps, BEM assembly) dominate
cold-start time — 18 of 24 init seconds on CPU, ~9 min on the remote
TPU — so every CLI entry point enables the same on-disk cache bench.py
uses; repeat runs skip compilation entirely.
"""

from __future__ import annotations

import os
import sys


def enable_compile_cache() -> None:
    import jax

    try:
        cache_dir = os.environ.get(
            "MATHAUDIO_JAX_CACHE", os.path.expanduser("~/.cache/jax_mathaudio")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # 0.3 s: the FMM host builds issue ~170 medium-sized CPU jits
        # (~13 s total compile, almost all individually under the old
        # 5 s floor); caching them cuts warm build time materially.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception as e:  # best-effort
        print(f"# compilation cache unavailable: {e}", file=sys.stderr)
