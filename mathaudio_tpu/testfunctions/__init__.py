"""Optimization benchmark suite.

Counterpart of the reference crate ``math-test-functions`` (SURVEY.md
§2.8): ~100 standard test functions with a metadata registry (bounds,
global minima, constraints, modality, admissible dimensions). All
functions are pure jnp ``f(x: (n,)) -> scalar`` so they vmap over DE
populations and jit into the optimizer loop.
"""

from mathaudio_tpu.testfunctions.registry import (  # noqa: F401
    FunctionMetadata,
    FUNCTIONS,
    get_function,
    get_function_metadata,
    list_functions,
)
