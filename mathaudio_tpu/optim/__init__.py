"""Differential evolution optimizer.

Counterpart of the reference crate ``math-differential-evolution``
(SURVEY.md §2.7): SciPy-style DE with 14 strategies, binomial/exponential
crossover, Latin-hypercube init, penalty constraints, JADE-style
adaptation, optional local polish, per-evaluation recording.

TPU shaping: the population is a device array, objective evaluation is
vmapped (the reference uses rayon, parallel_eval.rs:32), one generation
is a pure jitted function, and ``solve(jit_loop=True)`` runs the whole
optimizer inside ``lax.while_loop``. The host-loop mode keeps per-
generation callbacks/recording exactly like the reference.
"""

from mathaudio_tpu.optim.de import (  # noqa: F401
    Strategy,
    Mutation,
    Init,
    Crossover,
    LinearPenalty,
    LinearConstraintHelper,
    NonlinearConstraintHelper,
    AdaptiveConfig,
    PolishConfig,
    DEConfig,
    DEConfigBuilder,
    DEReport,
    DEIntermediate,
    CallbackAction,
    differential_evolution,
)
from mathaudio_tpu.optim.recorder import RecordedEvaluation, run_recorded_differential_evolution  # noqa: F401
from mathaudio_tpu.optim.peq_fit import PeqFitResult, fit_peq  # noqa: F401
