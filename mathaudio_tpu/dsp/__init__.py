"""IIR/FIR audio DSP engine.

Counterpart of the reference crate ``math-iir-fir`` (SURVEY.md §2.6).
TPU reshaping: the sequential Direct-Form-I recurrence of iir.rs:324-341
becomes an O(log T) ``jax.lax.associative_scan`` over 2x2 affine state
maps (dsp/scan.py); the analytical response path (np_log_result rationals)
is a trivially-vectorized device op; designers and exporters are pure
host Python. Denormals (denormals.rs) are a non-issue on TPU (flush to
zero by hardware).
"""

from mathaudio_tpu.dsp.iir import (  # noqa: F401
    Biquad,
    BiquadFilterType,
    Peq,
    SRATE,
    DEFAULT_Q_HIGH_LOW_PASS,
    DEFAULT_Q_HIGH_LOW_SHELF,
    bw2q,
    q2bw,
    compute_peq_response,
    peq_spl,
    peq_equal,
    peq_preamp_gain,
    peq_preamp_gain_max,
    peq_loudness_gain,
    peq_butterworth_q,
    peq_butterworth_lowpass,
    peq_butterworth_highpass,
    peq_linkwitzriley_q,
    peq_linkwitzriley_lowpass,
    peq_linkwitzriley_highpass,
    peq_print,
    get_filter_priority,
    filter_peqs_by_gain,
)
from mathaudio_tpu.dsp.scan import (  # noqa: F401
    biquad_process_block,
    biquad_cascade_block,
    peq_coeff_matrix,
)
from mathaudio_tpu.dsp.fir import (  # noqa: F401
    Fir,
    FirBank,
    FirFilterType,
    WindowType,
    generate_window,
)
from mathaudio_tpu.dsp.denormals import ScopedFlushToZero, flush_denormals  # noqa: F401
from mathaudio_tpu.dsp.formats import (  # noqa: F401
    peq_format_apo,
    peq_format_rme_channel,
    peq_format_rme_room,
    peq_format_aupreset,
)
