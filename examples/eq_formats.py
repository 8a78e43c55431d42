"""Design a small PEQ and export it in every supported format
(math-iir-fir examples format_demo.rs / format_rme_room_demo.rs)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")

from mathaudio_tpu.dsp import (
    Biquad,
    BiquadFilterType,
    peq_format_apo,
    peq_format_aupreset,
    peq_format_rme_channel,
    peq_format_rme_room,
    peq_print,
)

SR = 48000.0
peq = [
    (1.0, Biquad.try_new(BiquadFilterType.HIGHPASS, 40.0, SR, 0.707, 0.0)),
    (1.0, Biquad.try_new(BiquadFilterType.PEAK, 120.0, SR, 1.8, -4.5)),
    (1.0, Biquad.try_new(BiquadFilterType.PEAK, 2200.0, SR, 2.5, 3.0)),
    (1.0, Biquad.try_new(BiquadFilterType.HIGHSHELF, 8000.0, SR, 0.9, -2.0)),
]

print(peq_print(peq))
print("\n--- EqualizerAPO ---")
print(peq_format_apo("# demo eq", peq))
print("--- RME TotalMix channel ---")
print(peq_format_rme_channel(peq))
print("--- RME room EQ (L/R) ---")
print(peq_format_rme_room(peq, peq))
print("--- AUPreset ---")
print(peq_format_aupreset(peq, "demo")[:400], "...")
