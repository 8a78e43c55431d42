"""Fast PEQ loudness compensation — analytical, no audio processing.

Analog of math-iir-fir/examples/peq_loudness_compensation.rs ("use
peq_loudness_gain() to maintain spectral balance when applying
parametric EQ filters ... much faster than full Replay Gain analysis
because it analyzes the PEQ frequency response analytically"): for a
peak boost, a bass boost, and a multi-band EQ, compare the
anti-clipping preamp against K- and A-weighted loudness compensation
(dsp/iir.py peq_loudness_gain, iir.rs:1368).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

from mathaudio_tpu.dsp import (  # noqa: E402
    Biquad,
    BiquadFilterType,
    peq_loudness_gain,
    peq_preamp_gain,
)

SR = 48000.0
cases = {
    "+6 dB peak at 1 kHz": [
        (1.0, Biquad.try_new(BiquadFilterType.PEAK, 1000.0, SR, 1.0, 6.0))],
    "+6 dB bass boost at 100 Hz": [
        (1.0, Biquad.try_new(BiquadFilterType.PEAK, 100.0, SR, 0.8, 6.0))],
    "multi-band (bass+presence-sibilance)": [
        (1.0, Biquad.try_new(BiquadFilterType.PEAK, 80.0, SR, 0.9, 4.0)),
        (1.0, Biquad.try_new(BiquadFilterType.PEAK, 3000.0, SR, 1.5, 2.0)),
        (1.0, Biquad.try_new(BiquadFilterType.PEAK, 7000.0, SR, 2.0, -3.0))],
}

print("=== PEQ Loudness Compensation (analytical) ===")
for name, peq in cases.items():
    clip = peq_preamp_gain(peq)
    lk = peq_loudness_gain(peq, "k")
    la = peq_loudness_gain(peq, "a")
    print(f"\n{name}:")
    print(f"  anti-clipping preamp     : {clip:6.2f} dB")
    print(f"  K-weighted compensation  : {lk:6.2f} dB (EBU R128-like)")
    print(f"  A-weighted compensation  : {la:6.2f} dB")
    assert clip <= 0.0 and lk <= 0.0 and la <= 0.0

# the reference's headline point: a 1 kHz boost hits the loudness
# weighting fully (A ~ 0 dB there), a 100 Hz boost barely registers
# under A-weighting (-19 dB at 100 Hz) — so A-weighted loudness
# compensation is much milder than anti-clipping for bass boosts
la_mid = peq_loudness_gain(cases["+6 dB peak at 1 kHz"], "a")
la_bass = peq_loudness_gain(cases["+6 dB bass boost at 100 Hz"], "a")
print(f"\nA compensation: mid boost {la_mid:.2f} dB vs bass boost "
      f"{la_bass:.2f} dB (bass counts less, as expected)")
assert abs(la_bass) < abs(la_mid), (la_bass, la_mid)
print("OK")
