"""The IIR crate's README walkthrough: build and analyze a studio EQ.

Analog of math-iir-fir/examples/readme_example.rs: a Butterworth
subsonic high-pass + presence peak + air shelf, response analysis on a
log grid, preamp recommendation, and one block of audio through the
cascade (the associative-scan path, dsp/scan.py — the TPU form of the
reference's per-sample loop).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mathaudio_tpu.dsp import (  # noqa: E402
    Biquad,
    BiquadFilterType,
    biquad_cascade_block,
    peq_coeff_matrix,
    peq_preamp_gain,
    peq_print,
    peq_spl,
    peq_butterworth_highpass,
)

SR = 48000.0

# create_studio_eq (readme_example.rs): subsonic HP + presence + air
peq = list(peq_butterworth_highpass(2, 20.0, SR))
peq.append((1.0, Biquad.try_new(BiquadFilterType.PEAK, 3000.0, SR, 1.2, 2.5)))
peq.append((1.0, Biquad.try_new(BiquadFilterType.HIGHSHELF, 10000.0, SR, 0.9, 1.5)))
print(peq_print(peq))

# analyze_eq: response on a 200-point log grid
freqs = jnp.logspace(np.log10(20.0), np.log10(20000.0), 200)
resp = np.asarray(peq_spl(freqs, peq))
print("EQ Analysis:")
print(f"  Peak gain: {resp.max():.2f} dB")
print(f"  Min gain: {resp.min():.2f} dB")
print(f"  Dynamic range: {resp.max() - resp.min():.2f} dB")
print(f"  Recommended preamp: {peq_preamp_gain(peq):.2f} dB")
assert 2.0 < resp.max() < 5.0 and resp.min() < -2.5  # grid starts at the 20 Hz corner

# process a block: 1 kHz tone + subsonic rumble through the cascade
t = np.arange(2 * 48000) / SR
x = np.sin(2 * np.pi * 1000.0 * t) + 0.5 * np.sin(2 * np.pi * 5.0 * t)
y = np.asarray(biquad_cascade_block(jnp.asarray(x, jnp.float32),
                                    peq_coeff_matrix(peq)))
# steady-state amplitude of each tone via quadrature projection
tail_t, tail_y = t[48000:], y[48000:]


def amp(sig, f):
    c = np.cos(2 * np.pi * f * tail_t)
    s = np.sin(2 * np.pi * f * tail_t)
    return 2 * np.hypot(sig @ c, sig @ s) / len(sig)


a_tone, a_rumble = amp(tail_y, 1000.0), amp(tail_y, 5.0)
print(f"  1 kHz tone through cascade: {a_tone:.3f} (in 1.0), "
      f"5 Hz rumble: {a_rumble:.4f} (in 0.5) — scan cascade, one jit")
assert 0.9 < a_tone < 1.1 and a_rumble < 0.02
print("OK: README pipeline (design -> analyze -> preamp -> process) works")
