"""FIR filter design and use: windowed-sinc filters + FirBank.

Analog of math-iir-fir/examples/fir_example.rs: design lowpass /
highpass / bandpass windowed-sinc FIRs, verify their frequency
responses at band centers/edges, filter a two-tone block (the TPU path
is one jnp.convolve — a single XLA conv op — instead of the reference's
ring-buffer sample loop), and combine filters in a weighted FirBank
with its recommended preamp.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mathaudio_tpu.dsp import Fir, FirBank, FirFilterType, WindowType  # noqa: E402

SR = 48000.0
lp = Fir(FirFilterType.LOWPASS, 2000.0, SR, num_taps=201, window=WindowType.BLACKMAN)
hp = Fir(FirFilterType.HIGHPASS, 2000.0, SR, num_taps=201, window=WindowType.BLACKMAN)
bp = Fir(FirFilterType.BANDPASS, 1000.0, SR, num_taps=301,
         window=WindowType.KAISER, bandwidth=400.0)

probe = np.array([100.0, 1000.0, 2000.0, 8000.0])
for name, f in (("lowpass@2k", lp), ("highpass@2k", hp), ("bandpass@1k±200", bp)):
    db = np.asarray(f.np_log_result(jnp.asarray(probe)))
    print(f"{name:>16}: " + "  ".join(
        f"{fq:.0f}Hz {d:7.1f}dB" for fq, d in zip(probe, db)))

lp_db = np.asarray(lp.np_log_result(jnp.asarray(probe)))
hp_db = np.asarray(hp.np_log_result(jnp.asarray(probe)))
assert lp_db[0] > -1 and lp_db[3] < -60      # LP: passes 100 Hz, kills 8 kHz
assert hp_db[3] > -1 and hp_db[0] < -60      # HP: the reverse
bp_db = np.asarray(bp.np_log_result(jnp.asarray(probe)))
assert bp_db[1] > -6 and bp_db[0] < -40 and bp_db[3] < -40

# filter a 500 Hz + 6 kHz two-tone block through the lowpass
t = np.arange(8192) / SR
x = np.sin(2 * np.pi * 500.0 * t) + np.sin(2 * np.pi * 6000.0 * t)
y = np.asarray(lp.process(jnp.asarray(x)))
tail = y[1024:]
# remaining 6 kHz content measured against the pure 500 Hz tone
resid = tail - np.sin(2 * np.pi * 500.0 * t[1024 - (lp.num_taps - 1) // 2:
                                             8192 - (lp.num_taps - 1) // 2])
print(f"two-tone through LP: residual rms {resid.std():.4f} "
      f"(6 kHz tone rms was 0.707)")
assert resid.std() < 0.02, resid.std()

# weighted bank: LP + attenuated HP = tilt filter
bank = FirBank([(1.0, lp), (0.25, hp)])
bank_db = np.asarray(bank.np_log_result(jnp.asarray(probe)))
print("bank (LP + 0.25*HP):", "  ".join(
    f"{fq:.0f}Hz {d:6.1f}dB" for fq, d in zip(probe, bank_db)))
print(f"bank recommended preamp: {bank.preamp_gain():.2f} dB")
print("OK: windowed-sinc design, block filtering (XLA conv), FirBank")
