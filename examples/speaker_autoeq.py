"""Fit a parametric EQ to a bumpy speaker response with on-device DE and
export an EqualizerAPO config (the speaker-EQ flow end to end)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from mathaudio_tpu.dsp import peq_format_apo, peq_print, peq_spl
from mathaudio_tpu.optim import fit_peq

f = np.logspace(np.log10(20), np.log10(20000), 120)
spl = (
    85
    + 4 * np.exp(-0.5 * ((np.log10(f) - np.log10(120)) / 0.15) ** 2)
    - 6 * np.exp(-0.5 * ((np.log10(f) - np.log10(2200)) / 0.2) ** 2)
    + 3 * np.exp(-0.5 * ((np.log10(f) - np.log10(9000)) / 0.25) ** 2)
)
target = -(spl - spl.mean())
res = fit_peq(f, target, n_filters=5, maxiter=400, seed=0)
print(peq_print(res.peq))
print(f"\nRMS flattening error: {res.rms_error_db:.2f} dB")
corrected = spl + np.asarray(peq_spl(jnp.asarray(f), res.peq))
print(f"response ripple before: {spl.max()-spl.min():.1f} dB, "
      f"after: {corrected.max()-corrected.min():.1f} dB")
print("\n" + peq_format_apo("# example autoeq", res.peq))
