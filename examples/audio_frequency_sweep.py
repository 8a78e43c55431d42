"""Audio frequency sweep: BEM vs Mie across the audio band, adaptive beta.

Analog of math-bem/examples/audio_frequency_sweep.rs ("Tests the
TBEM solver with adaptive beta tuning across audio frequency range for
rigid sphere scattering, comparing with exact Mie series"): a 0.1 m
rigid sphere swept over audible frequencies; at each frequency the
Burton-Miller beta scale is chosen by the built-in piecewise ka rule
(PhysicsParams.optimal_beta_scale = the reference's types.rs rule),
and the whole sweep runs as one batched jit (bem/sweep.py) — the
frequency axis is the vmapped lane, not a Python loop over solves.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402

from mathaudio_tpu.bem import plane_wave  # noqa: E402
from mathaudio_tpu.bem.mesh import icosphere  # noqa: E402
from mathaudio_tpu.bem.sweep import bem_frequency_sweep  # noqa: E402
from mathaudio_tpu.bem.types import PhysicsParams  # noqa: E402
from mathaudio_tpu.wave.analytical.solutions_3d import sphere_scattering_3d  # noqa: E402

C0 = 343.0
radius = 0.1  # 10 cm sphere -> ka = 1 at ~546 Hz
surf = icosphere(radius, 2)
inc = plane_wave((0.0, 0.0, 1.0))
ph = PhysicsParams.from_wave_number(1.0)

c = surf.centers
r = np.linalg.norm(c, axis=1)
theta = np.arccos(np.clip(c[:, 2] / r, -1, 1))
rv = float(r.mean())

freqs = np.array([125.0, 250.0, 500.0, 1000.0, 2000.0, 2730.0])
kas = 2 * np.pi * freqs / C0 * radius

# group frequencies by the adaptive beta scale the ka rule selects,
# sweep each group in one batched jit call
scales = np.array([ph.optimal_beta_scale(ka) for ka in kas])
pressures = np.empty((len(freqs), surf.num_elements), complex)
for s in np.unique(scales):
    m = scales == s
    ks = kas[m] / radius
    pressures[m] = np.asarray(
        bem_frequency_sweep(surf, list(ks), inc, burton_miller=True, beta_scale=float(s))
    )

print(f"0.1 m rigid sphere, N={surf.num_elements} elements "
      f"(element size ~{surf.avg_element_size() * 1e3:.1f} mm)")
print(f"{'freq(Hz)':>9} {'ka':>6} {'beta scale':>10} {'rel L2 vs Mie':>14}")
for i, f in enumerate(freqs):
    exact = np.asarray(
        sphere_scattering_3d(float(kas[i]) / radius, radius, 40, [rv], theta).pressure
    )
    rel = np.linalg.norm(pressures[i] - exact) / np.linalg.norm(exact)
    print(f"{f:9.0f} {kas[i]:6.3f} {scales[i]:8.1f}i/k {rel:14.4f}")
    # reference gate: < 10% across the audio band with adaptive beta
    assert rel < 0.10, (f, rel)
print("OK: adaptive-beta TBEM tracks the Mie series across the audio band")
