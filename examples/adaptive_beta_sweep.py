"""Adaptive Burton-Miller beta tuning — the reference's
math-bem/examples/adaptive_beta_sweep.rs: for each frequency, sweep the
beta scale, pick the one minimizing error vs the Mie series, and
compare the selection with the built-in piecewise ka rule
(types.rs optimal_beta_scale -> PhysicsParams.optimal_beta_scale).

TPU shaping: each (ka, scale) candidate is one lane of the batched
frequency sweep (bem/sweep.py) — the whole scale sweep per frequency is
a single jit call, not a solver loop.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mathaudio_tpu.bem import plane_wave  # noqa: E402
from mathaudio_tpu.bem.mesh import icosphere  # noqa: E402
from mathaudio_tpu.bem.sweep import bem_frequency_sweep  # noqa: E402
from mathaudio_tpu.bem.types import PhysicsParams  # noqa: E402
from mathaudio_tpu.wave.analytical.solutions_3d import sphere_scattering_3d  # noqa: E402


def exact_surface(ka, surf, num_terms=40):
    c = surf.centers
    r = np.linalg.norm(c, axis=1)
    th = np.arccos(np.clip(c[:, 2] / r, -1, 1))
    out = np.empty(len(c), complex)
    for rv in np.unique(np.round(r, 9)):
        m = np.abs(r - rv) < 1e-8
        out[m] = np.asarray(
            sphere_scattering_3d(ka, 1.0, num_terms, [rv], th[m]).pressure
        ).reshape(-1)
    return out


def main():
    surf = icosphere(1.0, 3)
    inc = plane_wave((0.0, 0.0, 1.0))
    scales = [0.5, 1.0, 2.0, 4.0, 8.0]
    ka_values = [0.3, 1.0, float(np.pi), 4.5]  # incl. the first resonance
    ph = PhysicsParams.from_wave_number(1.0)
    ok = True
    print(f"{'ka':>6} | " + " ".join(f"s={s:<4}" for s in scales)
          + " | best | rule")
    for ka in ka_values:
        ex = exact_surface(ka, surf)
        errs = []
        for s in scales:
            p = np.asarray(bem_frequency_sweep(
                surf, [ka], inc, burton_miller=True, beta_scale=s))[0]
            errs.append(np.linalg.norm(p - ex) / np.linalg.norm(ex))
        best = scales[int(np.argmin(errs))]
        rule = ph.optimal_beta_scale(ka)
        row = f"{ka:>6.2f} | " + " ".join(f"{e:.3f}" for e in errs)
        print(row + f" | {best:<4} | {rule}")
        # robustness (the real BM property): error flat across scales,
        # and the built-in rule lands within 2x of the best scale's error
        ok &= max(errs) < 2.5 * min(errs) + 1e-3
        ok &= errs[scales.index(rule)] < 2.0 * min(errs) + 1e-3
    print("OVERALL:", "PASS" if ok else "FAIL",
          "(accuracy flat in the scale; piecewise rule near-optimal)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
