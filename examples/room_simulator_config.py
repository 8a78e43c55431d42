"""Room simulator with dynamic configuration: rectangular vs L-shaped.

Analog of math-bem/examples/room_simulator_config.rs ("Demonstrates
configurable room simulator with rectangular or L-shaped rooms,
multiple sources with crossovers, configurable frequency resolution"):
build both room shapes from the ported config corpus (configs/), run
the BEM room pipeline end to end on each at demo resolution, and print
the per-position SPL — the config knobs (geometry kind, source count,
crossover, frequency grid) all exercised from JSON, no code edits.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402

from mathaudio_tpu.apps.roomsim_bem import run_bem_simulation  # noqa: E402
from mathaudio_tpu.common.config import RoomConfig  # noqa: E402

for name in ("example_rectangular.json", "example_lshaped_fmm.json",
             "example_multi_source.json"):
    cfg = RoomConfig.from_file(_os.path.join(REPO, "configs", name))
    # demo-size the run: coarse mesh, few low frequencies (the corpus
    # files carry production resolutions)
    cfg.solver.mesh_resolution = 2
    cfg.frequencies.num_points = 3
    cfg.frequencies.max_freq = min(cfg.frequencies.max_freq, 150.0)
    cfg.visualization.generate_slices = False

    sim = cfg.to_simulation()
    results = run_bem_simulation(cfg, verbose=0, solver="gmres")
    print(f"{name}: room={cfg.room.get('type')}  "
          f"sources={len(sim.sources)}  "
          f"positions={len(sim.listening_positions)}")
    for r in results.results:
        spl = np.atleast_1d(r.spl_db)
        row = "  ".join(f"{v:6.1f}" for v in spl)
        print(f"  {r.frequency:7.1f} Hz  SPL dB: {row}")
        assert np.all(np.isfinite(spl)), name
        assert spl.max() < 200 and spl.min() > -60, (name, spl.min(), spl.max())
print("OK: rectangular, L-shaped, and multi-source configs all run the "
      "full config -> mesh -> solve -> SPL pipeline")
