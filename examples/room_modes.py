"""Frequency sweep of a small room: modal SPL response at the listening
position through the batched MG-GMRES solver."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from mathaudio_tpu.common.config import RoomConfig
from mathaudio_tpu.apps.roomsim_fem import run_fem_simulation

config = RoomConfig.from_dict({
    "room": {"type": "rectangular", "width": 3.0, "depth": 4.0, "height": 2.5},
    "sources": [{"name": "sub", "position": {"x": 0.3, "y": 0.3, "z": 0.3}}],
    "listening_positions": [{"x": 1.5, "y": 2.5, "z": 1.1}],
    "frequencies": {"min_freq": 25.0, "max_freq": 120.0, "num_points": 24},
    "boundaries": {"walls": {"type": "absorption", "coefficient": 0.08},
                    "floor": {"type": "absorption", "coefficient": 0.15},
                    "ceiling": {"type": "absorption", "coefficient": 0.15}},
    "solver": {"mesh_resolution": 4},
})
results = run_fem_simulation(config, verbose=1)
print("\n  f (Hz)   SPL (dB)")
for r in results.results:
    bar = "#" * max(0, int(r.spl_db[0] - 30))
    print(f"  {r.frequency:7.1f}  {r.spl_db[0]:7.1f}  {bar}")
