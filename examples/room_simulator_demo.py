"""Room simulator demo: one config end-to-end, printed SPL table.

Analog of math-bem/examples/room_simulator_demo.rs: load a ready-to-run
RoomConfig from the ported corpus (configs/), run the BEM room pipeline,
and print the per-frequency SPL at every listening position plus the
solver metadata — the smallest complete tour of the config -> geometry
-> mesh -> solve -> SPL pipeline.

Usage: python examples/room_simulator_demo.py [configs/example_rectangular.json]
       [--resolution 2] [--freqs 6]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?",
                    default=os.path.join(REPO, "configs", "example_rectangular.json"))
    ap.add_argument("--resolution", type=int, default=2,
                    help="override mesh resolution (demo-sized)")
    ap.add_argument("--freqs", type=int, default=6,
                    help="override number of frequency points")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from mathaudio_tpu.apps.roomsim_bem import run_bem_simulation
    from mathaudio_tpu.common.config import RoomConfig

    cfg = RoomConfig.from_file(args.config)
    cfg.solver.mesh_resolution = args.resolution
    cfg.frequencies.num_points = args.freqs
    cfg.frequencies.max_freq = min(cfg.frequencies.max_freq, 200.0)
    cfg.visualization.generate_slices = False

    sim = cfg.to_simulation()
    w, d, h = sim.geometry.dimensions()
    print("=== Room simulator demo ===")
    print(f"config: {os.path.basename(args.config)}")
    print(f"room:   {cfg.room.get('type')} {w:.1f} x {d:.1f} x {h:.1f} m "
          f"({sim.geometry.volume():.1f} m^3)")
    for s in sim.sources:
        print(f"source: {s.name} @ ({s.position.x:.2f}, {s.position.y:.2f}, "
              f"{s.position.z:.2f}), amp {s.amplitude}")
    print(f"listening positions: {len(sim.listening_positions)}, "
          f"band {sim.frequencies[0]:.0f}-{sim.frequencies[-1]:.0f} Hz "
          f"({len(sim.frequencies)} points)")

    results = run_bem_simulation(cfg, verbose=0, solver="gmres")
    print(f"\n{'freq [Hz]':>10} " + " ".join(
        f"{'SPL@L' + str(i) + ' [dB]':>12}"
        for i in range(len(sim.listening_positions))
    ))
    for r in results.results:
        row = " ".join(f"{s:12.2f}" for s in np.atleast_1d(r.spl_db))
        print(f"{r.frequency:10.1f} {row}")
    assert all(np.isfinite(np.atleast_1d(r.spl_db)).all()
               for r in results.results)
    print("\nOK: end-to-end pipeline (config -> mesh -> BEM solve -> SPL)")


if __name__ == "__main__":
    main()
