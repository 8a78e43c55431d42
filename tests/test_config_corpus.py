"""End-to-end regression over the ported room-config corpus.

The reference ships 9 ready-to-run RoomConfig JSONs
(math-bem/configs/*.json: example_rectangular, example_multi_source,
example_lshaped_fmm, home_theater_2_0/2_1/5_1_4, lshaped_stereo,
nearfield_stereo, nearfield_stereo_vis); `configs/` holds ports of all
of them plus the repo's own small_room.json. Every config must load,
resolve to a simulation, and run through the roomsim CLIs (with the
mesh/band clamped to smoke-test size — the production resolutions are
exercised by the benches).
"""

import glob
import os

import numpy as np
import pytest

from mathaudio_tpu.common.config import RoomConfig
from mathaudio_tpu.common.types import Point3D

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.json")))
NAMES = [os.path.splitext(os.path.basename(p))[0] for p in CONFIGS]

# Source/room facts from the reference corpus the ports must preserve.
EXPECTED_SOURCES = {
    "example_rectangular": 1,
    "example_multi_source": 3,
    "example_lshaped_fmm": 1,
    "home_theater_2_0": 2,
    "home_theater_2_1": 3,
    "home_theater_5_1_4": 10,
    "lshaped_stereo": 2,
    "nearfield_stereo": 2,
    "nearfield_stereo_vis": 2,
    "small_room": 1,
}


def _smoke_clamp(cfg: RoomConfig, mesh_resolution: int) -> RoomConfig:
    """Clamp a production config to smoke-test cost: 2 frequencies in
    the modal region the coarse smoke mesh can resolve (the corpus tops
    out at 1 kHz, which needs the production resolutions), coarse mesh,
    no slices, sane tol. The reference corpus declares no boundaries =
    all-rigid; the undamped Helmholtz operator is singular AT room
    resonances, so the smoke adds light absorption to stay well-posed
    at arbitrary clamped frequencies (the shipped configs are untouched
    — rigid stays rigid for real runs, exactly like the reference)."""
    cfg.frequencies.num_points = 2
    cfg.frequencies.max_freq = min(cfg.frequencies.max_freq, 120.0)
    cfg.solver.mesh_resolution = mesh_resolution
    cfg.solver.gmres.tolerance = max(cfg.solver.gmres.tolerance, 1e-7)
    cfg.solver.gmres.max_iter = min(cfg.solver.gmres.max_iter, 400)
    cfg.visualization.generate_slices = False
    b = cfg.boundaries
    if all(s.kind == "rigid" for s in b.wall_specs().values()):
        from mathaudio_tpu.common.config import SurfaceSpec

        damp = SurfaceSpec("absorption", coefficient=0.1)
        b.floor = b.ceiling = b.walls = damp
        b.front_wall = b.back_wall = b.left_wall = b.right_wall = None
    return cfg


class TestConfigCorpus:
    def test_corpus_complete(self):
        """All 9 reference configs are ported (plus small_room)."""
        assert set(EXPECTED_SOURCES) == set(NAMES)

    @pytest.mark.parametrize("path", CONFIGS, ids=NAMES)
    def test_loads_and_resolves(self, path):
        cfg = RoomConfig.from_file(path)
        sim = cfg.to_simulation()
        name = os.path.splitext(os.path.basename(path))[0]
        assert len(sim.sources) == EXPECTED_SOURCES[name]
        assert sim.geometry.volume() > 0
        freqs = sim.frequencies
        assert np.isfinite(freqs).all() and (freqs > 0).all()
        assert np.isclose(freqs[0], cfg.frequencies.min_freq, rtol=1e-12)
        # every speaker and listening position sits inside the room
        for s in sim.sources:
            assert sim.geometry.contains(s.position), s.name
        for p in sim.listening_positions:
            assert sim.geometry.contains(p)

    @pytest.mark.parametrize("path", CONFIGS, ids=NAMES)
    def test_roundtrip(self, path, tmp_path):
        cfg = RoomConfig.from_file(path)
        out = str(tmp_path / "rt.json")
        cfg.to_file(out)
        cfg2 = RoomConfig.from_file(out)
        assert cfg2.room == cfg.room
        assert len(cfg2.sources) == len(cfg.sources)
        assert cfg2.solver.method == cfg.solver.method

    @pytest.mark.parametrize("path", CONFIGS, ids=NAMES)
    def test_roomsim_bem_smoke(self, path):
        """Every corpus config runs end-to-end through the BEM CLI
        (bin/room_simulator_bem.rs) at smoke resolution: finite SPL at
        every listening position, and the multi-source crossovers leave
        a finite per-frequency weighting."""
        from mathaudio_tpu.apps.roomsim_bem import run_bem_simulation

        cfg = _smoke_clamp(RoomConfig.from_file(path), mesh_resolution=1)
        # tiny rooms need a finer mesh to have any elements at all
        w, d, h = cfg.to_simulation().geometry.dimensions()
        if w * d * h < 20.0:
            cfg.solver.mesh_resolution = 2
        results = run_bem_simulation(cfg, verbose=0, solver="gmres")
        assert len(results.results) == 2
        for r in results.results:
            assert np.isfinite(r.spl_db).all()
            assert len(r.spl_db) == len(cfg.listening_positions)

    @pytest.mark.parametrize(
        "path",
        [p for p, n in zip(CONFIGS, NAMES) if "lshaped" not in n],
        ids=[n for n in NAMES if "lshaped" not in n],
    )
    def test_roomsim_fem_smoke(self, path):
        """Rectangular corpus configs also run through the FEM CLI
        (the FEM app boxes L-shaped rooms, so those are BEM-only here)."""
        from mathaudio_tpu.apps.roomsim_fem import run_fem_simulation

        cfg = _smoke_clamp(RoomConfig.from_file(path), mesh_resolution=2)
        results = run_fem_simulation(cfg, verbose=0)
        assert len(results.results) == 2
        for r in results.results:
            assert r.converged
            assert np.isfinite(r.spl_db).all()

    def test_fmm_config_routes_to_fmm(self):
        """example_lshaped_fmm declares method fmm+gmres+ilu; the CLI's
        auto routing must pick the FMM tier for it (roomsim_bem solver
        table; bin/room_simulator_bem.rs:418)."""
        from mathaudio_tpu.apps import roomsim_bem

        cfg = RoomConfig.from_file(
            os.path.join(CONFIG_DIR, "example_lshaped_fmm.json")
        )
        assert "fmm" in cfg.solver.method
        assert cfg.solver.fmm.fmm_type == "slfmm"
