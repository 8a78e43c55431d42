"""NC.inp parser + native BemConfig (nc_format.rs test vectors)."""

import numpy as np

from mathaudio_tpu.bem.io import (
    BemConfig,
    load_nc_elements,
    load_nc_nodes,
    parse_nc_input_string,
)

SAMPLE = """##-------------------------------------------
## This file was created by mesh2input
##-------------------------------------------
Mesh2HRTF 1.0.0
##
Test Description
##
## Controlparameter I
0 0 0 0 7 0
##
## Controlparameter II
1 1 0.000001 0.00e+00 1 0 0
##
## Load Frequency Curve
0 2
0.000000 0.000000e+00 0.0
0.000001 0.400000e+04 0.0
##
## 1. Main Parameters I
2 100 50 0 0 2 1 0 0
##
## 2. Main Parameters II
1 0 0 0.0000e+00 0 0 0
##
## 3. Main Parameters III
0 0 0 0
##
## 4. Main Parameters IV
343 1.21 1.0 0.0 0.0 0.0 0.0
##
NODES
nodes.txt
##
ELEMENTS
elements.txt
##
BOUNDARY
ELEM 0 TO 49 VELO 1.0 -1 0.0 -1
RETU
##
PLANE WAVES
1 0.0 -1.0 0.0 1.0 -1 0.0 -1
##
END
"""


class TestNcFormat:
    def test_parse_sample(self):
        cfg = parse_nc_input_string(SAMPLE)
        assert "Mesh2HRTF" in cfg.version
        assert cfg.main_params_i.num_nodes == 100
        assert cfg.main_params_i.num_elements == 50
        assert abs(cfg.main_params_iv.speed_of_sound - 343.0) < 0.01
        assert abs(cfg.main_params_iv.density - 1.21) < 0.01
        assert cfg.node_files == ["nodes.txt"]
        assert cfg.element_files == ["elements.txt"]
        assert len(cfg.boundary_conditions) == 1
        bc = cfg.boundary_conditions[0]
        assert (bc.elem_start, bc.elem_end, bc.bc_type) == (0, 49, "VELO")
        assert len(cfg.plane_waves) == 1
        np.testing.assert_allclose(cfg.plane_waves[0].direction, [0.0, -1.0, 0.0])
        assert cfg.plane_waves[0].amplitude == 1.0

    def test_physics_and_frequencies(self):
        cfg = parse_nc_input_string(SAMPLE)
        phys = cfg.to_physics_params(1000.0)
        assert abs(phys.speed_of_sound - 343.0) < 0.01
        assert abs(phys.frequency - 1000.0) < 0.01
        np.testing.assert_allclose(cfg.frequencies(), [4000.0])

    def test_node_element_files(self, tmp_path):
        nodes = tmp_path / "nodes.txt"
        nodes.write_text("3\n0 0.0 0.0 0.0\n1 1.0 0.0 0.0\n2 0.0 1.0 0.0\n")
        arr = load_nc_nodes(str(nodes))
        assert arr.shape == (3, 3)
        np.testing.assert_allclose(arr[1], [1.0, 0.0, 0.0])

        elems = tmp_path / "elements.txt"
        elems.write_text("1\n0 0 1 2\n")
        el = load_nc_elements(str(elems))
        assert el.shape == (1, 3)


class TestNativeConfig:
    def test_json_roundtrip(self, tmp_path):
        import json

        path = tmp_path / "bem.json"
        json.dump(
            {
                "frequency": 500.0,
                "mesh": {"type": "icosphere", "radius": 1.0, "subdivisions": 1},
                "incident": {"type": "plane", "direction": [0, 0, 1]},
            },
            open(path, "w"),
        )
        cfg = BemConfig.from_file(str(path))
        prob = cfg.build_problem()
        assert prob.mesh.num_elements == 80
        assert abs(prob.physics.frequency - 500.0) < 1e-12

    def test_toml(self, tmp_path):
        path = tmp_path / "bem.toml"
        path.write_text(
            'frequency = 250.0\n[mesh]\ntype = "cylinder"\nradius = 0.5\n'
            '[incident]\ntype = "plane"\n'
        )
        cfg = BemConfig.from_file(str(path))
        prob = cfg.build_problem()
        assert prob.mesh.num_elements > 0


class TestNcParserDetails:
    """Granular parser checks mirroring nc_format.rs's
    test_parse_boundary_line / test_parse_plane_wave / point sources /
    frequency curve."""

    def test_boundary_line(self):
        from mathaudio_tpu.bem.io import parse_nc_input_string

        txt = "v1\ndesc\nBOUNDARY\nELEM 0 TO 99 ADMI 0.5 1 0.25 1\nRETU\nEND\n"
        cfg = parse_nc_input_string(txt)
        assert len(cfg.boundary_conditions) == 1
        b = cfg.boundary_conditions[0]
        assert (b.elem_start, b.elem_end) == (0, 99)
        assert b.bc_type == "ADMI"
        assert b.value_re == 0.5 and b.value_im == 0.25

    def test_malformed_boundary_line_skipped(self):
        from mathaudio_tpu.bem.io import parse_nc_input_string

        txt = "v1\ndesc\nBOUNDARY\nELEM 0 99 ADMI 0.5\nRETU\nEND\n"
        cfg = parse_nc_input_string(txt)
        assert cfg.boundary_conditions == []

    def test_plane_wave_and_point_source(self):
        from mathaudio_tpu.bem.io import parse_nc_input_string

        txt = (
            "v1\ndesc\n"
            "PLANE WAVES\n1 0.0 0.0 1.0 1.0 1 0.0 1\nRETU\n"
            "POINT SOURCES\n1 0.1 0.2 0.3 2.0 1 -1.0 1\nRETU\nEND\n"
        )
        cfg = parse_nc_input_string(txt)
        assert len(cfg.plane_waves) == 1 and len(cfg.point_sources) == 1
        pw = cfg.plane_waves[0]
        np.testing.assert_allclose(pw.direction, [0.0, 0.0, 1.0])
        assert pw.amplitude == 1.0 + 0.0j
        ps = cfg.point_sources[0]
        np.testing.assert_allclose(ps.position, [0.1, 0.2, 0.3])
        assert ps.amplitude == 2.0 - 1.0j

    def test_frequency_curve_lines(self):
        from mathaudio_tpu.bem.io import parse_nc_input_string

        txt = (
            "v1\ndesc\n"
            "## Frequency Curve\n"
            "0 2\n"
            "1 100.0 1.0\n"
            "2 200.0 1.0\n"
            "END\n"
        )
        cfg = parse_nc_input_string(txt)
        assert len(cfg.frequency_curve) == 2
        assert cfg.frequency_curve[0][1] == 100.0

    def test_header_and_main_params(self):
        from mathaudio_tpu.bem.io import parse_nc_input_string

        txt = (
            "NC.inp 1.0\nmy simulation\n"
            "## Main Parameters I\n2 8 6 0 0 1 0 0\n"
            "## Main Parameters IV\n346.0 1.3\n"
            "END\n"
        )
        cfg = parse_nc_input_string(txt)
        assert cfg.version == "NC.inp 1.0"
        assert cfg.description == "my simulation"
        assert cfg.main_params_i.num_nodes == 8
        assert cfg.main_params_i.num_elements == 6
        assert cfg.main_params_iv.speed_of_sound == 346.0
        assert cfg.main_params_iv.density == 1.3
