"""Surface-mesh sanity diagnostics (math-bem/examples/mesh_debug.rs
analog): per-generator element counts, area closure, outward normal
orientation, watertightness, and aspect statistics.

Usage: python examples/mesh_debug.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from mathaudio_tpu.bem.mesh import icosphere, uv_sphere
    from mathaudio_tpu.common import RectangularRoom

    meshes = {
        "icosphere(1, 2)": icosphere(1.0, 2),
        "icosphere(1, 3)": icosphere(1.0, 3),
        "uv_sphere(1, 12, 24)": uv_sphere(1.0, 12, 24),
        "room 4x5x2.7 res 3": RectangularRoom(4.0, 5.0, 2.7)
        .generate_mesh(3)
        .to_surface_mesh(),
    }
    for name, m in meshes.items():
        areas = m.areas
        c = m.centers
        nrm = m.normals
        # outward test for spheres / boxes: normal . (center - centroid) > 0
        centroid = c.mean(axis=0)
        outward = np.sum(nrm * (c - centroid), axis=1)
        n_in = int((outward < 0).sum())
        # watertight: every edge shared by exactly 2 elements
        el = np.asarray(m.elements)
        edges = np.concatenate([el[:, [0, 1]], el[:, [1, 2]], el[:, [2, 0]]]) \
            if el.shape[1] == 3 else np.concatenate(
                [el[:, [0, 1]], el[:, [1, 2]], el[:, [2, 3]], el[:, [3, 0]]])
        edges = np.sort(edges, axis=1)
        _, cnt = np.unique(edges, axis=0, return_counts=True)
        watertight = bool((cnt == 2).all())
        print(f"{name:22s}: {m.num_elements:5d} elems, area {areas.sum():9.4f}, "
              f"inward normals {n_in}, watertight {watertight}, "
              f"area ratio max/min {areas.max()/areas.min():.2f}")
        if name.startswith("icosphere"):
            # room meshes intentionally carry into-the-fluid (inward)
            # normals — the interior convention the solid-angle diagonal
            # absorbs (see bem/fmm.build_room_fmm_system docstring)
            assert n_in == 0 and watertight
    print("OK: generators produce closed meshes; icospheres outward-oriented")


if __name__ == "__main__":
    main()
