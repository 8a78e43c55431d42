"""3D convex hull (counterpart of the reference crate math-convex-hull).

Quickhull runs on host (irregular, tiny, preprocessing-only — SURVEY.md
§7 point 7); exports OBJ/HTML like the reference.
"""

from mathaudio_tpu.hull.quickhull import (  # noqa: F401
    ConvexHull3D,
    Face,
    quickhull_3d,
    convex_hull_3d,
)
from mathaudio_tpu.hull.export import hull_to_obj, hull_to_html  # noqa: F401
from mathaudio_tpu.hull.testdata import cube_points, sphere_points, random_points  # noqa: F401
