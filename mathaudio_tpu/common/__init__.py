"""Shared room-acoustics types, geometry, sources, config, output.

Counterpart of the reference crate ``math-xem-common`` (SURVEY.md §2.1):
the layer below both simulation engines. JSON config schema is
field-compatible with the reference's RoomConfig so existing config
files drive the TPU build unchanged.
"""

from mathaudio_tpu.common.types import (  # noqa: F401
    Point3D,
    SurfaceElement,
    RoomMesh,
    SPEED_OF_SOUND,
    AIR_DENSITY,
    REFERENCE_PRESSURE,
)
from mathaudio_tpu.common.source import (  # noqa: F401
    Source,
    DirectivityPattern,
    CrossoverFilter,
)
from mathaudio_tpu.common.geometry import (  # noqa: F401
    RoomGeometry,
    RectangularRoom,
    LShapedRoom,
)
from mathaudio_tpu.common.config import (  # noqa: F401
    RoomConfig,
    RoomSimulation,
    SurfaceSpec,
    FrequencySpec,
    SolverSpec,
    load_room_config,
)
from mathaudio_tpu.common.output import (  # noqa: F401
    FrequencyResult,
    SimulationResults,
    create_output_json,
    create_output_json_with_sources,
    generate_spatial_slices,
    create_default_config,
)
