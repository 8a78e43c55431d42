"""High-level simulation model facades (the "flagship models" of this
framework): frequency-sweep room acoustics on FEM, scattering on BEM,
parametric EQ on the DSP engine."""

from mathaudio_tpu.models.helmholtz_room import RoomSweepModel  # noqa: F401
