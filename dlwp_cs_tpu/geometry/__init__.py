"""Cubed-sphere geometry: grid spec, connectivity, cell metrics, insolation."""

from dlwp_cs_tpu.geometry.cubed_sphere import (
    EDGE_E,
    EDGE_N,
    EDGE_S,
    EDGE_W,
    EQUATORIAL_FACES,
    POLAR_FACES,
    CubedSphere,
    EdgeLink,
    edge_table,
    face_xyz,
    verify_edge_table,
    xyz_to_face,
    xyz_to_face_angles,
)
from dlwp_cs_tpu.geometry.insolation import (
    INSOLATION_PERIOD_DAYS,
    J2000_EPOCH,
    SOLAR_CONSTANT,
    insolation,
)

__all__ = [
    "EDGE_E",
    "EDGE_N",
    "EDGE_S",
    "EDGE_W",
    "EQUATORIAL_FACES",
    "POLAR_FACES",
    "CubedSphere",
    "EdgeLink",
    "edge_table",
    "face_xyz",
    "verify_edge_table",
    "xyz_to_face",
    "xyz_to_face_angles",
    "J2000_EPOCH",
    "SOLAR_CONSTANT",
    "insolation",
    "INSOLATION_PERIOD_DAYS",
]
