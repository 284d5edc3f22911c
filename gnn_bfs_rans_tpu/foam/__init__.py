"""OpenFOAM I/O: correct FoamFile-aware parsing, geometry, and writeback."""

from .reader import (
    DEFAULT_FIELDS,
    BoundaryPatch,
    FoamCase,
    FoamMesh,
    compute_cell_centers,
    compute_internal_mask,
)
from .writer import FIELD_DIMENSIONS, save_fields_openfoam_format

__all__ = [
    "DEFAULT_FIELDS",
    "BoundaryPatch",
    "FoamCase",
    "FoamMesh",
    "compute_cell_centers",
    "compute_internal_mask",
    "FIELD_DIMENSIONS",
    "save_fields_openfoam_format",
]
