"""Graph construction and static padded TPU-resident structures."""

from .build import (
    boundary_cell_mask,
    build_edges,
    build_graph,
    compute_edge_features,
    validate_graph,
)
from .structs import Graph, build_padded_graph

__all__ = [
    "Graph",
    "build_padded_graph",
    "build_graph",
    "build_edges",
    "compute_edge_features",
    "validate_graph",
    "boundary_cell_mask",
]
