"""Pallas TPU kernels for the message-passing hot path."""

from .banded import (
    banded_gat,
    banded_spmm,
    banded_transformer,
    banded_transformer_edge,
)
from .reference import (
    banded_gat_ref,
    banded_spmm_ref,
    banded_transformer_edge_ref,
    banded_transformer_ref,
)

__all__ = [
    "banded_spmm",
    "banded_gat",
    "banded_transformer",
    "banded_transformer_edge",
    "banded_spmm_ref",
    "banded_gat_ref",
    "banded_transformer_ref",
    "banded_transformer_edge_ref",
]
