"""Pallas TPU kernels for the message-passing hot path."""

from .banded import (
    banded_gat,
    banded_spmm,
    banded_transformer,
)
from .reference import (
    banded_gat_ref,
    banded_spmm_ref,
    banded_transformer_ref,
)

__all__ = [
    "banded_spmm",
    "banded_gat",
    "banded_transformer",
    "banded_spmm_ref",
    "banded_gat_ref",
    "banded_transformer_ref",
]
