"""Model zoo: FlowGNN, conv layers, encoder-decoder surrogate."""

from .convs import CONV_REGISTRY, GATConv, GCNConv, GINConv, TransformerConv
from .flow_gnn import (
    FIELD_NAMES,
    FIELD_SLICES,
    FlowGNN,
    FlowGNNSurrogate,
    ModelConfig,
    split_fields,
)
from .norm import MaskedBatchNorm

__all__ = [
    "CONV_REGISTRY",
    "GCNConv",
    "GATConv",
    "GINConv",
    "TransformerConv",
    "FlowGNN",
    "FlowGNNSurrogate",
    "ModelConfig",
    "split_fields",
    "FIELD_NAMES",
    "FIELD_SLICES",
    "MaskedBatchNorm",
]
