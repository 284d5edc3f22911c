"""Multi-chip parallelism: device meshes, data-parallel training, collectives."""

from .data_parallel import (
    gather_predictions,
    make_data_mesh,
    make_dp_forward,
    make_dp_train_step,
    replicate,
    shard_targets,
)

__all__ = [
    "make_data_mesh",
    "make_dp_train_step",
    "make_dp_forward",
    "shard_targets",
    "replicate",
    "gather_predictions",
]
