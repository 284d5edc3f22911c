"""Training subsystem: normalization, loss, data, jitted steps, checkpoints."""

from .checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    load_meta,
    restore_state,
    save_checkpoint,
)
from .data import FlowDataset, load_dataset
from .streaming import Prefetcher, foam_case_source, perturbed_case_source
from .loop import (
    ReduceLROnPlateau,
    TrainConfig,
    TrainState,
    init_state,
    make_eval_step,
    make_forward,
    make_train_step,
)
from .metrics import (
    compare_with_reference,
    compute_field_errors,
    mean_normalized_error,
)
from .normalization import (
    DEFAULT_FIELD_WEIGHTS,
    FieldNormalizer,
    pack_targets,
    unpack_fields,
    weighted_elementwise_mse,
    weighted_fieldwise_mse,
)
from .trainer import Trainer

__all__ = [
    "FlowDataset",
    "load_dataset",
    "Prefetcher",
    "perturbed_case_source",
    "foam_case_source",
    "TrainConfig",
    "TrainState",
    "Trainer",
    "ReduceLROnPlateau",
    "init_state",
    "make_train_step",
    "make_eval_step",
    "make_forward",
    "FieldNormalizer",
    "pack_targets",
    "unpack_fields",
    "weighted_fieldwise_mse",
    "weighted_elementwise_mse",
    "DEFAULT_FIELD_WEIGHTS",
    "compute_field_errors",
    "compare_with_reference",
    "mean_normalized_error",
    "save_checkpoint",
    "load_checkpoint",
    "load_meta",
    "latest_checkpoint",
    "restore_state",
]
