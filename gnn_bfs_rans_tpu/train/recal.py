"""Exact BatchNorm statistics re-estimation (the "BN recalibration" pass).

Motivation (BENCHMARKS.md round-4 accuracy findings): under bfloat16
training the per-step batch statistics wobble at the bf16 noise floor and
the running-stat EMA lags parameter movement, so (a) eval-mode loss sits on
a ~2e-3 floor that train-mode loss does not have, and (b) "best"-checkpoint
selection picks on that noisy metric.  The reference never hits this —
it trains in f32 torch (``train.py:158-213``) — but its eval path has the
same structure (BatchNorm running stats, SURVEY.md §2 quirk 6), so the fix
belongs in the framework, not in a flag the user must remember.

Because the model input is geometry only (one static graph), a SINGLE
deterministic train-mode forward yields the exact batch statistics of the
current parameters: the EMA update is inverted algebraically
(``batch = (upd − (1−m)·old) / m``, statistics accumulate in float32 inside
the norm modules regardless of compute dtype).  Used in two places:

* ``infer --recalibrate_bn`` (:meth:`gnn_bfs_rans_tpu.infer.Predictor.recalibrate_bn`)
  — inference-side recovery for checkpoints trained without recalibration;
* the trainer's ``bn_recal`` mode (round 5) — every checkpoint is SAVED with
  exact statistics and the epoch-loop "best" selection runs on the
  recalibrated eval loss, so the fast bf16 path needs no inference-side flag.
"""

from __future__ import annotations

import dataclasses

import jax

from ..graph.structs import Graph
from ..models.flow_gnn import FlowGNN, ModelConfig

# MaskedBatchNorm / FusedEpilogueBN default momentum — the inversion below
# assumes every BN module in the model uses it (both modules hard-default it
# and FlowGNN never overrides).
BN_MOMENTUM = 0.1


def make_exact_stats_fn(model_config: ModelConfig):
    """Jittable ``(params, batch_stats, graph) -> exact_batch_stats``.

    Runs one deterministic (dropout-free) train-mode forward and inverts the
    EMA update.  The returned statistics are exactly what the eval-mode
    forward should normalize with for the CURRENT parameters; momentum
    inversion amplifies f32 rounding of the stored stats ~10×, which is
    ~1e-6 relative — far below the bf16 activation noise this corrects.
    """
    det_model = FlowGNN(dataclasses.replace(model_config, dropout=0.0))

    def exact_stats(params, batch_stats, graph: Graph):
        _, upd = det_model.apply(
            {"params": params, "batch_stats": batch_stats},
            graph, train=True, mutable=["batch_stats"],
        )
        return jax.tree.map(
            lambda old, ema: (ema - (1.0 - BN_MOMENTUM) * old) / BN_MOMENTUM,
            batch_stats, upd["batch_stats"],
        )

    return exact_stats


def resolve_bn_recal(mode: str, model_config: ModelConfig) -> bool:
    """Resolve TrainConfig.bn_recal ('auto'|'on'|'off') against the model.

    'auto' enables recalibration exactly where the measured failure mode
    lives: batch-norm models trained in bfloat16/mixed.  f32 training keeps the
    reference-parity eval semantics by default (val loss = EMA-stats eval,
    ``train.py:199-213``); pass 'on' to get recalibrated selection there
    too.  Models without batch statistics (norm_type 'layer'/'none') have
    nothing to recalibrate.
    """
    has_bn = model_config.use_batch_norm and model_config.norm_type == "batch"
    if not has_bn:
        return False
    if mode == "on":
        return True
    if mode == "off":
        return False
    if mode == "auto":
        return model_config.compute_dtype in ("bfloat16", "mixed")
    raise ValueError(f"bn_recal must be 'auto'|'on'|'off', got {mode!r}")
