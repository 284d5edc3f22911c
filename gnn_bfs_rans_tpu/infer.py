"""Shared checkpoint-load + predict API.

The reference copy-pastes ``load_model`` + ``predict_fields`` into three
scripts (``inference.py:20-87``, ``visualize.py:22-81``, ``plot_lines.py:18-77``
— SURVEY.md §1).  This module is the single implementation all CLIs use.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from .foam.reader import FoamCase
from .graph.build import build_graph
from .graph.structs import Graph
from .models.flow_gnn import FlowGNN, ModelConfig, split_fields
from .train.checkpoint import load_checkpoint, load_meta
from .train.loop import make_forward
from .train.normalization import FieldNormalizer


@dataclasses.dataclass
class Predictor:
    """A loaded model + normalizer bound to a jitted forward."""

    model: FlowGNN
    model_config: ModelConfig
    params: dict
    batch_stats: dict
    normalizer: FieldNormalizer | None
    meta: dict
    # directory for precompiled-executable caching (utils.aot); None = off.
    # With a warm cache a fresh process skips the Mosaic compile entirely,
    # making pallas-backend one-shot inference cold-start competitive with
    # dense (ROADMAP "compile latency").
    aot_dir: Path | None = None
    # Arithmetic-consistent BN forward: predict through the deterministic
    # (dropout-free) TRAIN-mode forward — BatchNorm normalizes with the
    # exact batch statistics of the input graph, computed in-forward.
    # Analytically identical to eval-mode with recalibrated running stats;
    # numerically it reproduces the TRAINING forward's arithmetic schedule
    # bit-for-bit.  Round-5 measurement (mixed-precision GAT 6×256): the
    # reduced-precision forward is chaotic at sensitive nodes — ~2e-4
    # kernel-vs-unfused affine differences flip bf16 rounding at conv
    # entries and cost MAE(U) 0.0135 → 0.020; the train-consistent forward
    # recovers the training metric exactly.  Enabled automatically for
    # checkpoints trained with bn_recal (meta['bn_recalibrated']).
    exact_bn: bool = False

    @classmethod
    def from_checkpoint(
        cls,
        checkpoint_dir: str | Path,
        name: str = "best",
        backend: str | None = "auto",
        aot: bool | str = "auto",
        exact_bn: bool | str = "auto",
    ) -> "Predictor":
        """Reconstruct the exact model from the embedded config

        (parity with ``inference.py:20-59``).  ``backend`` overrides the
        checkpoint's training backend for inference — the three backends are
        mathematically identical, and for a single forward pass the dense
        path's seconds-scale compile beats the Pallas kernels' minutes-scale
        Mosaic compile — unless a precompiled executable is cached (``aot``:
        executables serialize into ``<checkpoint_dir>/aot/`` on first use
        and later cold starts skip compilation).  ``aot='auto'`` enables the
        cache on TPU only — where the Mosaic compile is the cold-start cost
        and serialization is reliable; XLA:CPU AOT deserialization can
        reference missing fusions on mismatched host machine features.
        Pass ``backend=None`` to keep the training backend.

        ``exact_bn``: 'auto' enables the arithmetic-consistent train-mode
        forward for checkpoints trained with BN recalibration
        (``meta['bn_recalibrated']``) — see :attr:`exact_bn`.  For those
        checkpoints ``backend='auto'`` keeps the TRAINING backend too:
        arithmetic consistency requires the same kernels, and a reduced-
        precision model's accuracy depends on it (round-5 measurement:
        dense-backend inference of the pallas-trained mixed GAT costs
        MAE(U) 0.0143 → 0.0185).  For ordinary f32 checkpoints 'auto'
        resolves to 'dense' — the fastest cold start for one forward.
        """
        import jax

        if aot == "auto":
            aot = jax.default_backend() == "tpu"
        meta = load_meta(checkpoint_dir, name)
        if exact_bn == "auto":
            exact_bn = bool(meta.get("bn_recalibrated"))
        if backend == "auto":
            backend = None if exact_bn else "dense"
        model_config = ModelConfig.from_dict(meta["model_config"])
        if backend is not None and model_config.backend != backend:
            import dataclasses as _dc

            model_config = _dc.replace(model_config, backend=backend)
        restored, _ = load_checkpoint(checkpoint_dir, name)
        normalizer = (
            FieldNormalizer.from_dict(meta["normalizer"])
            if meta.get("normalizer")
            else None
        )
        model = FlowGNN(model_config)
        return cls(
            model=model,
            model_config=model_config,
            params=restored["params"],
            batch_stats=restored.get("batch_stats", {}),
            normalizer=normalizer,
            meta=meta,
            aot_dir=(Path(checkpoint_dir) / "aot") if aot else None,
            exact_bn=bool(exact_bn),
        )

    def __post_init__(self):
        self._forward = make_forward(self.model, exact_bn=self.exact_bn)
        self._compiled = None

    def _run_forward(self, graph: Graph):
        if self.aot_dir is None:
            # Mosaic compile failures (over-budget group pick on an untested
            # shape) recover via group-cap retry → dense fallback
            from .kernels.fallback import GroupFallback

            if not isinstance(self._forward, GroupFallback):
                model, xbn = self.model, self.exact_bn
                self._forward = GroupFallback(
                    lambda: make_forward(model, exact_bn=xbn),
                    dense_build=lambda: make_forward(FlowGNN(
                        dataclasses.replace(model.config, backend="dense")),
                        exact_bn=xbn),
                    name="predictor forward",
                )
            return self._forward(self.params, self.batch_stats, graph)
        # the compiled executable is specialized to one graph shape — rebuild
        # (from the disk cache when possible) if the shape changes
        sig = (graph.n_pad, graph.e_pad, graph.max_degree,
               graph.band is not None, graph.perm is not None)
        if self._compiled is None or self._compiled[0] != sig:
            from .utils.aot import load_or_compile

            self._compiled = (sig, load_or_compile(
                self._forward, (self.params, self.batch_stats, graph),
                self.aot_dir,
                label=("predictor-forward-exactbn" if self.exact_bn
                       else "predictor-forward"),
            ))
        return self._compiled[1](self.params, self.batch_stats, graph)

    def predict_packed(self, graph: Graph) -> np.ndarray:
        """Normalized model output in ORIGINAL cell order, [n_nodes, 7].

        If the graph is bandwidth-reordered (``graph.perm``), rows are
        un-permuted back to the mesh's cell numbering so downstream I/O and
        comparisons line up (SURVEY.md §7 writeback-ordering requirement).
        """
        out = np.asarray(self._run_forward(graph))
        out = out[: graph.n_nodes]
        if graph.perm is not None:
            perm = np.asarray(graph.perm)[: graph.n_nodes]
            orig = np.empty_like(out)
            orig[perm] = out
            out = orig
        return out

    def recalibrate_bn(self, graph: Graph) -> None:
        """Re-estimate BatchNorm running statistics from one exact pass.

        BN batch statistics depend only on the geometry input (node
        coordinates), so a single train-mode forward on ``graph`` yields the
        EXACT statistics of the current parameters; the EMA update is
        inverted algebraically (batch = (upd − (1−m)·old)/m) and the running
        stats replaced outright.  Motivation (BENCHMARKS.md round-4 accuracy
        notes): under bf16 training the per-step batch stats wobble at the
        bf16 noise floor and the EMA lags parameter movement, leaving a
        measured ~3× eval-vs-train loss gap even at converged parameters —
        the standard BN re-estimation pass removes both effects.  No-op for
        models without batch-norm stats.
        """
        if not self.batch_stats:
            return
        from .train.recal import make_exact_stats_fn

        new_bs = make_exact_stats_fn(self.model_config)(
            self.params, self.batch_stats, graph
        )
        object.__setattr__(self, "batch_stats", new_bs)
        self._compiled = None  # stats changed: refresh any AOT executable

    def predict_fields(
        self, graph: Graph, denormalize: bool = True
    ) -> dict[str, np.ndarray]:
        """Forward + slice + (optionally) denormalize — ``inference.py:62-87``."""
        fields = split_fields(self.predict_packed(graph))
        fields = {k: np.asarray(v) for k, v in fields.items()}
        if denormalize and self.normalizer is not None:
            fields = self.normalizer.inverse_transform(fields)
        return fields


def predict_case(
    checkpoint_dir: str | Path,
    case_path: str | Path,
    name: str = "best",
    backend: str | None = "auto",
    boundary_self_loops: bool = False,
    recalibrate_bn: bool = False,
    exact_bn: bool | str = "auto",
) -> tuple[Predictor, dict[str, np.ndarray], Graph]:
    """End-to-end: load checkpoint, parse case, build graph, predict.

    ``backend`` as in :meth:`Predictor.from_checkpoint` (default 'auto':
    dense — fastest cold-start — for ordinary checkpoints; the training
    backend for recal-trained ones, where arithmetic consistency is the
    accuracy mechanism).  When the effective backend is pallas, the graph
    gets the banded adjacency component its conv reads.

    ``boundary_self_loops`` adds one self-edge per boundary face, the
    reference's unfiltered-inference graph variant (``inference.py:256`` →
    ``graph_constructor.py:47-54``).  The default (off) is the canonical
    training graph — the quirk-4 fix — so train and inference see identical
    topology; the flag exists for A/B parity studies.
    """
    predictor = Predictor.from_checkpoint(
        checkpoint_dir, name, backend=backend, exact_bn=exact_bn
    )
    case = FoamCase(case_path)
    mesh = case.load_mesh()
    cfg = predictor.model_config
    if cfg.backend == "pallas":
        from .graph.band import LAYER_COMPONENTS

        graph = build_graph(
            mesh, with_band=True,
            band_components=LAYER_COMPONENTS.get(cfg.layer_type),
            boundary_self_loops=boundary_self_loops,
        ).to_device()
    else:
        graph = build_graph(
            mesh, boundary_self_loops=boundary_self_loops
        ).to_device()
    if recalibrate_bn:
        predictor.recalibrate_bn(graph)
    fields = predictor.predict_fields(graph)
    return predictor, fields, graph
