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

    @classmethod
    def from_checkpoint(
        cls,
        checkpoint_dir: str | Path,
        name: str = "best",
        backend: str | None = "dense",
    ) -> "Predictor":
        """Reconstruct the exact model from the embedded config

        (parity with ``inference.py:20-59``).  ``backend`` overrides the
        checkpoint's training backend for inference — the three backends are
        mathematically identical, and for a single forward pass the dense
        path's seconds-scale compile beats the Pallas kernels' minutes-scale
        Mosaic compile.  Pass ``backend=None`` to keep the training backend
        (e.g. for repeated/serving use where the compile amortizes).
        """
        meta = load_meta(checkpoint_dir, name)
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
        )

    def __post_init__(self):
        self._forward = make_forward(self.model)

    def predict_packed(self, graph: Graph) -> np.ndarray:
        """Normalized model output in ORIGINAL cell order, [n_nodes, 7].

        If the graph is bandwidth-reordered (``graph.perm``), rows are
        un-permuted back to the mesh's cell numbering so downstream I/O and
        comparisons line up (SURVEY.md §7 writeback-ordering requirement).
        """
        out = np.asarray(self._forward(self.params, self.batch_stats, graph))
        out = out[: graph.n_nodes]
        if graph.perm is not None:
            perm = np.asarray(graph.perm)[: graph.n_nodes]
            orig = np.empty_like(out)
            orig[perm] = out
            out = orig
        return out

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
    backend: str | None = "dense",
) -> tuple[Predictor, dict[str, np.ndarray], Graph]:
    """End-to-end: load checkpoint, parse case, build graph, predict.

    ``backend`` as in :meth:`Predictor.from_checkpoint` (default: dense —
    fastest cold-start for a one-shot forward).  When the effective backend
    is pallas, the graph gets the banded adjacency component its conv reads.
    """
    predictor = Predictor.from_checkpoint(checkpoint_dir, name, backend=backend)
    case = FoamCase(case_path)
    mesh = case.load_mesh()
    cfg = predictor.model_config
    if cfg.backend == "pallas":
        from .graph.band import LAYER_COMPONENTS

        graph = build_graph(
            mesh, with_band=True,
            band_components=LAYER_COMPONENTS.get(cfg.layer_type),
        ).to_device()
    else:
        graph = build_graph(mesh).to_device()
    fields = predictor.predict_fields(graph)
    return predictor, fields, graph
