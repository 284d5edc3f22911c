"""Multi-topology training: cases with DIFFERENT meshes via padding buckets.

The reference's collate (``/root/reference/train.py:153-155``,
``Batch.from_data_list``) can batch graphs of different topology in one step
— unused in practice there (all snapshots share the BFS mesh), but a real
capability of the framework ambition.  The TPU-native equivalent cannot mix
shapes inside one executable (XLA requires static shapes), so instead:

* every case's mesh becomes its own padded :class:`~..graph.structs.Graph`,
  padded with COARSE aligns (``node_align``/``edge_align``/``degree_align``)
  so similar-sized meshes land on the SAME padded shape — the **bucket**;
* one jitted train/eval step serves all cases: ``jax.jit`` specializes per
  argument shape, so each bucket compiles exactly once and every case in the
  bucket reuses that executable.  Cases are routed by their bucket key
  ``(n_pad, e_pad, max_degree)``;
* the graphs handed to the step carry bucket-canonical static metadata
  (``n_nodes = n_pad``, ``n_edges = e_pad``): the traced computation never
  reads those ints (masks carry the real-node information — verified by a
  repo-wide audit, all uses are host-side), and canonicalizing them keeps the
  jit cache key identical across a bucket.  True counts live on the
  :class:`TopoCase` for host-side slicing/writeback;
* parameters are shared across buckets (message passing is size-agnostic),
  so a step on a small mesh and a step on a large mesh train the same model.

The Pallas banded backend needs per-mesh band tensors at tile granularity;
multi-topology v1 builds none — with ``backend='pallas'`` the convs see
``graph.band is None`` and take their dense path automatically (documented
fallback).  Use dense/segment here; pallas banding per bucket is a later
optimization.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..foam.reader import FoamCase
from ..graph.build import build_graph
from ..graph.structs import Graph
from ..models.flow_gnn import FlowGNN, ModelConfig
from ..foam.reader import DEFAULT_FIELDS
from .loop import ReduceLROnPlateau, TrainConfig, init_state, make_eval_step, make_train_step
from .normalization import FieldNormalizer, pack_targets


@dataclasses.dataclass(frozen=True)
class TopoCase:
    """One mesh + its normalized targets, padded to a bucket shape."""

    name: str
    graph: Graph          # bucket-canonical static metadata (see module doc)
    n_nodes: int          # true counts (host-side slicing / writeback)
    n_edges: int
    targets: np.ndarray   # [S, n_pad, 7]

    @property
    def bucket(self) -> tuple[int, int, int]:
        g = self.graph
        return (g.n_pad, g.e_pad, g.max_degree)


@dataclasses.dataclass
class MultiTopoDataset:
    cases: list[TopoCase]
    normalizer: FieldNormalizer

    @property
    def buckets(self) -> dict[tuple[int, int, int], list[int]]:
        out: dict[tuple[int, int, int], list[int]] = {}
        for i, c in enumerate(self.cases):
            out.setdefault(c.bucket, []).append(i)
        return out


def _bucketize(graph: Graph) -> tuple[Graph, int, int]:
    """Canonicalize static metadata to the padded shape (bucket key)."""
    true_n, true_e = graph.n_nodes, graph.n_edges
    return (
        dataclasses.replace(graph, n_nodes=graph.n_pad, n_edges=graph.e_pad),
        true_n,
        true_e,
    )


def load_multitopo_dataset(
    case_paths: Sequence[str | Path],
    time_dir: str = "282",
    fields: tuple[str, ...] = DEFAULT_FIELDS,
    node_align: int = 512,
    edge_align: int = 2048,
    normalizer: FieldNormalizer | None = None,
) -> MultiTopoDataset:
    """Parse every case (meshes may differ arbitrarily), two-pass normalize.

    Pass 1 concatenates all cases' fields and fits one normalizer (same
    two-pass contract as the single-case ``load_dataset``); pass 2 builds a
    bandwidth-reordered padded graph per case and packs permuted targets.
    Coarse aligns make the buckets: e.g. 5k- and 5.1k-cell meshes share the
    (5120, …) bucket and its compiled step.
    """
    if not case_paths:
        raise ValueError("no case paths")
    parsed = []
    all_fields: dict[str, list[np.ndarray]] = {}
    for path in case_paths:
        case = FoamCase(path)
        mesh = case.load_mesh()
        f = case.load_fields(time_dir, fields=fields, n_cells=mesh.n_cells,
                             strict=True)
        parsed.append((str(path), mesh, f))
        for k, v in f.items():
            all_fields.setdefault(k, []).append(np.asarray(v, np.float64))
    if normalizer is None:
        concat = {k: np.concatenate(v, axis=0) for k, v in all_fields.items()}
        normalizer = FieldNormalizer().fit(concat)

    cases: list[TopoCase] = []
    for name, mesh, f in parsed:
        graph = build_graph(mesh, node_align=node_align, edge_align=edge_align)
        packed = pack_targets(normalizer.transform(f))
        if graph.perm is not None:
            packed = packed[np.asarray(graph.perm)[: graph.n_nodes]]
        tg = np.zeros((1, graph.n_pad, 7), np.float32)
        tg[0, : packed.shape[0]] = packed
        bgraph, true_n, true_e = _bucketize(graph)
        cases.append(TopoCase(
            name=name, graph=bgraph, n_nodes=true_n, n_edges=true_e,
            targets=tg,
        ))
    return MultiTopoDataset(cases=cases, normalizer=normalizer)


class MultiTopoTrainer:
    """Epoch loop over heterogeneous-mesh cases, one compiled step per bucket.

    Each step trains on one case (all its snapshots); the plateau scheduler
    runs on the mean epoch loss.  History follows the reference schema so the
    training-curve plotter works unchanged.
    """

    def __init__(
        self,
        dataset: MultiTopoDataset,
        model_config: ModelConfig,
        train_config: TrainConfig,
        output_dir: str | Path = "multitopo_out",
        log_fn: Callable = print,
    ):
        self.dataset = dataset
        self.model_config = model_config
        self.config = train_config
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.log = log_fn
        self.model = FlowGNN(model_config)
        # ONE jitted step/eval: jax.jit specializes per bucket shape
        self.train_step = make_train_step(self.model, train_config)
        self.eval_step = make_eval_step(self.model, train_config)
        self.rng = jax.random.PRNGKey(train_config.seed)
        self.np_rng = np.random.default_rng(train_config.seed)
        self.scheduler = ReduceLROnPlateau(
            train_config.lr,
            factor=train_config.plateau_factor,
            patience=train_config.plateau_patience,
            threshold=train_config.plateau_threshold,
            min_lr=train_config.plateau_min_lr,
        )
        self.state = None
        self._best_val = float("inf")
        self.history = {"epoch": [], "train_loss": [], "val_loss": [],
                        "learning_rate": [], "per_case_loss": []}

    def train(self) -> dict:
        cfg = self.config
        cases = self.dataset.cases
        buckets = self.dataset.buckets
        self.log(
            f"Multi-topology training: {len(cases)} cases in "
            f"{len(buckets)} bucket(s): "
            + ", ".join(
                f"{k}×{len(v)}" for k, v in sorted(buckets.items())
            )
        )
        # init on the largest bucket (parameters are shape-independent)
        big = max(cases, key=lambda c: c.graph.n_pad)
        self.rng, init_rng = jax.random.split(self.rng)
        self.state = init_state(self.model, big.graph, cfg, init_rng)
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree.leaves(self.state.params))
        self.log(f"Model parameters: {n_params:,}")

        device_targets = [jnp.asarray(c.targets) for c in cases]
        device_graphs = [c.graph.to_device() for c in cases]

        lr = self.scheduler.lr
        for epoch in range(1, cfg.epochs + 1):
            t0 = time.perf_counter()
            order = self.np_rng.permutation(len(cases))
            losses = np.zeros(len(cases))
            for ci in order:
                self.rng, step_rng = jax.random.split(self.rng)
                self.state, loss = self.train_step(
                    self.state, device_graphs[ci], device_targets[ci],
                    jnp.asarray(lr, jnp.float32), step_rng,
                )
                losses[ci] = float(loss)
            train_loss = float(losses.mean())
            val_losses = [
                float(self.eval_step(self.state, device_graphs[ci],
                                     device_targets[ci])[0])
                for ci in range(len(cases))
            ]
            val_loss = float(np.mean(val_losses))
            lr_used = lr
            if cfg.scheduler == "plateau":
                lr = self.scheduler.step(val_loss)
            self.history["epoch"].append(epoch)
            self.history["train_loss"].append(train_loss)
            self.history["val_loss"].append(val_loss)
            self.history["learning_rate"].append(lr_used)
            self.history["per_case_loss"].append(val_losses)
            dt = time.perf_counter() - t0
            self.log(
                f"Epoch {epoch}: train={train_loss:.6f} val={val_loss:.6f} "
                f"lr={lr_used:.3e} ({dt:.2f}s)"
            )
            if val_loss < self._best_val:
                self._best_val = val_loss
                self._save_checkpoint("best", epoch, val_loss)
        self._save_checkpoint(f"epoch_{cfg.epochs}", cfg.epochs,
                              self.history["val_loss"][-1])
        (self.output_dir / "training_history.json").write_text(
            json.dumps(self.history)
        )
        return self.history

    def _save_checkpoint(self, name: str, epoch: int, val_loss: float) -> None:
        """Predictor-compatible checkpoint (same layout as Trainer._save)."""
        from .checkpoint import save_checkpoint

        save_checkpoint(
            self.output_dir, name, self.state,
            epoch=epoch, val_loss=val_loss,
            model_config=self.model_config, train_config=self.config,
            normalizer=self.dataset.normalizer,
            extra={"multitopo_cases": [c.name for c in self.dataset.cases]},
        )

    def predict_case(self, case_index: int) -> np.ndarray:
        """Normalized predictions for one case in ORIGINAL cell order."""
        c = self.dataset.cases[case_index]
        out = np.asarray(self.eval_step(
            self.state, c.graph.to_device(), jnp.asarray(c.targets)
        )[2])[: c.n_nodes]
        if c.graph.perm is not None:
            perm = np.asarray(c.graph.perm)[: c.n_nodes]
            unperm = np.empty_like(out)
            unperm[perm] = out
            out = unperm
        return out
