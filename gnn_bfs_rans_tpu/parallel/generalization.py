"""Streamed multi-case training and geometry-generalization evaluation.

Combines the double-buffered case stream (``train.streaming``) with the
shard_map multi-case DP step (``parallel.multicase``) into a training driver,
and evaluates **geometry generalization**: train on a family of perturbed
geometries, evaluate on held-out perturbations never seen in training — the
scientific step beyond the reference's single-case memorization (the
reference trains and validates on the same snapshots, SURVEY.md §2 quirk 6).

Targets for the synthetic family are analytic functions of the cell-center
coordinates (smooth divergence-free-ish velocity + positive scalar fields),
so ground truth exists for any geometry and the held-out error isolates the
model's ability to interpolate across geometry variations.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.structs import Graph
from ..models.flow_gnn import FlowGNN, ModelConfig
from ..train.loop import TrainConfig, init_state
from ..train.streaming import Prefetcher, perturbed_case_source
from .multicase import (
    CaseBatch,
    gather_case_predictions,
    make_multicase_forward,
    make_multicase_train_step,
)


def analytic_targets(cid: int, coords: np.ndarray) -> np.ndarray:
    """Smooth geometry-dependent reference fields [N, 7] (normalized scale).

    Ux = sin(2πx̂)cos(2πŷ), Uy = −cos(2πx̂)sin(2πŷ) (divergence-free),
    p = cos(2πx̂)cos(2πŷ), k/eps/nut = smooth positives — all functions of
    the (perturbed) coordinates, so each geometry has distinct targets.
    """
    x, y = coords[:, 0], coords[:, 1]
    lo = np.array([x.min(), y.min()])
    span = np.array([max(x.max() - lo[0], 1e-9), max(y.max() - lo[1], 1e-9)])
    xh = (x - lo[0]) / span[0]
    yh = (y - lo[1]) / span[1]
    two_pi = 2 * np.pi
    out = np.zeros((coords.shape[0], 7), dtype=np.float32)
    out[:, 0] = np.sin(two_pi * xh) * np.cos(two_pi * yh)
    out[:, 1] = -np.cos(two_pi * xh) * np.sin(two_pi * yh)
    out[:, 2] = 0.0
    out[:, 3] = np.cos(two_pi * xh) * np.cos(two_pi * yh)
    out[:, 4] = 0.5 + 0.4 * np.sin(two_pi * xh) * np.sin(two_pi * yh)
    out[:, 5] = 0.5 + 0.4 * np.cos(two_pi * (xh + yh))
    out[:, 6] = 0.3 + 0.2 * np.sin(two_pi * (xh - yh))
    return out


def train_multicase_streamed(
    model: FlowGNN,
    tcfg: TrainConfig,
    mesh: Mesh,
    graph: Graph,
    source_factory: Callable[[], "object"],
    epochs: int = 1,
    lr: float | None = None,
    log_every: int = 0,
    prefetch_depth: int = 2,
):
    """Train over a streaming case source; returns (state, history).

    ``source_factory()`` must return a fresh iterator of CaseBatch chunks
    (each chunk's case count divisible by the mesh's data-axis size) —
    called once per epoch.  Chunks are prefetched to device with the
    ``P('data')`` sharding on a background thread.
    """
    sharding = NamedSharding(mesh, P("data"))
    step = make_multicase_train_step(model, tcfg, mesh)
    state = None
    rng = jax.random.key(tcfg.seed, impl="rbg")  # see train.Trainer
    lr_arr = jnp.asarray(lr if lr is not None else tcfg.lr, jnp.float32)
    history = []
    graph_dev = graph.to_device()
    n_steps = 0
    for epoch in range(epochs):
        pf = Prefetcher(source_factory(), sharding=sharding,
                        depth=prefetch_depth)
        ep_losses = []
        t0 = time.time()
        for batch in pf:
            if state is None:
                state = init_state(model, graph_dev, tcfg, jax.random.PRNGKey(0))
            rng, step_rng = jax.random.split(rng)
            state, loss = step(state, graph_dev, batch, lr_arr, step_rng)
            ep_losses.append(loss)
            n_steps += 1
            if log_every and n_steps % log_every == 0:
                print(f"step {n_steps}: loss={float(loss):.6f}", flush=True)
        ep_loss = float(np.mean([float(l) for l in ep_losses]))
        history.append({"epoch": epoch + 1, "loss": ep_loss,
                        "seconds": time.time() - t0})
    return state, history


def run_geometry_generalization(
    base_graph: Graph,
    mesh: Mesh,
    n_train_cases: int = 16,
    n_test_cases: int = 4,
    epochs: int = 30,
    amplitude: float = 0.05,
    model_cfg: ModelConfig | None = None,
    lr: float = 3e-3,
    seed: int = 0,
) -> dict:
    """Train on perturbed geometries, evaluate on held-out ones.

    Returns per-field mean-absolute errors on train-family and held-out
    geometries plus their ratio (≈1 ⇒ the model generalizes across geometry
    rather than memorizing training cases).
    """
    n_dev = mesh.devices.size
    if n_train_cases % n_dev or n_test_cases % n_dev:
        raise ValueError("case counts must be divisible by the data axis size")
    mcfg = model_cfg or ModelConfig(
        hidden_dim=64, num_layers=3, layer_type="GCN", dropout=0.0,
        norm_type="layer", backend="dense",
    )
    model = FlowGNN(mcfg)
    tcfg = TrainConfig(lr=lr, seed=seed)

    def make_source():
        return perturbed_case_source(
            base_graph, n_train_cases, chunk=n_dev, amplitude=amplitude,
            seed=seed, targets_for=analytic_targets,
        )

    state, history = train_multicase_streamed(
        model, tcfg, mesh, base_graph, make_source, epochs=epochs, lr=lr,
    )

    fwd = make_multicase_forward(model, mesh)
    sharding = NamedSharding(mesh, P("data"))
    graph_dev = base_graph.to_device()

    def eval_family(seed_offset: int, n_cases: int) -> dict:
        src = perturbed_case_source(
            base_graph, n_cases, chunk=n_cases, amplitude=amplitude,
            seed=seed + seed_offset, targets_for=analytic_targets,
        )
        batch = next(iter(src))
        batch_dev = jax.tree.map(
            lambda a: jax.device_put(a, sharding), batch
        )
        out = fwd(state.params, state.batch_stats, graph_dev, batch_dev)
        pred = gather_case_predictions(out, base_graph)
        true = gather_case_predictions(
            jnp.asarray(batch.targets), base_graph
        )
        mask = np.asarray(base_graph.node_mask)[: base_graph.n_nodes]
        errs = {}
        names = {"U": (0, 3), "p": (3, 4), "k": (4, 5),
                 "epsilon": (5, 6), "nut": (6, 7)}
        for name, (a, b) in names.items():
            diff = pred[:, mask, a:b] - true[:, mask, a:b]
            if name == "U":
                errs[name] = float(np.linalg.norm(diff, axis=-1).mean())
            else:
                errs[name] = float(np.abs(diff).mean())
        return errs

    # train family: the exact seeds used in training (offset 0, first cases)
    train_errs = eval_family(0, min(n_train_cases, max(n_dev, 4)))
    # held-out: per-case rng streams seeded past every training case id
    test_errs = eval_family(n_train_cases, n_test_cases)
    gap = {
        k: (test_errs[k] / train_errs[k] if train_errs[k] > 0 else float("inf"))
        for k in train_errs
    }
    return {
        "train_errors": train_errs,
        "heldout_errors": test_errs,
        "generalization_ratio": gap,
        "history": history,
        "n_train_cases": n_train_cases,
        "n_test_cases": n_test_cases,
        "amplitude": amplitude,
        "devices": int(n_dev),
    }
