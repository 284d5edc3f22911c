"""Multi-case data parallelism: perturbed-geometry mesh variants per device.

BASELINE.json config 5: "replicated BFS-mesh variants (perturbed geometries)
sharded across N≥2 hosts, psum grads, ordered gather + OpenFOAM-format
writeback".  Mesh *topology* is shared (same owner/neighbour connectivity,
hence one padded adjacency) while geometry (cell centers → node features and
edge features) and targets vary per case:

* ``CaseBatch`` stacks per-case ``node_feat``/``edge_feat``/``targets`` with a
  leading case axis, sharded ``P('data')``; adjacency/masks are replicated;
* the train step runs under ``shard_map``: each device forwards its local
  case; gradients come out globally-reduced via the automatic cotangent psum
  (see ``data_parallel``); batch-norm moments are explicitly ``pmean``-synced
  — real sync-BN, since inputs now genuinely differ per device;
* ``dp_predict_cases`` returns predictions with the case axis in original
  order (device_get of a sharded array preserves global order), each case's
  rows un-permutable to original cell ids via ``graph.perm``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..foam.reader import FoamMesh
from ..graph.build import build_graph, compute_edge_features
from ..graph.structs import Graph
from ..models.flow_gnn import FlowGNN
from ..train.loop import TrainConfig, TrainState, _pressure_freeze_mask, make_optimizer
from ..train.normalization import weighted_fieldwise_mse


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CaseBatch:
    """Per-case geometry + targets over a shared mesh topology."""

    node_feats: jax.Array   # [C, N_pad, F]
    edge_feats: jax.Array   # [C, E_pad, 4]
    targets: jax.Array      # [C, N_pad, 7]

    @property
    def n_cases(self) -> int:
        return self.node_feats.shape[0]


def make_perturbed_cases(
    mesh: FoamMesh,
    n_cases: int,
    amplitude: float = 0.02,
    seed: int = 0,
    targets: np.ndarray | None = None,
) -> tuple[Graph, CaseBatch]:
    """Generate geometry-perturbed variants of one mesh (shared topology).

    Each case jitters cell centers by ``amplitude × local edge length`` —
    a stand-in for a family of related geometries (the realistic workload is
    one OpenFOAM case per variant; this synthesizes it from a single case).
    ``targets`` defaults to zeros (caller supplies real normalized targets
    per case when available).
    """
    base = build_graph(mesh)
    rng = np.random.default_rng(seed)
    senders = np.asarray(base.senders)
    receivers = np.asarray(base.receivers)
    node_feats = np.zeros((n_cases, base.n_pad, 3), dtype=np.float32)
    edge_feats = np.zeros((n_cases, base.e_pad, 4), dtype=np.float32)
    base_coords = np.asarray(base.node_feat, dtype=np.float64)
    # local length scale: mean incident edge length
    ef = np.asarray(base.edge_feat)
    scale = float(ef[: base.n_edges, 3].mean())
    mask = np.asarray(base.node_mask)
    for c in range(n_cases):
        jitter = rng.normal(size=base_coords.shape) * (amplitude * scale)
        jitter[:, 2] = 0.0  # keep 2D cases planar
        coords = base_coords + jitter * mask[:, None]
        node_feats[c] = coords.astype(np.float32)
        edge_feats[c] = compute_edge_features(coords, senders, receivers)
        edge_feats[c, base.n_edges:] = 0.0
    if targets is None:
        targets = np.zeros((n_cases, base.n_pad, 7), dtype=np.float32)
    return base, CaseBatch(
        node_feats=node_feats,
        edge_feats=edge_feats,
        targets=np.asarray(targets, dtype=np.float32),
    )


def shard_cases(batch: CaseBatch, mesh: Mesh) -> CaseBatch:
    sh = NamedSharding(mesh, P("data"))
    return CaseBatch(
        node_feats=jax.device_put(batch.node_feats, sh),
        edge_feats=jax.device_put(batch.edge_feats, sh),
        targets=jax.device_put(batch.targets, sh),
    )


def _local_graph(graph: Graph, node_feat, edge_feat) -> Graph:
    return dataclasses.replace(graph, node_feat=node_feat, edge_feat=edge_feat)


def make_multicase_train_step(
    model: FlowGNN, cfg: TrainConfig, mesh: Mesh
) -> Callable:
    """DP train step over per-device cases; one case per device per step."""
    tx = make_optimizer(cfg)

    def local_step(state, graph, node_feat, edge_feat, targets, lr, rng):
        n_dev = jax.lax.axis_size("data")

        def loss_fn(params):
            losses = []
            new_bs = state.batch_stats
            # loop over this shard's cases (usually 1)
            for c in range(node_feat.shape[0]):
                g = _local_graph(graph, node_feat[c], edge_feat[c])
                out, mutated = model.apply(
                    {"params": params, "batch_stats": new_bs},
                    g,
                    train=True,
                    rngs={"dropout": rng},
                    mutable=["batch_stats"],
                )
                new_bs = mutated["batch_stats"]
                losses.append(
                    weighted_fieldwise_mse(
                        out, targets[c], graph.node_mask,
                        pressure_ref_weight=cfg.pressure_ref_weight,
                    )
                )
            total_cases = node_feat.shape[0] * n_dev
            loss_share = jnp.sum(jnp.stack(losses)) / total_cases
            return loss_share, new_bs

        (loss_share, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        loss = jax.lax.psum(loss_share, "data")
        # real sync-BN: inputs differ per device, so moments must be averaged
        new_bs = jax.lax.pmean(new_bs, "data")
        return loss, grads, new_bs

    @partial(jax.jit, static_argnames=("freeze_pressure",), donate_argnums=(0,))
    def step(
        state: TrainState,
        graph: Graph,
        batch: CaseBatch,
        lr: jax.Array,
        rng: jax.Array,
        freeze_pressure: bool = False,
    ):
        loss, grads, new_bs = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), P("data"), P(), P()),
            out_specs=(P(), P(), P()),
        )(state, graph, batch.node_feats, batch.edge_feats, batch.targets,
          lr, rng)
        if freeze_pressure:
            grads = jax.tree_util.tree_map_with_path(_pressure_freeze_mask, grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        if freeze_pressure:
            updates = jax.tree_util.tree_map_with_path(
                _pressure_freeze_mask, updates
            )
        updates = jax.tree.map(lambda u: -lr * u, updates)
        import optax

        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_bs, opt_state=new_opt,
        ), loss

    return step


def make_multicase_forward(model: FlowGNN, mesh: Mesh) -> Callable:
    """Per-case DP inference: each device forwards its local cases."""

    def local_fwd(params, batch_stats, graph, node_feat, edge_feat):
        outs = []
        for c in range(node_feat.shape[0]):
            g = _local_graph(graph, node_feat[c], edge_feat[c])
            outs.append(
                model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    g, train=False,
                )
            )
        return jnp.stack(outs)

    @jax.jit
    def forward(params, batch_stats, graph: Graph, batch: CaseBatch):
        return jax.shard_map(
            local_fwd,
            mesh=mesh,
            in_specs=(P(), P(), P(), P("data"), P("data")),
            out_specs=P("data"),
        )(params, batch_stats, graph, batch.node_feats, batch.edge_feats)

    return forward


def gather_case_predictions(
    out: jax.Array, graph: Graph
) -> np.ndarray:
    """[C, N_pad, 7] sharded → host array in case order + ORIGINAL cell order."""
    host = np.asarray(jax.device_get(out))[:, : graph.n_nodes]
    if graph.perm is not None:
        perm = np.asarray(graph.perm)[: graph.n_nodes]
        unperm = np.empty_like(host)
        unperm[:, perm] = host
        host = unperm
    return host
