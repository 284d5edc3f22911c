"""Synthetic structured-mesh graphs for scale benchmarking.

The bundled BFS case (12k cells) is dispatch-latency-bound on a modern TPU;
these generators build arbitrarily large quad-grid "meshes" (the same
4-neighbor topology a 2D CFD mesh has) to measure the compute-bound regime —
the reference claims ~10k–100k cells single-device capacity
(``THEORY_AND_METHODS.md:508``); this framework targets millions.

Grid cells are numbered row-major with ``nx`` columns, so the adjacency is
already banded with bandwidth ``nx`` — ``nx < tile`` (default 96) gives the
3-tile-window kernels; wider grids up to ``nx ≤ 2·tile`` use the 5-tile
window (see ``graph.band``) without reordering.
"""

from __future__ import annotations

import numpy as np

from ..graph.band import build_band
from ..graph.structs import Graph, build_padded_graph


def build_grid_graph(
    nx: int, ny: int, with_band: bool = True, tile: int = 128,
    band_components: tuple[str, ...] | None = None,
) -> Graph:
    """A quad-grid graph of ``nx × ny`` cells with 4-neighbor adjacency."""
    import dataclasses

    n = nx * ny
    idx = np.arange(n).reshape(ny, nx)
    right = np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()])
    up = np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()])
    und = np.concatenate([right, up], axis=1)
    senders = np.concatenate([und[0], und[1]]).astype(np.int32)
    receivers = np.concatenate([und[1], und[0]]).astype(np.int32)

    xs = (np.arange(nx) + 0.5) / nx
    ys = (np.arange(ny) + 0.5) / ny
    coords = np.stack(
        [np.tile(xs, ny), np.repeat(ys, nx), np.zeros(n)], axis=1
    ).astype(np.float32)
    direction = coords[receivers] - coords[senders]
    dist = np.linalg.norm(direction, axis=1, keepdims=True)
    unit = direction / np.maximum(dist, 1e-12)
    edge_feat = np.concatenate([unit, dist], axis=1).astype(np.float32)

    graph = build_padded_graph(
        senders, receivers, edge_feat, coords,
        node_align=tile, edge_align=tile,
    )
    if with_band:
        from ..graph.band import ALL_COMPONENTS

        comps = band_components or ALL_COMPONENTS
        band = build_band(
            np.asarray(graph.senders)[: graph.n_edges],
            np.asarray(graph.receivers)[: graph.n_edges],
            graph.n_pad,
            np.asarray(graph.node_mask),
            np.asarray(graph.in_degree),
            tile=tile,
            components=comps,
            edge_feat=(np.asarray(graph.edge_feat)[: graph.n_edges]
                       if ("edge" in comps or "geo" in comps) else None),
            node_pos=np.asarray(graph.node_feat),
        )
        if band is not None:
            graph = dataclasses.replace(graph, band=band)
    return graph


def run_partition_shard_benchmark(
    global_nodes: int = 1_000_000,
    n_shards: int = 8,
    layer_type: str = "GAT",
    num_layers: int = 4,
    hidden_dim: int = 128,
    compute_dtype: str = "bfloat16",
    nx: int = 96,
    halo: int = 128,
    steps: int = 12,
) -> dict:
    """Single-chip banded forward on ONE shard of a partitioned mesh.

    The per-chip throughput proxy for pod-scale partitioned training: one
    shard of a ``global_nodes``-cell mesh is ``global_nodes/n_shards`` owned
    rows plus ``2·halo`` halo rows, and the shard runs the SAME
    ``make_partitioned_forward`` code (1-device mesh) with its band-tensor
    slices — so this measures exactly the compute each chip does at scale;
    the per-layer halo ppermute (2·halo·H rows over ICI) is the only part
    not measured and is negligible by construction.
    """
    import jax

    from ..graph.band import LAYER_COMPONENTS
    from ..models.flow_gnn import FlowGNN, ModelConfig
    from ..parallel import (
        build_partition,
        make_data_mesh,
        make_partitioned_forward,
        shard_partition,
    )
    from ..train.loop import TrainConfig, init_state
    from .bench import chained_marginal_time

    n_loc_target = max(global_nodes // n_shards, nx)
    ny = max(n_loc_target // nx, 1)
    graph = build_grid_graph(
        nx, ny, with_band=True,
        band_components=LAYER_COMPONENTS.get(layer_type),
    )
    if graph.band is None:
        raise ValueError(f"grid nx={nx} is not band-limited at tile=128")
    mesh = make_data_mesh(1)
    pg = build_partition(graph, 1, halo=halo)
    assert pg.has_band, "partition must carry band slices"
    pg = shard_partition(pg, mesh)

    mcfg = ModelConfig(
        hidden_dim=hidden_dim, num_layers=num_layers, layer_type=layer_type,
        backend="pallas", dropout=0.0, compute_dtype=compute_dtype,
    )
    model = FlowGNN(mcfg)
    state = init_state(model, graph, TrainConfig(), jax.random.PRNGKey(0))
    fwd = make_partitioned_forward(mcfg, mesh, halo=halo)

    def apply_fn(p):
        return fwd(state.params, state.batch_stats, p)

    step_s = chained_marginal_time(apply_fn, pg, reps=max(steps, 8)).step_s
    msgs = num_layers * graph.n_edges
    return {
        "metric": "edge_messages_per_sec_per_chip",
        "value": msgs / step_s,
        "unit": "msgs/s",
        "mode": "partitioned_shard_forward",
        "global_nodes": global_nodes,
        "n_shards": n_shards,
        "shard_nodes": graph.n_nodes,
        "n_edges": graph.n_edges,
        "halo": halo,
        "layer_type": layer_type,
        "backend": "pallas",
        "compute_dtype": compute_dtype,
        "hidden_dim": hidden_dim,
        "num_layers": num_layers,
        "step_median_s": step_s,
        "platform": jax.devices()[0].platform,
        "timing": "chained_marginal",
    }


def run_scale_benchmark(
    n_nodes: int = 1_000_000,
    layer_type: str = "GAT",
    num_layers: int = 4,
    hidden_dim: int = 128,
    backend: str = "dense",
    compute_dtype: str = "float32",
    steps: int = 20,
    nx: int = 96,
    mode: str = "forward",
    remat: bool = False,
) -> dict:
    """Forward or full-train-step benchmark on a synthetic ~n_nodes grid.

    ``mode='train'`` runs the jitted train step (fwd + loss + bwd + Adam) on
    one random snapshot; ``remat`` rematerializes the convs under
    jax.checkpoint — the memory lever that fits million-cell training on a
    single chip (per-layer [N, H·C] activations recomputed, not stored).
    """
    import time as _time

    import jax
    import jax.numpy as jnp

    from ..models.flow_gnn import FlowGNN, ModelConfig
    from ..train.loop import TrainConfig, init_state, make_train_step
    from .bench import chained_marginal_time

    from ..graph.band import LAYER_COMPONENTS

    ny = max(n_nodes // nx, 1)
    graph = build_grid_graph(
        nx, ny, with_band=(backend == "pallas"),
        band_components=LAYER_COMPONENTS.get(layer_type),
    ).to_device()
    mcfg = ModelConfig(
        hidden_dim=hidden_dim, num_layers=num_layers, layer_type=layer_type,
        backend=backend, dropout=0.0, compute_dtype=compute_dtype,
        remat=remat,
    )
    tcfg = TrainConfig()
    model = FlowGNN(mcfg)
    state = init_state(model, graph, tcfg, jax.random.PRNGKey(0))

    if mode == "forward":
        def apply_fn(g):
            return model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                g, train=False,
            )

        step_s = chained_marginal_time(apply_fn, graph, reps=max(steps, 8)).step_s
    else:
        raw_step = make_train_step(model, tcfg, jit=False)
        targets = jax.device_put(
            jnp.zeros((1, graph.n_pad, 7), jnp.float32))
        lr = jnp.asarray(3e-4, jnp.float32)
        rng = jax.random.key(1, impl="rbg")

        @jax.jit
        def chain(s0, g, k):
            def body(i, s):
                s2, _ = raw_step(s, g, targets, lr, jax.random.fold_in(rng, i))
                return s2
            return jax.lax.fori_loop(0, k, body, s0)

        def best(k, trials=3):
            kk = jnp.asarray(k, jnp.int32)
            out = chain(state, graph, kk)
            np.asarray(jax.device_get(out.params["out_3"]["bias"]))
            b = float("inf")
            for _ in range(trials):
                t0 = _time.perf_counter()
                out = chain(state, graph, kk)
                np.asarray(jax.device_get(out.params["out_3"]["bias"]))
                b = min(b, _time.perf_counter() - t0)
            return b

        base, reps = 2, max(steps, 8)
        step_s = max((best(reps) - best(base)) / (reps - base), 1e-9)

    stats = {"median_s": step_s}
    msgs = num_layers * graph.n_edges
    return {
        "metric": "edge_messages_per_sec_per_chip",
        "value": msgs / stats["median_s"],
        "unit": "msgs/s",
        "mode": mode,
        "remat": remat,
        "n_nodes": graph.n_nodes,
        "n_edges": graph.n_edges,
        "layer_type": layer_type,
        "backend": backend,
        "compute_dtype": compute_dtype,
        "hidden_dim": hidden_dim,
        "num_layers": num_layers,
        "step_median_s": stats["median_s"],
        "platform": jax.devices()[0].platform,
    }
