"""Benchmark harness: edge-messages/sec/chip and epochs/sec.

The headline metric (BASELINE.json): edge-messages/sec/chip for a 4-layer GAT
on the BFS mesh — one "edge message" = one edge processed by one conv layer,
so a forward pass emits ``num_layers × n_edges`` messages.  Timing uses
``jax.block_until_ready`` around steady-state jitted calls (compile excluded),
per the SURVEY.md §5 tracing plan.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, *args, steps: int = 50, warmup: int = 5) -> dict:
    """Median/mean wall time of a jitted callable (compile excluded)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times = np.array(times)
    return {
        "median_s": float(np.median(times)),
        "mean_s": float(times.mean()),
        "p10_s": float(np.percentile(times, 10)),
        "min_s": float(times.min()),
        "steps": steps,
    }


def run_benchmark(
    case_path: str = "/root/reference/OpenFOAM-data",
    layer_type: str = "GAT",
    num_layers: int = 4,
    hidden_dim: int = 256,
    backend: str = "dense",
    steps: int = 50,
    mode: str = "forward",
    baseline_msgs_per_sec: float = 1e8,
    compute_dtype: str = "float32",
) -> dict:
    """Benchmark a model config on the BFS mesh; returns a JSON-able dict."""
    from ..models.flow_gnn import FlowGNN, ModelConfig
    from ..train import TrainConfig, load_dataset
    from ..train.loop import init_state, make_forward, make_train_step

    dataset = load_dataset(case_path, with_band=(backend == "pallas"))
    graph = dataset.graph.to_device()
    targets = jnp.asarray(dataset.targets)

    mcfg = ModelConfig(
        hidden_dim=hidden_dim,
        num_layers=num_layers,
        layer_type=layer_type,
        backend=backend,
        dropout=0.0 if mode == "forward" else 0.1,
        compute_dtype=compute_dtype,
    )
    tcfg = TrainConfig()
    model = FlowGNN(mcfg)
    state = init_state(model, graph, tcfg, jax.random.PRNGKey(0))

    edge_messages = num_layers * graph.n_edges

    if mode == "forward":
        forward = make_forward(model)
        stats = time_fn(
            forward, state.params, state.batch_stats, graph, steps=steps
        )
    else:
        step = make_train_step(model, tcfg)
        rng = jax.random.PRNGKey(1)
        lr = jnp.asarray(3e-4, jnp.float32)

        def run(state_):
            return step(state_, graph, targets, lr, rng)[0]

        # donated state: re-thread it through the timer
        s = state
        for _ in range(5):
            s, _ = step(s, graph, targets, lr, rng)
        jax.block_until_ready(s.params)
        times = []
        for _ in range(steps):
            t0 = time.perf_counter()
            s, loss = step(s, graph, targets, lr, rng)
            jax.block_until_ready(loss)
            times.append(time.perf_counter() - t0)
        arr = np.array(times)
        stats = {
            "median_s": float(np.median(arr)),
            "mean_s": float(arr.mean()),
            "p10_s": float(np.percentile(arr, 10)),
            "min_s": float(arr.min()),
            "steps": steps,
        }

    msgs_per_sec = edge_messages / stats["median_s"]
    device = jax.devices()[0]
    return {
        "metric": "edge_messages_per_sec_per_chip",
        "value": msgs_per_sec,
        "unit": "msgs/s",
        "vs_baseline": msgs_per_sec / baseline_msgs_per_sec,
        "mode": mode,
        "layer_type": layer_type,
        "num_layers": num_layers,
        "hidden_dim": hidden_dim,
        "backend": backend,
        "compute_dtype": compute_dtype,
        "n_edges": graph.n_edges,
        "n_nodes": graph.n_nodes,
        "step_median_s": stats["median_s"],
        "step_min_s": stats["min_s"],
        "steps_per_sec": 1.0 / stats["median_s"],
        "device": str(device),
        "platform": device.platform,
    }
