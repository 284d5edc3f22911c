#!/usr/bin/env python
"""Per-op TPU trace of the scale train step (authoritative decomposition).

Chained-marginal wall timing (profile_scale_train/bwd) attributes *totals*
but cannot see inside a step.  This captures a ``jax.profiler`` trace of a
few real train steps and aggregates the DEVICE-lane op durations from the
trace.json.gz — per-fusion/per-custom-call (Pallas kernel) milliseconds, the
ground truth for where a step spends its time.  (Device tracing works over
the tunneled axon runtime; a 4096³ bf16 matmul traces at ~196 TFLOP/s,
validating the lane timings.)

Writes artifacts/scale_step_trace.json with the top ops.

Usage: python tools/profile_trace_step.py [--nodes 1000000] [--steps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--out", default="artifacts/scale_step_trace.json")
    args = ap.parse_args()

    from gnn_bfs_rans_tpu.graph.band import LAYER_COMPONENTS
    from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig
    from gnn_bfs_rans_tpu.train.loop import (
        TrainConfig, init_state, make_train_step,
    )
    from gnn_bfs_rans_tpu.utils.cache import enable_compilation_cache
    from gnn_bfs_rans_tpu.utils.synthetic import build_grid_graph

    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)

    ny = max(args.nodes // args.nx, 1)
    graph = build_grid_graph(
        args.nx, ny, with_band=True,
        band_components=LAYER_COMPONENTS.get("GAT"),
    ).to_device()
    print(f"nodes={graph.n_nodes} edges={graph.n_edges}", flush=True)

    mcfg = ModelConfig(
        hidden_dim=args.hidden, num_layers=args.layers, layer_type="GAT",
        backend="pallas", dropout=args.dropout, compute_dtype="bfloat16",
        remat=False,
    )
    tcfg = TrainConfig()
    model = FlowGNN(mcfg)
    state = init_state(model, graph, tcfg, jax.random.PRNGKey(0))
    targets = jax.device_put(jnp.zeros((1, graph.n_pad, 7), jnp.float32))
    lr = jnp.asarray(3e-4, jnp.float32)
    rng = jax.random.key(1, impl="rbg")
    step = make_train_step(model, tcfg)

    # warm up / compile
    state, loss = step(state, graph, targets, lr, rng)
    np.asarray(jax.device_get(loss))

    from gnn_bfs_rans_tpu.utils.trace import top_ops, trace_steps

    box = {"state": state}

    def launch(i):
        box["state"], loss = step(box["state"], graph, targets, lr,
                                  jax.random.fold_in(rng, i))
        return loss

    res = trace_steps(launch, n_steps=args.steps)
    summary = top_ops(res, n=args.top)
    print(f"\ndevice total {summary['device_total_ms_per_step']:.2f} ms/step "
          f"over {args.steps} steps; top ops:", flush=True)
    for name, us in summary["top_ops_us_per_step"].items():
        extra = summary["op_detail"].get(name, "")
        print(f"{us/1e3:9.3f} ms  {name[:60]}  {extra[:140]}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({
            "n_nodes": graph.n_nodes, "n_edges": graph.n_edges,
            "hidden_dim": args.hidden, "num_layers": args.layers,
            "dropout": args.dropout, "steps": args.steps,
            **summary,
        }, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
