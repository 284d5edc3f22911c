#!/usr/bin/env python
"""Categorized per-op device-trace rollup of the scale train step.

Groups the XLA-Ops-lane op durations of a (synthetic-grid) train step into
named buckets — Pallas conv kernels, epilogue kernels, [N, wide]/[N, narrow]
fusions, copies, rng — so the remaining tail is attributable at a glance.
Source of artifacts/scale_1m_tail_categories.json.

Usage: python tools/profile_tail_categories.py [--nodes 1000000]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def categorize(ops: dict, detail: dict, hidden: int) -> dict:
    wide = hidden * 4  # H*C of the attention layers
    cats: dict[str, list] = {}

    def add(cat, v):
        c = cats.setdefault(cat, [0.0, 0])
        c[0] += v
        c[1] += 1

    for k, v in ops.items():
        dt = detail.get(k, "")
        if re.match(r"conv_\d+\.", k) and "pallas" not in dt.lower():
            # named custom-calls from the conv layers: fwd/bwd/fold kernels
            add("pallas conv kernels", v)
        elif k.startswith("bn_"):
            add("pallas epilogue kernels", v)
        elif "pallas" in dt.lower() or "custom-call" in dt:
            add("pallas conv kernels", v)
        elif f",{wide}]" in dt or f",{wide}{{" in dt:
            add(f"[N,{wide}] fusions", v)
        elif f",{hidden}]" in dt or f",{hidden}{{" in dt:
            add(f"[N,{hidden}] fusions", v)
        elif re.search(r",(?:[1-9]|1[0-6])\]\{", dt):
            add("[N,narrow] fusions", v)
        elif "rng" in k or "rbg" in dt:
            add("rng", v)
        elif "copy" in k or "slice" in k:
            add("copies", v)
        elif "fusion" in k and re.search(r"\d+,\d+,\d+,", dt):
            add("partial-shaped fusions", v)
        else:
            add("other", v)
    return cats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--out", default="artifacts/scale_1m_tail_categories.json")
    args = ap.parse_args()

    from gnn_bfs_rans_tpu.graph.band import LAYER_COMPONENTS
    from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig
    from gnn_bfs_rans_tpu.train.loop import (
        TrainConfig, init_state, make_train_step,
    )
    from gnn_bfs_rans_tpu.utils.cache import enable_compilation_cache
    from gnn_bfs_rans_tpu.utils.synthetic import build_grid_graph
    from gnn_bfs_rans_tpu.utils.trace import trace_steps

    enable_compilation_cache()
    graph = build_grid_graph(
        args.nx, max(args.nodes // args.nx, 1), with_band=True,
        band_components=LAYER_COMPONENTS.get("GAT"),
    ).to_device()
    mcfg = ModelConfig(
        hidden_dim=args.hidden, num_layers=args.layers, layer_type="GAT",
        backend="pallas", dropout=args.dropout, compute_dtype="bfloat16",
        remat=False,
    )
    tcfg = TrainConfig()
    model = FlowGNN(mcfg)
    state = init_state(model, graph, tcfg, jax.random.PRNGKey(0))
    targets = jax.device_put(jnp.zeros((1, graph.n_pad, 7), jnp.float32))
    rng = jax.random.key(1, impl="rbg")
    step = make_train_step(model, tcfg)
    state, loss = step(state, graph, targets, 3e-4, rng)
    np.asarray(jax.device_get(loss))
    box = {"s": state}

    def launch(i):
        box["s"], ls = step(box["s"], graph, targets, 3e-4,
                            jax.random.fold_in(rng, i))
        return ls

    res = trace_steps(launch, n_steps=args.steps)
    cats = categorize(res["ops_us_per_step"], res["op_detail"], args.hidden)
    out = {
        "categories_us": {k: v[0] for k, v in sorted(
            cats.items(), key=lambda kv: -kv[1][0])},
        "n_ops": {k: v[1] for k, v in cats.items()},
        "total_us": res["device_total_s_per_step"] * 1e6,
        "config": {"nodes": args.nodes, "hidden": args.hidden,
                   "layers": args.layers, "dropout": args.dropout},
    }
    for k, (v, n) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        print(f"{v/1e3:9.2f} ms  n={n:4d}  {k}")
    print(f"{out['total_us']/1e3:9.2f} ms  total")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
