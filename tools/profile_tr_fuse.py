#!/usr/bin/env python
"""A/B the PIPELINED fused-projection Transformer eval path (ROADMAP r2 #2).

Round-2's fused variant ran ~20 serialized per-block projections of the 3
q/k/v matrices per grid step and measured SLOWER than unfused (1.64 vs
1.11 ms forward at the flagship shape).  Round 3 pipelines it: the sender
window concatenates once and each matrix projects with a single fat
[span·sub, F] @ [F, H·C] MXU matmul, and per-group k/v windows become
contiguous slices (the unfused path's per-group concatenates disappear too).

This tool measures the full 4-layer edge-conditioned Transformer EVAL
forward (H=256, pallas, bf16, BFS mesh) with ModelConfig.fuse_eval off/on
and writes artifacts/tr_fuse_ab.json.  Chained-marginal timing.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--out", default="artifacts/tr_fuse_ab.json")
    args = ap.parse_args()

    from gnn_bfs_rans_tpu.graph.band import LAYER_COMPONENTS
    from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig
    from gnn_bfs_rans_tpu.train import TrainConfig, load_dataset
    from gnn_bfs_rans_tpu.train.loop import init_state
    from gnn_bfs_rans_tpu.utils.bench import chained_marginal_time
    from gnn_bfs_rans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    dataset = load_dataset(
        "/root/reference/OpenFOAM-data", with_band=True,
        band_components=LAYER_COMPONENTS.get("Transformer"),
    )
    graph = dataset.graph.to_device()
    assert graph.band is not None and graph.band.geo is not None

    results = {}
    for fuse in (False, True):
        mcfg = ModelConfig(
            hidden_dim=args.hidden, num_layers=args.layers,
            layer_type="Transformer", backend="pallas", dropout=0.0,
            compute_dtype="bfloat16", fuse_eval=fuse,
        )
        model = FlowGNN(mcfg)
        state = init_state(model, graph, TrainConfig(), jax.random.PRNGKey(0))

        def apply_fn(g, _m=model, _s=state):
            return _m.apply(
                {"params": _s.params, "batch_stats": _s.batch_stats},
                g, train=False,
            )

        t = chained_marginal_time(apply_fn, graph, reps=args.reps).step_s
        results["fuse_eval" if fuse else "unfused"] = t
        print(f"{'fuse_eval' if fuse else 'unfused':10s} {t*1e3:7.3f} ms fwd",
              flush=True)

    speedup = results["unfused"] / results["fuse_eval"]
    print(f"speedup {speedup:.3f}x", flush=True)
    out = {
        "config": dataclasses.asdict(ModelConfig(
            hidden_dim=args.hidden, num_layers=args.layers,
            layer_type="Transformer", backend="pallas",
            compute_dtype="bfloat16")),
        "platform": jax.devices()[0].platform,
        "forward_s": results,
        "speedup_fused_over_unfused": speedup,
        "variant": "pipelined (one fat projection matmul per matrix; "
                   "windows are slices)",
        "timing": "chained_marginal",
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
