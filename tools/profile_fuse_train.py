#!/usr/bin/env python
"""A/B the fused-projection GAT TRAINING path (ROADMAP r2 item 3).

Measures the flagship train step (4-layer GAT, H=256, pallas, bf16,
dropout 0.1, BFS mesh) with ``fuse_train`` off (unfused: z = lin(x) in XLA,
z stored as the backward residual) vs on (z projected inside the forward
kernel; the custom VJP re-projects it in the backward).  The trade:
forward saves z's [N, H·C] HBM write+read + a dispatch; backward pays one
extra [N, F] @ [F, H·C] projection.

Chained-marginal timing (utils.bench methodology).  Writes
artifacts/fuse_train_ab.json.

Usage: python tools/profile_fuse_train.py [--hidden 256] [--layers 4]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--out", default="artifacts/fuse_train_ab.json")
    args = ap.parse_args()

    from gnn_bfs_rans_tpu.graph.band import LAYER_COMPONENTS
    from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig
    from gnn_bfs_rans_tpu.train import TrainConfig, load_dataset
    from gnn_bfs_rans_tpu.train.loop import init_state, make_train_step
    from gnn_bfs_rans_tpu.utils.bench import _fetch_scalar
    from gnn_bfs_rans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)

    dataset = load_dataset(
        "/root/reference/OpenFOAM-data", with_band=True,
        band_components=LAYER_COMPONENTS.get("GAT"),
    )
    graph = dataset.graph.to_device()
    targets = jnp.asarray(dataset.targets)
    tcfg = TrainConfig()
    lr = jnp.asarray(3e-4, jnp.float32)
    rng = jax.random.key(1, impl="rbg")

    results = {}
    for fuse in (False, True):
        mcfg = ModelConfig(
            hidden_dim=args.hidden, num_layers=args.layers, layer_type="GAT",
            backend="pallas", dropout=args.dropout,
            compute_dtype="bfloat16", fuse_train=fuse,
        )
        model = FlowGNN(mcfg)
        state = init_state(model, graph, tcfg, jax.random.PRNGKey(0))
        raw = make_train_step(model, tcfg, jit=False)

        @jax.jit
        def chain(s0, g, tgt, k, _raw=raw):
            def body(i, s):
                s2, _ = _raw(s, g, tgt, lr, jax.random.fold_in(rng, i))
                return s2

            return jax.lax.fori_loop(0, k, body, s0)

        def best_time(k, trials=3, _chain=chain, _state=state):
            kk = jnp.asarray(k, jnp.int32)
            out = _chain(_state, graph, targets, kk)
            _fetch_scalar(out.params["out_3"]["bias"])
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                out = _chain(_state, graph, targets, kk)
                _fetch_scalar(out.params["out_3"]["bias"])
                best = min(best, time.perf_counter() - t0)
            return best

        base, reps = 2, args.reps
        t = max((best_time(reps) - best_time(base)) / (reps - base), 1e-9)
        results["fuse_train" if fuse else "unfused"] = t
        print(f"{'fuse_train' if fuse else 'unfused':11s} {t*1e3:7.3f} ms/step",
              flush=True)

    speedup = results["unfused"] / results["fuse_train"]
    print(f"speedup {speedup:.3f}x", flush=True)
    out = {
        "config": {"hidden_dim": args.hidden, "num_layers": args.layers,
                   "layer_type": "GAT", "backend": "pallas",
                   "compute_dtype": "bfloat16", "dropout": args.dropout},
        "platform": jax.devices()[0].platform,
        "step_s": results,
        "speedup_fused_over_unfused": speedup,
        "timing": "chained_marginal",
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
