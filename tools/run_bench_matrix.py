#!/usr/bin/env python
"""Regenerate artifacts/bench_matrix.json on the attached TPU.

Runs the forward + train benchmark across the conv zoo and backends at the
flagship width, plus the f32 accuracy-path configuration, with the honest
chained-marginal methodology.  ~15-25 min wall (compiles dominate).

Usage: python tools/run_bench_matrix.py [--out artifacts/bench_matrix.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    # (layer_type, backend, compute_dtype, mode, num_layers)
    *[(lt, be, "bfloat16", "forward", 4)
      for lt in ("GCN", "GAT", "GIN", "Transformer")
      for be in ("pallas", "dense")],
    *[(lt, "pallas", "bfloat16", "train", 4)
      for lt in ("GCN", "GAT", "GIN", "Transformer")],
    ("GAT", "pallas", "float32", "forward", 4),
    ("GAT", "dense", "float32", "forward", 4),
    ("GAT", "segment", "float32", "forward", 4),
    # BASELINE config 4: Graph-Transformer, deeper stack (8 layers) at the
    # flagship width — the one config without a perf row at its stated
    # depth (VERDICT r3 item 3)
    ("Transformer", "pallas", "bfloat16", "forward", 8),
    ("Transformer", "pallas", "bfloat16", "train", 8),
    # round 5: the mixed-dtype path (bf16 convs/MLP, f32 residual stream) —
    # the config that is simultaneously the fast and the accurate one
    ("GAT", "pallas", "mixed", "forward", 4),
    ("GAT", "pallas", "mixed", "train", 4),
    ("GAT", "pallas", "mixed", "forward", 6),
    ("GAT", "pallas", "mixed", "train", 6),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/bench_matrix.json")
    args = ap.parse_args()

    from gnn_bfs_rans_tpu.utils.bench import run_benchmark
    from gnn_bfs_rans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    results = []
    for layer_type, backend, dtype, mode, n_layers in CONFIGS:
        r = run_benchmark(
            case_path="/root/reference/OpenFOAM-data",
            layer_type=layer_type,
            num_layers=n_layers,
            hidden_dim=256,
            backend=backend,
            compute_dtype=dtype,
            mode=mode,
        )
        results.append(r)
        mfu = r.get("mfu")
        print(f"{mode:7s} {layer_type:12s}x{n_layers} {backend:7s} {dtype:8s} "
              f"{r['step_median_s']*1e3:8.2f} ms  "
              f"{r['value']:.3e} msgs/s  "
              f"mfu={mfu:.3f} {r.get('bound')}" if mfu else
              f"{mode:7s} {layer_type:12s}x{n_layers} {backend:7s} {dtype:8s} "
              f"{r['step_median_s']*1e3:8.2f} ms  {r['value']:.3e} msgs/s",
              flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out} ({len(results)} rows)")


if __name__ == "__main__":
    main()
