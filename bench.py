#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line with the headline metric.

Metric: edge-messages/sec/chip for a 4-layer GAT forward on the BFS mesh
(48,340-edge graph), vs the BASELINE.json north-star target of 1e8.
Runs on whatever accelerator jax selects (TPU under axon; CPU otherwise).
"""

import json
import sys


def main() -> int:
    from gnn_bfs_rans_tpu.utils.bench import run_benchmark

    result = run_benchmark(
        case_path="/root/reference/OpenFOAM-data",
        layer_type="GAT",
        num_layers=4,
        hidden_dim=256,
        backend="dense",
        steps=50,
        mode="forward",
    )
    line = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
        "detail": {
            k: result[k]
            for k in (
                "mode", "layer_type", "num_layers", "hidden_dim", "backend",
                "n_edges", "step_median_s", "steps_per_sec", "platform",
            )
        },
    }
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
