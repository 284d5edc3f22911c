#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line with the headline metric.

Metric: edge-messages/sec/chip for a 4-layer GAT forward on the BFS mesh
(48,340-edge graph) with the fused banded Pallas attention kernels in
bfloat16, vs the BASELINE.json north-star target of 1e8.  Timed as chained
marginal device latency (see utils/bench.py) — queue-depth-honest, with
round-4 defenses: full-output consumption in the chain, automatic reps
widening until signal ≫ jitter, an analytic-FLOPs roofline guard that
rejects physically impossible numbers, and a steady-state dispatch
cross-check (both timings are in the JSON, along with MFU).
Runs on whatever accelerator jax selects (TPU under axon; CPU otherwise).
"""

import json
import sys


def main() -> int:
    from gnn_bfs_rans_tpu.utils.bench import run_benchmark
    from gnn_bfs_rans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    result = run_benchmark(
        case_path="/root/reference/OpenFOAM-data",
        layer_type="GAT",
        num_layers=4,
        hidden_dim=256,
        backend="pallas",
        compute_dtype="bfloat16",
        mode="forward",
    )
    line = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
        "mfu": result["mfu"],
        "detail": {
            k: result[k]
            for k in (
                "mode", "layer_type", "num_layers", "hidden_dim", "backend",
                "compute_dtype", "n_edges", "step_median_s", "step_steady_s",
                "steps_per_sec", "platform", "timing", "timing_detail",
                "cross_check", "matmul_flops", "mfu", "bound",
                "bytes_basis", "hbm_bytes_xla", "hbm_bytes_est", "hbm_frac",
                "roofline_min_s",
            )
        },
    }
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
