#!/usr/bin/env python
"""Publish the irreducible multi-snapshot floor as an artifact (VERDICT r2).

The training objective fits ONE deterministic function of geometry to THREE
different steady-state snapshots (t=100/200/282) of the same mesh — the
model input never changes, so no model can fit all three exactly.  The best
achievable prediction under the (convex, per-node) weighted-MSE objective is
the per-node mean of the normalized targets; the loss it attains is the
irreducible floor every accuracy row in BENCHMARKS.md is bounded by
(e.g. "val 0.292 vs 0.227 irreducible floor").

This tool computes that floor exactly from the data and writes
artifacts/multisnapshot_floor.json:

* ``floor_loss``          — weighted_fieldwise_mse of the mean-target
  predictor, averaged over snapshots (the number quoted in BENCHMARKS.md);
* ``per_field_floor``     — per-field error metrics (U: mean L2; scalars:
  MAE — the reference's definitions, train.py:216-238) of the mean-target
  predictor, averaged over snapshots;
* ``vs_282``              — the same metrics against the t=282 snapshot only
  (what `infer --reference_time 282` would report for a floor-optimal model).

Runs on CPU (pure data computation, no model).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# This is a pure data computation and must not depend on the TPU tunnel.
# The image's sitecustomize registers the axon PJRT plugin at interpreter
# start (before this line), so an in-process env override is too late —
# re-exec with a clean environment instead.
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS")
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax.numpy as jnp

    from gnn_bfs_rans_tpu.train import load_dataset
    from gnn_bfs_rans_tpu.train.metrics import compute_field_errors
    from gnn_bfs_rans_tpu.train.normalization import weighted_fieldwise_mse

    ds = load_dataset("/root/reference/OpenFOAM-data")
    targets = jnp.asarray(ds.targets)             # [S, N_pad, 7], normalized
    mask = ds.graph.node_mask
    s = targets.shape[0]

    # the weighted-MSE-optimal constant-in-time prediction per node
    mean_pred = jnp.mean(targets, axis=0)         # [N_pad, 7]

    losses = [
        float(weighted_fieldwise_mse(mean_pred, targets[i], mask,
                                     pressure_ref_weight=0.1))
        for i in range(s)
    ]
    floor_loss = float(np.mean(losses))

    per_field = {}
    for i in range(s):
        errs = compute_field_errors(mean_pred, targets[i], mask)
        for k, v in errs.items():
            per_field.setdefault(k, []).append(float(v))
    per_field_floor = {k: float(np.mean(v)) for k, v in per_field.items()}
    vs_282 = {
        k: float(v)
        for k, v in compute_field_errors(mean_pred, targets[-1], mask).items()
    }

    artifact = {
        "description": "irreducible floor of the 3-snapshot objective: the "
                       "weighted-MSE-optimal deterministic predictor is the "
                       "per-node mean of the normalized targets; no model of "
                       "geometry alone can do better on this dataset",
        "time_dirs": ds.time_dirs,
        "n_snapshots": s,
        "floor_loss": floor_loss,
        "per_snapshot_loss": losses,
        "per_field_floor_normalized": per_field_floor,
        "vs_282_normalized": vs_282,
        "note": "BENCHMARKS.md accuracy rows are bounded below by these "
                "numbers; e.g. the GIN val loss 0.292 sits 29% above "
                "floor_loss",
    }
    out = "artifacts/multisnapshot_floor.json"
    os.makedirs("artifacts", exist_ok=True)
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"floor_loss": floor_loss,
                      "per_field": per_field_floor}, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
