#!/usr/bin/env python
"""Generate the torch-prediction-parity artifact (BASELINE north-star row).

For each conv type (GCN/GAT/GIN/Transformer, plus the edge-conditioned
Transformer) this runs the full round trip on the real BFS mesh:

  pure-torch reference FlowGNN (compat.torch_ref — PyG semantics)
    → genuine reference-format .pt checkpoint (train.py:453-460 layout)
    → compat.torch_port.load_torch_checkpoint
    → JAX FlowGNN forward (segment backend)
    → denormalized-field comparison

and records max-abs / max-rel deviations per field into
artifacts/torch_parity.json.  The same loop is pinned by
tests/test_parity_torch.py; this tool publishes the measured numbers.

Usage: python tools/run_torch_parity.py [--hidden 64] [--layers 3]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Parity math is backend-independent; run on CPU so the tool never depends
# on the TPU tunnel.  The image's sitecustomize registers the axon PJRT
# plugin at interpreter start, so re-exec with a clean environment.
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS")
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import torch

REFERENCE_CASE = "/root/reference/OpenFOAM-data"
FIELDS = ("U", "p", "k", "epsilon", "nut")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--out", default="artifacts/torch_parity.json")
    args = ap.parse_args()

    from gnn_bfs_rans_tpu.compat.torch_port import load_torch_checkpoint
    from gnn_bfs_rans_tpu.compat.torch_ref import RefFlowGNN
    from gnn_bfs_rans_tpu.foam import FoamCase
    from gnn_bfs_rans_tpu.graph import build_graph
    from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, split_fields
    from gnn_bfs_rans_tpu.train.normalization import FieldNormalizer

    case = FoamCase(REFERENCE_CASE)
    mesh = case.load_mesh()
    g = build_graph(mesh, reorder="none")
    n, ne = g.n_nodes, g.n_edges
    x = np.asarray(g.node_feat)[:n].astype(np.float32)
    src = np.asarray(g.senders)[:ne].astype(np.int64)
    dst = np.asarray(g.receivers)[:ne].astype(np.int64)
    ef = np.asarray(g.edge_feat)[:ne].astype(np.float32)
    norm = FieldNormalizer().fit(case.load_fields("282"))

    xt, ei, ea = (torch.from_numpy(x),
                  torch.from_numpy(np.stack([src, dst])),
                  torch.from_numpy(ef))

    results = {}
    variants = [(lt, None) for lt in ("GCN", "GAT", "GIN", "Transformer")]
    variants.append(("Transformer", 4))
    for layer_type, edge_dim in variants:
        torch.manual_seed(0)
        tm = RefFlowGNN(
            input_dim=3, hidden_dim=args.hidden, output_dim=7,
            num_layers=args.layers, layer_type=layer_type, dropout=0.1,
            edge_dim=edge_dim,
        )
        tm.train()
        with torch.no_grad():
            for _ in range(3):
                tm(xt, ei, ea)
        tm.eval()
        with torch.no_grad():
            ref_out = tm(xt, ei, ea).numpy()
        path = f"/tmp/parity_{layer_type}_{edge_dim}.pt"
        torch.save(
            {
                "epoch": 100, "model_state_dict": tm.state_dict(),
                "optimizer_state_dict": {}, "val_loss": 0.123,
                "config": {"hidden_dim": args.hidden, "num_layers": args.layers,
                           "layer_type": layer_type, "dropout": 0.1},
                "normalizer": {"field_stats": norm.field_stats,
                               "scalers": norm.scalers},
            },
            path,
        )
        params, batch_stats, cfg, norm2 = load_torch_checkpoint(path)
        model = FlowGNN(dataclasses.replace(cfg, backend="segment"))
        out = np.asarray(model.apply(
            {"params": params, "batch_stats": batch_stats}, g, train=False
        ))[:n]
        ours = norm2.inverse_transform(
            {k: np.asarray(v) for k, v in split_fields(out).items()})
        import jax.numpy as jnp
        theirs = norm2.inverse_transform(
            {k: np.asarray(v) for k, v in split_fields(jnp.asarray(ref_out)).items()})
        name = layer_type + ("_edge" if edge_dim else "")
        per_field = {}
        for f in FIELDS:
            d = np.abs(ours[f] - theirs[f])
            scale = float(np.abs(theirs[f]).max()) + 1e-12
            std_f = float(np.max(np.asarray(
                norm2.scalers.get(f, {"std": 1.0})["std"])))
            per_field[f] = {
                "max_abs": float(d.max()),
                "max_rel_vs_field_max": float(d.max() / scale),
                # the contract metric: denormalization scales normalized-space
                # deviation by std_f, so this is the float-agreement measure
                "max_rel_vs_scale_plus_std": float(d.max() / (scale + std_f)),
            }
        results[name] = per_field
        worst = max(v["max_rel_vs_scale_plus_std"] for v in per_field.values())
        print(f"{name:18s} worst rel dev {worst:.3e}", flush=True)

    artifact = {
        "description": "denormalized-prediction parity: JAX model vs a REAL "
                       "torch forward of the reference architecture on the "
                       "BFS mesh, weights round-tripped through a genuine "
                       "reference-format .pt checkpoint",
        "graph": {"n_nodes": n, "n_edges": ne},
        "hidden_dim": args.hidden, "num_layers": args.layers,
        "tolerance_contract": "tests/test_parity_torch.py: rtol 1e-3, "
                              "atol 1e-3 * (max|field| + normalizer std)",
        "max_deviations": results,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
