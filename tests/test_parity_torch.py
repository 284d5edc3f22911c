"""REAL-torch prediction parity on the BFS mesh (the BASELINE north-star row).

BASELINE.md requires reproducing the reference model's denormalized
predictions within float tolerance given its weights.  torch_geometric is not
installed here, so ``tests/torch_ref.py`` re-implements the PyG conv
semantics the reference uses (``/root/reference/gnn_model.py:62-84``) in pure
torch; this file then runs the FULL loop on the real 12,225-cell BFS graph
for all four conv types:

1. build the reference architecture in torch, populate BatchNorm running
   stats with real train-mode forwards over the actual cell-center inputs;
2. ``torch.save`` a GENUINE reference-format checkpoint
   (``train.py:453-460``: epoch / model_state_dict / optimizer_state_dict /
   val_loss / config / normalizer) — the normalizer fitted on the real
   t=282 OpenFOAM fields;
3. port via ``compat.torch_port.load_torch_checkpoint``;
4. assert the JAX model's DENORMALIZED fields match the torch model's within
   float tolerance.

These tests fail if any convention drifts: GCN D̂^-1/2 self-loop
normalization, GAT LeakyReLU-0.2 + self-loop + head-mean, GIN (1+eps)
aggregation, Transformer root weight / scaled dot-product / edge_dim
conditioning, BatchNorm running-stats usage, output-MLP indices, or the
weight-transpose mapping.
"""

import dataclasses

import numpy as np
import pytest
import torch

from gnn_bfs_rans_tpu.compat.torch_ref import RefFlowGNN

from gnn_bfs_rans_tpu.compat.torch_port import load_torch_checkpoint
from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig, split_fields
from gnn_bfs_rans_tpu.train.normalization import FieldNormalizer

FIELDS = ("U", "p", "k", "epsilon", "nut")
HIDDEN, LAYERS = 64, 3


@pytest.fixture(scope="module")
def bfs_setup(bfs_case, bfs_mesh):
    """Unpermuted BFS graph + raw arrays + a normalizer fitted on real data."""
    from gnn_bfs_rans_tpu.graph import build_graph

    g = build_graph(bfs_mesh, reorder="none")
    n, ne = g.n_nodes, g.n_edges
    arrays = {
        "x": np.asarray(g.node_feat)[:n].astype(np.float32),
        "src": np.asarray(g.senders)[:ne].astype(np.int64),
        "dst": np.asarray(g.receivers)[:ne].astype(np.int64),
        "edge_feat": np.asarray(g.edge_feat)[:ne].astype(np.float32),
    }
    fields = bfs_case.load_fields("282")
    norm = FieldNormalizer().fit(fields)
    return g, arrays, norm


def _torch_forward_and_checkpoint(layer_type, arrays, norm, path, edge_dim=None):
    """Init the torch reference model, warm BN stats, eval-forward, save .pt."""
    torch.manual_seed(0)
    tm = RefFlowGNN(
        input_dim=3, hidden_dim=HIDDEN, output_dim=7, num_layers=LAYERS,
        layer_type=layer_type, dropout=0.1, edge_dim=edge_dim,
    )
    xt = torch.from_numpy(arrays["x"])
    ei = torch.from_numpy(np.stack([arrays["src"], arrays["dst"]]))
    ea = torch.from_numpy(arrays["edge_feat"])
    tm.train()
    with torch.no_grad():  # warm the BN running stats on real activations
        for _ in range(3):
            tm(xt, ei, ea)
    tm.eval()
    with torch.no_grad():
        ref_out = tm(xt, ei, ea).numpy()
    # the exact dict layout the reference's training loop saves
    # (/root/reference/train.py:453-461)
    torch.save(
        {
            "epoch": 100,
            "model_state_dict": tm.state_dict(),
            "optimizer_state_dict": {},
            "val_loss": 0.123,
            "config": {
                "hidden_dim": HIDDEN,
                "num_layers": LAYERS,
                "layer_type": layer_type,
                "dropout": 0.1,
                "lr": 3e-4,
            },
            "normalizer": {
                "field_stats": norm.field_stats,
                "scalers": norm.scalers,
            },
        },
        path,
    )
    return ref_out


def _assert_denormalized_parity(g, ref_out, path, expect_edge_attr):
    params, batch_stats, cfg, norm = load_torch_checkpoint(str(path))
    assert cfg.hidden_dim == HIDDEN and cfg.num_layers == LAYERS
    assert cfg.heads == 4
    assert cfg.use_edge_attr is expect_edge_attr
    assert norm is not None

    model = FlowGNN(dataclasses.replace(cfg, backend="segment"))
    out = np.asarray(
        model.apply({"params": params, "batch_stats": batch_stats}, g, train=False)
    )[: g.n_nodes]

    # normalized-space agreement first (pure model parity)
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=5e-4)

    # then the full denormalized-field contract (what BASELINE.md names).
    # Denormalization maps dev_norm → std_f · dev_norm, so the absolute
    # tolerance must include the normalizer's std (for p on this case std
    # (7.0) exceeds the field's own max (≈0.5) — a max-relative bound alone
    # would demand better-than-f32 agreement).
    ours = norm.inverse_transform(
        {k: np.asarray(v) for k, v in split_fields(out).items()}
    )
    import jax.numpy as jnp

    theirs = norm.inverse_transform(
        {k: np.asarray(v) for k, v in split_fields(jnp.asarray(ref_out)).items()}
    )
    for f in FIELDS:
        s = norm.scalers.get(f, {"std": 1.0})["std"]
        std_f = float(np.max(np.asarray(s)))
        scale = float(np.abs(theirs[f]).max()) + 1e-12
        np.testing.assert_allclose(
            ours[f], theirs[f], rtol=1e-3,
            atol=1e-3 * scale + 1e-3 * std_f,
            err_msg=f"denormalized field {f} diverges from the torch reference",
        )


@pytest.mark.parametrize("layer_type", ["GCN", "GAT", "GIN", "Transformer"])
def test_real_torch_checkpoint_parity(layer_type, bfs_setup, tmp_path):
    """Reference-config parity: the exact convs the reference instantiates
    (Transformer WITHOUT edge_dim — SURVEY.md §2 quirk 3)."""
    g, arrays, norm = bfs_setup
    path = tmp_path / "best_model.pt"
    ref_out = _torch_forward_and_checkpoint(layer_type, arrays, norm, path)
    _assert_denormalized_parity(g, ref_out, path, expect_edge_attr=False)


def test_real_torch_parity_transformer_edge_conditioned(bfs_setup, tmp_path):
    """TransformerConv WITH edge_dim (lin_edge added to keys and values) —
    pins our first-class edge-feature path against PyG semantics."""
    g, arrays, norm = bfs_setup
    path = tmp_path / "best_model.pt"
    ref_out = _torch_forward_and_checkpoint(
        "Transformer", arrays, norm, path, edge_dim=4
    )
    _assert_denormalized_parity(g, ref_out, path, expect_edge_attr=True)
