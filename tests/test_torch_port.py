"""Torch-checkpoint porting tests.

torch_geometric isn't installed, so a *synthetic* checkpoint is built with
the reference's exact state-dict naming (``gnn_model.py``: ``input_proj``,
``gnn_layers.{i}``, ``batch_norms.{i}.module``, ``output_proj.{0,3,6,8}``)
and random weights; the ported flax model's eval-mode forward is then checked
against an independent dense numpy implementation of the reference
architecture.  This validates every mapping (transposes, BN running stats,
MLP indices) end to end.
"""

import numpy as np
import pytest
import torch

from gnn_bfs_rans_tpu.compat import convert_state_dict, load_torch_checkpoint
from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig


def _rand(shape, rng):
    return torch.tensor(rng.normal(size=shape, scale=0.3).astype(np.float32))


def _make_state_dict(rng, layer_type, hidden, layers, in_dim=3, out_dim=7, heads=4):
    sd = {}
    sd["input_proj.weight"] = _rand((hidden, in_dim), rng)
    sd["input_proj.bias"] = _rand((hidden,), rng)
    for i in range(layers):
        p = f"gnn_layers.{i}."
        if layer_type == "GCN":
            sd[p + "lin.weight"] = _rand((hidden, hidden), rng)
            sd[p + "bias"] = _rand((hidden,), rng)
        elif layer_type == "GAT":
            sd[p + "lin.weight"] = _rand((heads * hidden, hidden), rng)
            sd[p + "att_src"] = _rand((1, heads, hidden), rng)
            sd[p + "att_dst"] = _rand((1, heads, hidden), rng)
            sd[p + "bias"] = _rand((hidden,), rng)
        elif layer_type == "GIN":
            sd[p + "nn.0.weight"] = _rand((hidden, hidden), rng)
            sd[p + "nn.0.bias"] = _rand((hidden, ), rng)
            sd[p + "nn.2.weight"] = _rand((hidden, hidden), rng)
            sd[p + "nn.2.bias"] = _rand((hidden,), rng)
        elif layer_type == "Transformer":
            # PyG TransformerConv(H, H, heads, concat=False, edge_dim=4):
            # lin_query/key/value: [heads*H, H] + bias; lin_skip: [H, H] +
            # bias (concat=False root weight); lin_edge: [heads*H, 4] no bias
            for lin in ("lin_query", "lin_key", "lin_value"):
                sd[p + lin + ".weight"] = _rand((heads * hidden, hidden), rng)
                sd[p + lin + ".bias"] = _rand((heads * hidden,), rng)
            sd[p + "lin_skip.weight"] = _rand((hidden, hidden), rng)
            sd[p + "lin_skip.bias"] = _rand((hidden,), rng)
            sd[p + "lin_edge.weight"] = _rand((heads * hidden, 4), rng)
        b = f"batch_norms.{i}.module."
        sd[b + "weight"] = _rand((hidden,), rng) * 0.1 + 1.0
        sd[b + "bias"] = _rand((hidden,), rng)
        sd[b + "running_mean"] = _rand((hidden,), rng)
        sd[b + "running_var"] = torch.abs(_rand((hidden,), rng)) + 0.5
    dims = [(hidden, hidden, 0), (hidden, hidden, 3), (hidden // 2, hidden, 6),
            (out_dim, hidden // 2, 8)]
    for out_d, in_d, idx in dims:
        sd[f"output_proj.{idx}.weight"] = _rand((out_d, in_d), rng)
        sd[f"output_proj.{idx}.bias"] = _rand((out_d,), rng)
    return sd


def _numpy_forward(sd, adj, x, layer_type, layers, heads=4, edges=None):
    """Dense numpy implementation of the reference FlowGNN in eval mode.

    ``edges`` = (senders, receivers, edge_feat) — required for the
    Transformer branch, which conditions keys/values on edge features
    (scaled dot-product over incoming edges, no self-loop, mean over heads,
    lin_skip root weight; PyG TransformerConv semantics,
    reference ``gnn_model.py:77-80``).
    """
    def lin(prefix, v):
        W = sd[prefix + ".weight"].numpy()
        b = sd[prefix + ".bias"].numpy()
        return v @ W.T + b

    n = adj.shape[0]
    h = lin("input_proj", x)
    for i in range(layers):
        p = f"gnn_layers.{i}"
        if layer_type == "GCN":
            W = sd[p + ".lin.weight"].numpy()
            a_hat = adj + np.eye(n)
            d = a_hat.sum(1)
            inv = 1 / np.sqrt(d)
            norm = inv[:, None] * a_hat * inv[None, :]
            h_new = norm @ (h @ W.T) + sd[p + ".bias"].numpy()
        elif layer_type == "GAT":
            W = sd[p + ".lin.weight"].numpy()
            a_s = sd[p + ".att_src"].numpy()[0]
            a_d = sd[p + ".att_dst"].numpy()[0]
            H, C = a_s.shape
            z = (h @ W.T).reshape(n, H, C)
            als = np.einsum("nhc,hc->nh", z, a_s)
            ald = np.einsum("nhc,hc->nh", z, a_d)
            a_hat = adj.astype(bool) | np.eye(n, dtype=bool)
            out = np.zeros((n, H, C))
            for ii in range(n):
                nbrs = np.nonzero(a_hat[ii])[0]
                logits = als[nbrs] + ald[ii]
                logits = np.where(logits > 0, logits, 0.2 * logits)
                e = np.exp(logits - logits.max(0))
                attn = e / e.sum(0)
                out[ii] = np.einsum("kh,khc->hc", attn, z[nbrs])
            h_new = out.mean(1) + sd[p + ".bias"].numpy()
        elif layer_type == "GIN":
            agg = adj @ h
            t = h + agg
            t = np.maximum(t @ sd[p + ".nn.0.weight"].numpy().T
                           + sd[p + ".nn.0.bias"].numpy(), 0)
            h_new = t @ sd[p + ".nn.2.weight"].numpy().T + sd[p + ".nn.2.bias"].numpy()
        elif layer_type == "Transformer":
            src, dst, efeat = edges
            hid = h.shape[1]
            C = hid  # out_channels = hidden (concat=False)

            def proj(name, bias=True):
                W = sd[p + "." + name + ".weight"].numpy()
                out = h @ W.T
                if bias:
                    out = out + sd[p + "." + name + ".bias"].numpy()
                return out.reshape(n, heads, C)

            q = proj("lin_query")
            k = proj("lin_key")
            v = proj("lin_value")
            We = sd[p + ".lin_edge.weight"].numpy()
            e = (efeat @ We.T).reshape(len(src), heads, C)
            k_e = k[src] + e            # [E, H, C]
            v_e = v[src] + e
            out = np.zeros((n, heads, C))
            for ii in range(n):
                inc = np.nonzero(dst == ii)[0]
                if inc.size == 0:
                    continue
                logits = np.einsum(
                    "hc,khc->kh", q[ii], k_e[inc]
                ) / np.sqrt(C)
                ex = np.exp(logits - logits.max(0))
                attn = ex / ex.sum(0)
                out[ii] = np.einsum("kh,khc->hc", attn, v_e[inc])
            skip = (h @ sd[p + ".lin_skip.weight"].numpy().T
                    + sd[p + ".lin_skip.bias"].numpy())
            h_new = out.mean(1) + skip
        h = h + h_new
        b = f"batch_norms.{i}.module."
        mean = sd[b + "running_mean"].numpy()
        var = sd[b + "running_var"].numpy()
        h = (h - mean) / np.sqrt(var + 1e-5)
        h = h * sd[b + "weight"].numpy() + sd[b + "bias"].numpy()
        h = np.maximum(h, 0)
    h = np.maximum(lin("output_proj.0", h), 0)
    h = np.maximum(lin("output_proj.3", h), 0)
    h = np.maximum(lin("output_proj.6", h), 0)
    return lin("output_proj.8", h)


@pytest.mark.parametrize("layer_type", ["GCN", "GAT", "GIN", "Transformer"])
def test_ported_model_matches_reference_math(tiny_graph, layer_type):
    g, adj = tiny_graph
    n = adj.shape[0]
    rng = np.random.default_rng(0)
    hidden, layers = 16, 2
    sd = _make_state_dict(rng, layer_type, hidden, layers)
    cfg = ModelConfig(
        input_dim=3, hidden_dim=hidden, num_layers=layers,
        layer_type=layer_type, dropout=0.0, backend="segment",
    )
    params, batch_stats = convert_state_dict(
        {k: v.numpy() for k, v in sd.items()}, cfg
    )
    model = FlowGNN(cfg)
    out = model.apply(
        {"params": params, "batch_stats": batch_stats}, g, train=False
    )
    x = np.asarray(g.node_feat)[:n]
    ne = g.n_edges
    edges = (
        np.asarray(g.senders)[:ne],
        np.asarray(g.receivers)[:ne],
        np.asarray(g.edge_feat)[:ne].astype(np.float64),
    )
    expected = _numpy_forward(
        sd, adj.astype(np.float64), x, layer_type, layers, edges=edges
    )
    np.testing.assert_allclose(
        np.asarray(out)[:n], expected, rtol=1e-3, atol=1e-4
    )


def test_full_checkpoint_round_trip(tmp_path, tiny_graph):
    """torch.save a reference-format checkpoint → load_torch_checkpoint."""
    g, adj = tiny_graph
    rng = np.random.default_rng(1)
    sd = _make_state_dict(rng, "GCN", 16, 2)
    ckpt = {
        "epoch": 42,
        "model_state_dict": sd,
        "optimizer_state_dict": {},
        "val_loss": 0.5,
        "config": {"hidden_dim": 16, "num_layers": 2, "layer_type": "GCN"},
        "normalizer": {
            "field_stats": {"p": {"mean": 1.0, "std": 2.0}},
            "scalers": {
                "p": {"mean": 1.0, "std": 2.0, "per_component": False},
                "U": {
                    "mean": np.zeros(3), "std": np.ones(3), "per_component": True
                },
            },
        },
    }
    path = tmp_path / "best_model.pt"
    torch.save(ckpt, path)
    params, batch_stats, cfg, norm = load_torch_checkpoint(str(path))
    assert cfg.hidden_dim == 16 and cfg.layer_type == "GCN"
    assert norm is not None
    out = norm.transform({"p": np.array([3.0])})
    np.testing.assert_allclose(out["p"], [1.0])
    model = FlowGNN(cfg)
    pred = model.apply(
        {"params": params, "batch_stats": batch_stats}, g, train=False
    )
    assert np.isfinite(np.asarray(pred)).all()


class TestExport:
    """export_state_dict / save_torch_checkpoint — the inverse mapping."""

    @pytest.mark.parametrize("layer_type", ["GCN", "GAT", "GIN", "Transformer"])
    def test_export_import_round_trip(self, tiny_graph, layer_type):
        """flax params → reference state dict → flax params is the identity."""
        import jax

        from gnn_bfs_rans_tpu.compat.torch_port import export_state_dict

        g, _ = tiny_graph
        cfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type=layer_type,
                          dropout=0.0, use_edge_attr=True)
        model = FlowGNN(cfg)
        variables = model.init(jax.random.PRNGKey(3), g, train=False)
        params = jax.tree.map(np.asarray, variables["params"])
        batch_stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))

        sd = export_state_dict(params, batch_stats, cfg)
        params2, batch_stats2 = convert_state_dict(sd, cfg)

        flat1 = dict(jax.tree_util.tree_flatten_with_path(params)[0])
        flat2 = dict(jax.tree_util.tree_flatten_with_path(params2)[0])
        assert flat1.keys() == flat2.keys()
        for k in flat1:
            np.testing.assert_allclose(flat1[k], flat2[k], rtol=1e-6, err_msg=str(k))
        for k, v in jax.tree_util.tree_flatten_with_path(batch_stats)[0]:
            np.testing.assert_allclose(
                v, dict(jax.tree_util.tree_flatten_with_path(batch_stats2)[0])[k],
                rtol=1e-6,
            )

    def test_exported_names_match_reference_schema(self, tiny_graph):
        """Exported keys are exactly the reference's state-dict names (the
        contract that makes the .pt loadable by the reference model)."""
        import jax

        from gnn_bfs_rans_tpu.compat.torch_port import export_state_dict

        g, _ = tiny_graph
        cfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GAT",
                          dropout=0.0)
        model = FlowGNN(cfg)
        variables = model.init(jax.random.PRNGKey(3), g, train=False)
        sd = export_state_dict(variables["params"],
                               variables.get("batch_stats", {}), cfg)
        rng = np.random.default_rng(0)
        ref_sd = _make_state_dict(rng, "GAT", 16, 2)
        ref_keys = set(ref_sd) | {
            f"batch_norms.{i}.module.num_batches_tracked" for i in range(2)
        }
        assert set(sd) == ref_keys

    def test_save_load_pt_round_trip(self, tiny_graph, tmp_path):
        """save_torch_checkpoint → load_torch_checkpoint → same forward."""
        import jax

        from gnn_bfs_rans_tpu.compat.torch_port import save_torch_checkpoint
        from gnn_bfs_rans_tpu.train.normalization import FieldNormalizer

        g, _ = tiny_graph
        cfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GCN",
                          dropout=0.0)
        model = FlowGNN(cfg)
        variables = model.init(jax.random.PRNGKey(5), g, train=False)
        norm = FieldNormalizer().fit({
            "p": np.array([1.0, 3.0, 5.0]),
            "U": np.array([[1.0, 0.0, 0.0], [0.0, 2.0, 0.0]]),
        })
        path = tmp_path / "exported.pt"
        save_torch_checkpoint(
            str(path), variables["params"], variables.get("batch_stats", {}),
            cfg, normalizer=norm, epoch=7, val_loss=0.25,
        )
        params, batch_stats, cfg2, norm2 = load_torch_checkpoint(str(path))
        assert cfg2.hidden_dim == 16 and cfg2.layer_type == "GCN"
        np.testing.assert_allclose(
            norm2.scalers["p"]["mean"], norm.scalers["p"]["mean"]
        )
        out1 = model.apply(variables, g, train=False)
        out2 = model.apply(
            {"params": params, "batch_stats": batch_stats}, g, train=False
        )
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   rtol=1e-5, atol=1e-6)
        # reference loader contract: the dict has the reference's keys
        raw = torch.load(path, map_location="cpu", weights_only=False)
        assert set(raw) == {"epoch", "model_state_dict",
                            "optimizer_state_dict", "val_loss", "config",
                            "normalizer"}
        assert raw["epoch"] == 7
