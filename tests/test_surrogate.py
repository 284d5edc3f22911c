"""FlowGNNSurrogate (encoder-decoder) tests — reference C7, gnn_model.py:223-291."""

import jax
import jax.numpy as jnp
import numpy as np

from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNNSurrogate, ModelConfig


def test_surrogate_forward(tiny_graph):
    g, adj = tiny_graph
    cfg = ModelConfig(hidden_dim=16, num_layers=4, layer_type="GCN",
                      dropout=0.0, backend="segment")
    model = FlowGNNSurrogate(cfg)
    variables = model.init(jax.random.PRNGKey(0), g, train=False)
    out = model.apply(variables, g, train=False)
    assert out.shape == (g.n_pad, cfg.output_dim)
    assert np.isfinite(np.asarray(out)).all()
    # encoder and decoder each get num_layers // 2 conv blocks
    assert "conv_1" in variables["params"]["encoder"]
    assert "conv_2" not in variables["params"]["encoder"]
    assert "conv_1" in variables["params"]["decoder"]


def test_surrogate_boundary_conditions_shift_output(tiny_graph):
    g, adj = tiny_graph
    cfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GCN",
                      dropout=0.0, backend="segment")
    model = FlowGNNSurrogate(cfg)
    variables = model.init(jax.random.PRNGKey(0), g, train=False)
    out0 = model.apply(variables, g, train=False)
    bc = jnp.ones((g.n_pad, cfg.hidden_dim)) * 0.5
    out1 = model.apply(variables, g, boundary_conditions=bc, train=False)
    # additive BC embedding between encoder and decoder must change output
    assert np.abs(np.asarray(out1) - np.asarray(out0)).max() > 1e-6


def test_surrogate_trains(tiny_graph):
    g, adj = tiny_graph
    cfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GIN",
                      dropout=0.0, backend="dense", use_batch_norm=False)
    model = FlowGNNSurrogate(cfg)
    variables = model.init(jax.random.PRNGKey(0), g, train=False)
    target = jnp.asarray(
        np.random.default_rng(0).normal(size=(g.n_pad, 7)).astype(np.float32)
    ) * 0.1

    def loss_fn(params):
        out = model.apply({"params": params, **{
            k: v for k, v in variables.items() if k != "params"
        }}, g, train=False)
        return jnp.mean((out - target) ** 2)

    params = variables["params"]
    step = jax.jit(
        lambda p: jax.tree.map(lambda q, gr: q - 0.05 * gr, p, jax.grad(loss_fn)(p))
    )
    l0 = float(loss_fn(params))
    for _ in range(100):
        params = step(params)
    l1 = float(loss_fn(params))
    # random per-node targets are mostly irreducible for a 2-layer model;
    # gradient flow through encoder→decoder is what's under test
    assert l1 < l0 - 1e-5
