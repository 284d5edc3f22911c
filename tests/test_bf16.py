"""bfloat16 compute-path tests: outputs close to float32, params stay f32."""

import jax
import numpy as np
import pytest

from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig


@pytest.mark.parametrize("layer_type", ["GCN", "GAT", "Transformer"])
def test_bf16_forward_close_to_f32(tiny_graph, layer_type):
    g, adj = tiny_graph
    cfg32 = ModelConfig(hidden_dim=32, num_layers=2, layer_type=layer_type,
                        dropout=0.0, backend="dense")
    cfg16 = ModelConfig(hidden_dim=32, num_layers=2, layer_type=layer_type,
                        dropout=0.0, backend="dense",
                        compute_dtype="bfloat16")
    model32, model16 = FlowGNN(cfg32), FlowGNN(cfg16)
    variables = model32.init(jax.random.PRNGKey(0), g, train=False)
    # params are f32 in both configs → shared
    for leaf in jax.tree.leaves(variables["params"]):
        assert leaf.dtype == np.float32
    out32 = np.asarray(model32.apply(variables, g, train=False))
    out16 = np.asarray(model16.apply(variables, g, train=False))
    assert out16.dtype == np.float32  # head emits f32
    # bf16 has ~3 decimal digits; activations go through 2 convs + 4 MLPs
    err = np.abs(out32 - out16).max() / (np.abs(out32).max() + 1e-6)
    assert err < 0.05, err


def test_bf16_batchnorm_high_mean_channels():
    """bf16 BN must stay accurate for channels with |mean| >> std.

    The folded x·a + (b − m·a) form cancels two large bf16 products; the
    centered (x − m̃)·a + b̃ form keeps the error proportional to the
    normalized output (ADVICE r1, models/norm.py).  Tolerance here bounds
    the regression explicitly: error vs the f32 path must stay within a few
    bf16 ulps of the O(1) normalized output, even at mean/std = 1e4.
    """
    import jax.numpy as jnp

    from gnn_bfs_rans_tpu.models.norm import MaskedBatchNorm

    rng = np.random.default_rng(0)
    n, feat = 256, 32
    # mean/std up to 1e3: the folded form drifts by ~0.4 std here (ulp of
    # the large x·a product), while beyond ~1e3 the bf16 INPUT quantization
    # itself dominates and no normalization scheme can recover the channel
    means = np.geomspace(1.0, 1e3, feat)
    x32 = (rng.normal(size=(n, feat)) + means).astype(np.float32)
    mask = jnp.ones((n,), jnp.float32)

    bn = MaskedBatchNorm(features=feat)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x32), mask,
                        use_running_average=False)
    # seed running stats with the true batch stats so eval mode (the folded
    # fast path) normalizes with a genuinely large mean
    stats = {
        "mean": jnp.asarray(x32.mean(0)),
        "var": jnp.asarray(x32.var(0, ddof=1)),
    }
    variables = {"params": variables["params"], "batch_stats": stats}

    out32 = np.asarray(
        bn.apply(variables, jnp.asarray(x32), mask, use_running_average=True)
    )
    out16 = np.asarray(
        bn.apply(variables, jnp.asarray(x32, jnp.bfloat16), mask,
                 use_running_average=True),
        dtype=np.float32,
    )
    # normalized outputs are O(1); bf16 input quantization alone contributes
    # mean·2⁻⁹/std ≈ unavoidable error, so compare against the f32 path run
    # on the SAME bf16-quantized input to isolate the normalization error
    x16_as32 = np.asarray(jnp.asarray(x32, jnp.bfloat16), dtype=np.float32)
    ref = np.asarray(
        bn.apply(variables, jnp.asarray(x16_as32), mask,
                 use_running_average=True)
    )
    err = np.abs(out16 - ref).max()
    # flat across channels at ~0.02 (bf16 product rounding on the O(1)
    # output); the folded form fails this at ~0.4 on the mean=1e3 channels
    assert err < 0.03, err


def test_bf16_trains(tiny_graph):
    import jax.numpy as jnp

    from gnn_bfs_rans_tpu.train import TrainConfig
    from gnn_bfs_rans_tpu.train.loop import init_state, make_train_step

    g, adj = tiny_graph
    cfg = ModelConfig(hidden_dim=32, num_layers=2, layer_type="GCN",
                      dropout=0.0, backend="dense", compute_dtype="bfloat16")
    tcfg = TrainConfig(lr=3e-3)
    model = FlowGNN(cfg)
    state = init_state(model, g, tcfg, jax.random.PRNGKey(0))
    step = make_train_step(model, tcfg)
    rng = np.random.default_rng(0)
    targets = jnp.asarray(
        rng.normal(size=(2, g.n_pad, 7)).astype(np.float32) * 0.1
    )
    losses = []
    for i in range(25):
        state, loss = step(state, g, targets, jnp.asarray(3e-3, jnp.float32),
                           jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("layer_type", ["GCN", "GAT"])
def test_mixed_forward_closer_to_f32_than_bf16(tiny_graph, layer_type):
    """compute_dtype='mixed' (bf16 convs/MLP, f32 residual stream + BN):
    output must be at least as close to the f32 reference as the pure-bf16
    forward, and params stay f32 (round-5 accuracy design)."""
    g, adj = tiny_graph
    mk = lambda dt: ModelConfig(hidden_dim=32, num_layers=2,  # noqa: E731
                                layer_type=layer_type, dropout=0.0,
                                backend="dense", compute_dtype=dt)
    m32, m16, mmx = (FlowGNN(mk(d)) for d in ("float32", "bfloat16", "mixed"))
    variables = m32.init(jax.random.PRNGKey(0), g, train=False)
    for leaf in jax.tree.leaves(variables["params"]):
        assert leaf.dtype == np.float32
    out32 = np.asarray(m32.apply(variables, g, train=False))
    out16 = np.asarray(m16.apply(variables, g, train=False))
    outmx = np.asarray(mmx.apply(variables, g, train=False))
    assert outmx.dtype == np.float32
    err16 = np.abs(out32 - out16).max()
    errmx = np.abs(out32 - outmx).max()
    assert errmx <= err16 * 1.05, (errmx, err16)
    assert errmx < 0.05 * (np.abs(out32).max() + 1e-6)


def test_mixed_trains(tiny_graph):
    import jax.numpy as jnp

    from gnn_bfs_rans_tpu.train import TrainConfig
    from gnn_bfs_rans_tpu.train.loop import init_state, make_train_step

    g, adj = tiny_graph
    cfg = ModelConfig(hidden_dim=32, num_layers=2, layer_type="GCN",
                      dropout=0.0, backend="dense", compute_dtype="mixed")
    tcfg = TrainConfig(lr=3e-3)
    model = FlowGNN(cfg)
    state = init_state(model, g, tcfg, jax.random.PRNGKey(0))
    step = make_train_step(model, tcfg)
    rng = np.random.default_rng(0)
    targets = jnp.asarray(
        rng.normal(size=(2, g.n_pad, 7)).astype(np.float32) * 0.1
    )
    losses = []
    for i in range(25):
        state, loss = step(state, g, targets, jnp.asarray(3e-3, jnp.float32),
                           jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_layer_norm_variant(tiny_graph):
    """norm_type='layer': train/eval identical, trains, partition-safe."""
    import jax.numpy as jnp

    g, adj = tiny_graph
    cfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GCN",
                      dropout=0.0, backend="dense", norm_type="layer")
    model = FlowGNN(cfg)
    variables = model.init(jax.random.PRNGKey(0), g, train=False)
    assert "batch_stats" not in variables  # no running statistics
    out_eval = model.apply(variables, g, train=False)
    out_train = model.apply(variables, g, train=True,
                            rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(out_train),
                               rtol=1e-5, atol=1e-6)
