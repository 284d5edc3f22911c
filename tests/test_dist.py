"""Data-parallel correctness on 8 fake CPU devices (SURVEY.md §4 plan).

The key property: a DP step over a sharded snapshot batch must produce the
same parameters as the single-device step over the full batch (psum'd mean
grads == global-batch grads).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_bfs_rans_tpu.graph.structs import build_padded_graph
from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig
from gnn_bfs_rans_tpu.parallel import (
    gather_predictions,
    make_data_mesh,
    make_dp_forward,
    make_dp_train_step,
    replicate,
    shard_targets,
)
from gnn_bfs_rans_tpu.train import TrainConfig
from gnn_bfs_rans_tpu.train.loop import init_state, make_train_step


@pytest.fixture(scope="module")
def small_graph():
    rng = np.random.default_rng(0)
    n = 48
    src = np.concatenate([np.arange(n), np.arange(n)])
    dst = np.concatenate([(np.arange(n) + 1) % n, (np.arange(n) - 1) % n])
    node_feat = rng.normal(size=(n, 3)).astype(np.float32)
    edge_feat = rng.normal(size=(len(src), 4)).astype(np.float32)
    return build_padded_graph(
        src.astype(np.int32), dst.astype(np.int32), edge_feat, node_feat,
        node_align=16, edge_align=32,
    )


@pytest.mark.parametrize("layer_type", ["GCN", "GAT"])
def test_dp_matches_single_device(small_graph, layer_type):
    """DP step == full-batch single-device step, bit-for-bit up to fp reduction.

    BatchNorm is disabled here: with BN, additive biases have exactly-zero
    true gradient and Adam amplifies cross-device reduction-order noise on
    them to O(lr) — expected fp behavior, not a DP correctness issue.
    """
    assert len(jax.devices()) >= 8
    mesh = make_data_mesh(8)
    graph = small_graph

    mcfg = ModelConfig(
        hidden_dim=16, num_layers=2, layer_type=layer_type,
        dropout=0.0, backend="dense", use_batch_norm=False,
    )
    tcfg = TrainConfig(lr=1e-3)
    model = FlowGNN(mcfg)
    state = init_state(model, graph, tcfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(1)
    targets = rng.normal(size=(8, graph.n_pad, 7)).astype(np.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    step_rng = jax.random.PRNGKey(2)

    # single-device full-batch step
    single = make_train_step(model, tcfg)
    s1, loss1 = single(state, graph, jnp.asarray(targets), lr, step_rng)

    # DP step on 8 shards — must re-init the state (donated above)
    state2 = init_state(model, graph, tcfg, jax.random.PRNGKey(0))
    dp_step = make_dp_train_step(model, tcfg, mesh)
    state2 = replicate(state2, mesh)
    graph_r = graph.to_device(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    tgt, wts = shard_targets(targets, mesh)
    s2, loss2 = dp_step(state2, graph_r, tgt, wts, lr, step_rng)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for p1, p2 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-6
        )


def test_dp_non_divisible_snapshots(small_graph):
    """S=3 on an 8-device mesh (the BFS default): the round-robin duplicate
    padding must NOT reweight the loss — DP result == single-device
    full-batch result on the ORIGINAL 3 snapshots (VERDICT r1 item 5)."""
    mesh = make_data_mesh(8)
    graph = small_graph
    mcfg = ModelConfig(
        hidden_dim=16, num_layers=2, layer_type="GCN",
        dropout=0.0, backend="dense", use_batch_norm=False,
    )
    tcfg = TrainConfig(lr=1e-3)
    model = FlowGNN(mcfg)
    state = init_state(model, graph, tcfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(7)
    targets = rng.normal(size=(3, graph.n_pad, 7)).astype(np.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    step_rng = jax.random.PRNGKey(2)

    single = make_train_step(model, tcfg)
    s1, loss1 = single(state, graph, jnp.asarray(targets), lr, step_rng)

    state2 = init_state(model, graph, tcfg, jax.random.PRNGKey(0))
    dp_step = make_dp_train_step(model, tcfg, mesh)
    state2 = replicate(state2, mesh)
    graph_r = graph.to_device(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    tgt, wts = shard_targets(targets, mesh)
    assert tgt.shape[0] == 8  # padded to the mesh size
    np.testing.assert_allclose(float(np.asarray(wts).sum()), 1.0, rtol=1e-6)
    s2, loss2 = dp_step(state2, graph_r, tgt, wts, lr, step_rng)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for p1, p2 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-6
        )


def test_dp_loss_decreases(small_graph):
    mesh = make_data_mesh(8)
    graph = small_graph
    mcfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GCN",
                      dropout=0.0, backend="dense")
    tcfg = TrainConfig(lr=3e-3)
    model = FlowGNN(mcfg)
    state = replicate(init_state(model, graph, tcfg, jax.random.PRNGKey(0)), mesh)
    graph_r = graph.to_device(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    rng = np.random.default_rng(3)
    # one learnable target replicated across shards (so the loss is fully
    # reducible — independent noise targets would leave irreducible variance)
    one = rng.normal(size=(1, graph.n_pad, 7)).astype(np.float32) * 0.1
    targets, wts = shard_targets(np.tile(one, (8, 1, 1)), mesh)
    step = make_dp_train_step(model, tcfg, mesh)
    lr = jnp.asarray(3e-3, jnp.float32)
    losses = []
    for i in range(20):
        state, loss = step(state, graph_r, targets, wts, lr, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8


def test_dp_forward_gather_order(small_graph):
    mesh = make_data_mesh(8)
    graph = small_graph
    mcfg = ModelConfig(hidden_dim=16, num_layers=1, layer_type="GCN",
                      dropout=0.0, backend="dense")
    model = FlowGNN(mcfg)
    state = init_state(model, graph, TrainConfig(), jax.random.PRNGKey(0))
    fwd = make_dp_forward(model, mesh)
    out = fwd(state.params, state.batch_stats, graph)
    got = gather_predictions(out, graph)
    assert got.shape == (graph.n_nodes, 7)
    # must equal plain forward, row for row
    ref = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        graph, train=False,
    )
    np.testing.assert_allclose(got, np.asarray(ref)[: graph.n_nodes], rtol=1e-5)


def test_graft_dryrun():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_dp_scaling_harness_schema():
    """The ≥90% BASELINE row is one command when hardware appears: the
    harness must run on the virtual mesh and emit the efficiency schema.
    (Virtual CPU devices share host cores, so the measured ratio here is an
    overhead bound, not a pass/fail efficiency — the artifact notes this.)"""
    from gnn_bfs_rans_tpu.utils.dp_bench import run_dp_scaling_benchmark

    result = run_dp_scaling_benchmark(
        n_devices=4, hidden_dim=16, num_layers=1, snapshots_per_device=1,
        steps=4,
    )
    assert result["metric"] == "dp_scaling_efficiency"
    assert result["n_devices"] == 4
    assert 0 < result["value"] <= 1.5  # ratio, not msgs/s
    assert result["step_s_1dev"] > 0 and result["step_s_ndev"] > 0
    assert "virtual CPU" in result["note"]
