"""Multi-case (perturbed-geometry) DP tests on 8 virtual devices."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig
from gnn_bfs_rans_tpu.parallel import (
    CaseBatch,
    gather_case_predictions,
    make_data_mesh,
    make_multicase_forward,
    make_multicase_train_step,
    make_perturbed_cases,
    replicate,
    shard_cases,
)
from gnn_bfs_rans_tpu.train import TrainConfig
from gnn_bfs_rans_tpu.train.loop import init_state


@pytest.fixture(scope="module")
def cases(bfs_mesh):
    rng = np.random.default_rng(0)
    graph, batch = make_perturbed_cases(bfs_mesh, n_cases=8, amplitude=0.05)
    targets = rng.normal(size=batch.targets.shape).astype(np.float32) * 0.1
    batch = CaseBatch(
        node_feats=batch.node_feats,
        edge_feats=batch.edge_feats,
        targets=targets,
    )
    return graph, batch


def test_perturbed_cases_share_topology(cases):
    graph, batch = cases
    assert batch.n_cases == 8
    # geometry differs per case, topology shared
    assert not np.allclose(batch.node_feats[0], batch.node_feats[1])
    # perturbation amplitude is bounded (5% of mean edge length)
    d = np.abs(batch.node_feats[0] - batch.node_feats[1])
    ef = np.asarray(graph.edge_feat)
    mean_len = ef[: graph.n_edges, 3].mean()
    assert d.max() < mean_len
    # z stays planar
    np.testing.assert_allclose(batch.node_feats[:, :, 2],
                               batch.node_feats[0, 0, 2], atol=1e-6)


def test_multicase_train_step_runs_and_learns(cases):
    graph, batch = cases
    mesh = make_data_mesh(8)
    mcfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GCN",
                      dropout=0.0, backend="dense")
    tcfg = TrainConfig(lr=3e-3)
    model = FlowGNN(mcfg)
    state = replicate(init_state(model, _case_graph(graph, batch, 0),
                                 tcfg, jax.random.PRNGKey(0)), mesh)
    graph_r = graph.to_device(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    sharded = shard_cases(batch, mesh)
    step = make_multicase_train_step(model, tcfg, mesh)
    lr = jnp.asarray(3e-3, jnp.float32)
    losses = []
    for i in range(15):
        state, loss = step(state, graph_r, sharded, lr, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def _case_graph(graph, batch, c):
    return dataclasses.replace(
        graph,
        node_feat=jnp.asarray(batch.node_feats[c]),
        edge_feat=jnp.asarray(batch.edge_feats[c]),
    )


def test_multicase_forward_matches_percase_and_order(cases):
    """DP forward == independent per-case forward, in case order."""
    graph, batch = cases
    mesh = make_data_mesh(8)
    mcfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GCN",
                      dropout=0.0, backend="dense")
    model = FlowGNN(mcfg)
    state = init_state(model, _case_graph(graph, batch, 0),
                       TrainConfig(), jax.random.PRNGKey(0))
    fwd = make_multicase_forward(model, mesh)
    graph_r = graph.to_device(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    out = fwd(state.params, state.batch_stats, graph_r, shard_cases(batch, mesh))
    gathered = gather_case_predictions(out, graph)
    assert gathered.shape == (8, graph.n_nodes, 7)
    for c in (0, 3, 7):
        ref = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            _case_graph(graph, batch, c), train=False,
        )
        ref = np.asarray(ref)[: graph.n_nodes]
        if graph.perm is not None:
            perm = np.asarray(graph.perm)[: graph.n_nodes]
            unperm = np.empty_like(ref)
            unperm[perm] = ref
            ref = unperm
        np.testing.assert_allclose(gathered[c], ref, rtol=1e-4, atol=1e-5)


def test_writeback_per_case(cases, tmp_path):
    """Gathered case predictions write valid OpenFOAM files per case."""
    from gnn_bfs_rans_tpu.foam import FoamCase, save_fields_openfoam_format
    from gnn_bfs_rans_tpu.models.flow_gnn import split_fields

    graph, batch = cases
    rng = np.random.default_rng(1)
    fake = rng.normal(size=(2, graph.n_nodes, 7)).astype(np.float32)
    for c in range(2):
        fields = split_fields(fake[c])
        out = save_fields_openfoam_format(
            {k: np.asarray(v) for k, v in fields.items()},
            tmp_path / f"case_{c}", "predicted",
        )
        reread = FoamCase(tmp_path / f"case_{c}")
        u = reread.read_vector_field("predicted", "U")
        np.testing.assert_allclose(u, fake[c][:, :3], rtol=1e-5, atol=1e-8)
