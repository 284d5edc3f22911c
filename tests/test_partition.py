"""Node-sharded partitioned forward with halo exchange — 8 virtual devices.

Key property: the partitioned forward with a FlowGNN checkpoint's params
must reproduce the single-device forward row for row.
"""

import jax
import numpy as np
import pytest

from gnn_bfs_rans_tpu.graph import build_graph
from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig
from gnn_bfs_rans_tpu.parallel import (
    build_partition,
    gather_partitioned,
    make_data_mesh,
    make_partitioned_forward,
    shard_partition,
)


@pytest.fixture(scope="module")
def rcm_graph(bfs_mesh):
    return build_graph(bfs_mesh, reorder="rcm", with_band=False)


@pytest.fixture(scope="module")
def rcm_band_graph(bfs_mesh):
    return build_graph(bfs_mesh, reorder="rcm", with_band=True)


class TestBuildPartition:
    def test_shapes_and_masks(self, rcm_graph):
        pg = build_partition(rcm_graph, 8, halo=128)
        assert pg.node_feat.shape == (8, 12288 // 8 + 256, 3)
        assert pg.n_loc == 1536 and pg.halo == 128
        # every real node owned exactly once
        assert int(pg.owned_mask.sum()) == rcm_graph.n_nodes
        # real mask covers owned + halo copies of real nodes
        assert int(pg.real_mask.sum()) >= int(pg.owned_mask.sum())
        # owned features match global slices
        g_feat = np.asarray(rcm_graph.node_feat)
        for d in range(8):
            np.testing.assert_array_equal(
                np.asarray(pg.node_feat)[d, 128:128 + 1536],
                g_feat[d * 1536:(d + 1) * 1536],
            )

    def test_rejects_wide_graph(self, bfs_mesh):
        g_raw = build_graph(bfs_mesh, reorder="none", with_band=False)
        with pytest.raises(ValueError, match="halo"):
            build_partition(g_raw, 8, halo=128)

    def test_rejects_indivisible(self, rcm_graph):
        with pytest.raises(ValueError, match="divisible"):
            build_partition(rcm_graph, 7)


class TestPartitionedForward:
    @pytest.mark.parametrize("layer_type", ["GCN", "GAT", "GIN", "Transformer"])
    def test_matches_single_device(self, rcm_graph, layer_type):
        mesh = make_data_mesh(8)
        cfg = ModelConfig(
            hidden_dim=16, num_layers=3, layer_type=layer_type,
            dropout=0.0, backend="dense", use_edge_attr=False,
        )
        model = FlowGNN(cfg)
        variables = model.init(jax.random.PRNGKey(0), rcm_graph, train=False)
        full = np.asarray(model.apply(variables, rcm_graph, train=False))

        pg = shard_partition(build_partition(rcm_graph, 8, halo=128), mesh)
        fwd = make_partitioned_forward(cfg, mesh, halo=128)
        out = fwd(variables["params"], variables.get("batch_stats", {}), pg)
        got = gather_partitioned(out, pg)
        np.testing.assert_allclose(
            got, full[: rcm_graph.n_nodes], rtol=1e-4, atol=1e-5
        )

    @pytest.mark.parametrize("layer_type", ["GCN", "GAT", "GIN", "Transformer"])
    def test_pallas_matches_single_device(self, rcm_band_graph, layer_type):
        """Banded Pallas kernels per shard (VERDICT r1 item 1): the
        partitioned pallas forward — halo slices of the global band tensors —
        must reproduce the single-device pallas forward for every conv type
        (interpret mode off-TPU).  Transformer includes edge conditioning."""
        g = rcm_band_graph
        mesh = make_data_mesh(8)
        use_edge = layer_type == "Transformer"
        cfg = ModelConfig(
            hidden_dim=16, num_layers=2, layer_type=layer_type,
            dropout=0.0, backend="pallas", use_edge_attr=use_edge,
        )
        model = FlowGNN(cfg)
        variables = model.init(jax.random.PRNGKey(0), g, train=False)
        full = np.asarray(model.apply(variables, g, train=False))

        pg = build_partition(g, 8, halo=128)
        assert pg.has_band, "band slices must be carried by the partition"
        pg = shard_partition(pg, mesh)
        fwd = make_partitioned_forward(cfg, mesh, halo=128)
        out = fwd(variables["params"], variables.get("batch_stats", {}), pg)
        got = gather_partitioned(out, pg)
        np.testing.assert_allclose(
            got, full[: g.n_nodes], rtol=1e-4, atol=1e-5
        )

    def test_pallas_partitioned_train_step(self, rcm_band_graph):
        """Node-sharded pallas train step == single-device pallas step."""
        import jax.numpy as jnp

        from gnn_bfs_rans_tpu.parallel import (
            make_partitioned_train_step,
            shard_partitioned_targets,
        )
        from gnn_bfs_rans_tpu.parallel.data_parallel import replicate
        from gnn_bfs_rans_tpu.train import TrainConfig
        from gnn_bfs_rans_tpu.train.loop import init_state, make_train_step

        g = rcm_band_graph
        mesh = make_data_mesh(8)
        cfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GAT",
                          dropout=0.0, backend="pallas",
                          use_batch_norm=False, use_edge_attr=False)
        tcfg = TrainConfig(lr=1e-3)
        model = FlowGNN(cfg)
        rng = np.random.default_rng(0)
        targets = rng.normal(size=(2, g.n_pad, 7)).astype(np.float32)
        lr = jnp.asarray(1e-3, jnp.float32)
        key = jax.random.PRNGKey(3)

        state = init_state(model, g, tcfg, jax.random.PRNGKey(0))
        single = make_train_step(model, tcfg)
        s1, loss1 = single(state, g, jnp.asarray(targets), lr, key)

        pg = shard_partition(build_partition(g, 8, halo=128), mesh)
        tgt = shard_partitioned_targets(targets, pg, mesh)
        state2 = init_state(model, g, tcfg, jax.random.PRNGKey(0))
        state2 = replicate(state2, mesh)
        pstep = make_partitioned_train_step(cfg, tcfg, mesh, halo=128)
        s2, loss2 = pstep(state2, pg, tgt, lr, key)

        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=2e-6)

    def test_bn_running_stats_path(self, rcm_graph):
        """Eval-mode BN (running averages) matches across partitions."""
        mesh = make_data_mesh(4)
        cfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GCN",
                          dropout=0.0, backend="dense", use_batch_norm=True)
        model = FlowGNN(cfg)
        variables = model.init(jax.random.PRNGKey(1), rcm_graph, train=False)
        # give running stats non-trivial values
        bs = jax.tree.map(
            lambda v: v + 0.25 * np.arange(v.shape[0], dtype=np.float32) / v.shape[0],
            variables["batch_stats"],
        )
        full = np.asarray(
            model.apply({"params": variables["params"], "batch_stats": bs},
                        rcm_graph, train=False)
        )
        pg = shard_partition(build_partition(rcm_graph, 4, halo=128), mesh)
        fwd = make_partitioned_forward(cfg, mesh, halo=128)
        out = fwd(variables["params"], bs, pg)
        got = gather_partitioned(out, pg)
        np.testing.assert_allclose(
            got, full[: rcm_graph.n_nodes], rtol=1e-4, atol=1e-5
        )


class TestPartitionedTraining:
    def test_matches_single_device_step(self, rcm_graph):
        """Node-sharded train step == single-device step (grads via auto-psum)."""
        import jax.numpy as jnp

        from gnn_bfs_rans_tpu.parallel import (
            make_partitioned_train_step,
            shard_partitioned_targets,
        )
        from gnn_bfs_rans_tpu.train import TrainConfig
        from gnn_bfs_rans_tpu.train.loop import init_state, make_train_step

        mesh = make_data_mesh(8)
        cfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GCN",
                          dropout=0.0, backend="dense", use_batch_norm=False,
                          use_edge_attr=False)
        tcfg = TrainConfig(lr=1e-3)
        model = FlowGNN(cfg)
        rng = np.random.default_rng(0)
        targets = rng.normal(size=(2, rcm_graph.n_pad, 7)).astype(np.float32)
        lr = jnp.asarray(1e-3, jnp.float32)
        key = jax.random.PRNGKey(3)

        state = init_state(model, rcm_graph, tcfg, jax.random.PRNGKey(0))
        single = make_train_step(model, tcfg)
        s1, loss1 = single(state, rcm_graph, jnp.asarray(targets), lr, key)

        pg = shard_partition(build_partition(rcm_graph, 8, halo=128), mesh)
        tgt = shard_partitioned_targets(targets, pg, mesh)
        state2 = init_state(model, rcm_graph, tcfg, jax.random.PRNGKey(0))
        from gnn_bfs_rans_tpu.parallel.data_parallel import replicate
        state2 = replicate(state2, mesh)
        pstep = make_partitioned_train_step(cfg, tcfg, mesh, halo=128)
        s2, loss2 = pstep(state2, pg, tgt, lr, key)

        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=2e-6)

    def test_partitioned_training_learns(self, rcm_graph):
        import jax.numpy as jnp

        from gnn_bfs_rans_tpu.parallel import (
            make_partitioned_train_step,
            shard_partitioned_targets,
        )
        from gnn_bfs_rans_tpu.parallel.data_parallel import replicate
        from gnn_bfs_rans_tpu.train import TrainConfig
        from gnn_bfs_rans_tpu.train.loop import init_state

        mesh = make_data_mesh(4)
        cfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GCN",
                          dropout=0.0, backend="dense", norm_type="layer",
                          use_edge_attr=False)
        tcfg = TrainConfig(lr=3e-3)
        model = FlowGNN(cfg)
        rng = np.random.default_rng(1)
        targets = (rng.normal(size=(1, rcm_graph.n_pad, 7)) * 0.1).astype(np.float32)
        pg = shard_partition(build_partition(rcm_graph, 4, halo=128), mesh)
        tgt = shard_partitioned_targets(targets, pg, mesh)
        state = replicate(init_state(model, rcm_graph, tcfg, jax.random.PRNGKey(0)), mesh)
        step = make_partitioned_train_step(cfg, tcfg, mesh, halo=128)
        lr = jnp.asarray(3e-3, jnp.float32)
        losses = []
        for i in range(12):
            state, loss = step(state, pg, tgt, lr, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
