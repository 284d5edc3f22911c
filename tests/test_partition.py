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
