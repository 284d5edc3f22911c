"""Synthetic grid-graph generator tests (scale-benchmark input validity)."""

import numpy as np

from gnn_bfs_rans_tpu.utils.synthetic import build_grid_graph


class TestGridGraph:
    def test_grid_topology(self):
        g = build_grid_graph(8, 4, with_band=True, tile=16)
        # 2D grid: E = 2*(nx-1)*ny + 2*nx*(ny-1) directed edges
        assert g.n_nodes == 32
        assert g.n_edges == 2 * (7 * 4 + 8 * 3)
        deg = np.asarray(g.in_degree)[: g.n_nodes].reshape(4, 8)
        # corners 2, edges 3, interior 4
        assert deg[0, 0] == 2 and deg[1, 1] == 4 and deg[0, 3] == 3

    def test_band_attached_when_narrow(self):
        g = build_grid_graph(8, 8, with_band=True, tile=16)
        assert g.band is not None
        assert float(np.asarray(g.band.adj, dtype=np.float64).sum()) == g.n_edges

    def test_band_widens_then_skips(self):
        # tile ≤ nx ≤ 2·tile → bandwidth in (T, 2T] → 5-tile window
        g = build_grid_graph(32, 4, with_band=True, tile=16)
        assert g.band is not None and g.band.window == 5
        assert float(np.asarray(g.band.adj, dtype=np.float64).sum()) == g.n_edges
        # beyond 2·tile the 5-tile cap is exceeded → no band (dense fallback)
        g = build_grid_graph(64, 4, with_band=True, tile=16)
        assert g.band is None

    def test_edge_features_unit_directions(self):
        g = build_grid_graph(6, 5, with_band=False, tile=16)
        ef = np.asarray(g.edge_feat)[: g.n_edges]
        norms = np.linalg.norm(ef[:, :3], axis=1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
        assert (ef[:, 3] > 0).all()

    def test_selective_components(self):
        g = build_grid_graph(8, 8, with_band=True, tile=16,
                             band_components=("bias_self",))
        assert g.band.bias_self is not None
        assert g.band.adj is None and g.band.gcn is None
        assert g.band.bias_noself is None
