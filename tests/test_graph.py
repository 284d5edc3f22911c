"""Graph construction property tests (bidirectionality, padding invariants)."""

import numpy as np

from gnn_bfs_rans_tpu.graph import (
    boundary_cell_mask,
    build_edges,
    build_graph,
    compute_edge_features,
)


class TestEdgeConstruction:
    def test_bfs_edge_counts(self, bfs_mesh):
        senders, receivers = build_edges(bfs_mesh)
        assert len(senders) == 2 * 24170  # bidirectional internal faces
        # bidirectionality: edge multiset symmetric
        fwd = set(zip(senders.tolist(), receivers.tolist()))
        assert all((r, s) in fwd for s, r in list(fwd)[:2000])
        assert senders.min() >= 0 and senders.max() < 12225

    def test_boundary_self_loops(self, bfs_mesh):
        s, r = build_edges(bfs_mesh, boundary_self_loops=True)
        n_boundary = bfs_mesh.n_faces - bfs_mesh.n_internal_faces
        assert len(s) == 2 * 24170 + n_boundary
        loops = s[2 * 24170:]
        assert (loops == r[2 * 24170:]).all()

    def test_edge_features(self, bfs_mesh):
        s, r = build_edges(bfs_mesh)
        ef = compute_edge_features(bfs_mesh.cell_centers, s, r)
        assert ef.shape == (len(s), 4)
        # unit directions where distance > 0
        norms = np.linalg.norm(ef[:, :3], axis=1)
        nonzero = ef[:, 3] > 0
        np.testing.assert_allclose(norms[nonzero], 1.0, rtol=1e-5)
        # reversed edge has negated direction, same distance
        half = len(s) // 2
        np.testing.assert_allclose(ef[:half, :3], -ef[half:, :3], atol=1e-6)
        np.testing.assert_allclose(ef[:half, 3], ef[half:, 3], atol=1e-12)


class TestPaddedGraph:
    def test_padding_invariants(self, bfs_graph):
        g = bfs_graph
        assert g.n_nodes == 12225 and g.n_edges == 48340
        assert g.n_pad % 128 == 0 and g.e_pad % 128 == 0
        assert g.n_pad >= g.n_nodes and g.e_pad >= g.n_edges
        assert int(g.node_mask.sum()) == g.n_nodes
        assert int(g.edge_mask.sum()) == g.n_edges
        # padded entries are index 0 and masked out
        assert (np.asarray(g.senders)[g.n_edges:] == 0).all()
        assert not np.asarray(g.edge_mask)[g.n_edges:].any()

    def test_receiver_sorted(self, bfs_graph):
        recv = np.asarray(bfs_graph.receivers)[: bfs_graph.n_edges]
        assert (np.diff(recv) >= 0).all()

    def test_degrees(self, bfs_graph):
        g = bfs_graph
        deg = np.asarray(g.in_degree)
        recv = np.asarray(g.receivers)[: g.n_edges]
        expected = np.bincount(recv, minlength=g.n_pad)
        np.testing.assert_array_equal(deg, expected)
        # 2D quad mesh: interior cells have 4 neighbors, max degree 4
        assert deg.max() == 4
        assert g.max_degree >= 4

    def test_dense_layout_roundtrip(self, bfs_graph):
        """CSR→dense neighbor layout must reproduce the COO edge set."""
        g = bfs_graph
        nbr_idx = np.asarray(g.nbr_idx)
        nbr_mask = np.asarray(g.nbr_mask)
        nbr_edge = np.asarray(g.nbr_edge)
        senders = np.asarray(g.senders)
        receivers = np.asarray(g.receivers)
        dst_grid = np.broadcast_to(
            np.arange(g.n_pad)[:, None], nbr_idx.shape
        )
        pairs_dense = set(
            zip(nbr_idx[nbr_mask].tolist(), dst_grid[nbr_mask].tolist())
        )
        pairs_coo = set(
            zip(senders[: g.n_edges].tolist(), receivers[: g.n_edges].tolist())
        )
        assert pairs_dense == pairs_coo
        # nbr_edge points back at the COO edge with matching endpoints
        eids = nbr_edge[nbr_mask]
        assert (senders[eids] == nbr_idx[nbr_mask]).all()
        assert (receivers[eids] == dst_grid[nbr_mask]).all()

    def test_tiny_graph_matches_adjacency(self, tiny_graph):
        g, adj = tiny_graph
        deg = np.asarray(g.in_degree)[: adj.shape[0]]
        np.testing.assert_array_equal(deg, adj.sum(axis=0))


class TestBoundaryMask:
    def test_inlet_mask(self, bfs_mesh):
        mask = boundary_cell_mask(bfs_mesh, "inlet")
        assert mask.sum() == 30  # 30 inlet faces, distinct owner cells
        # inlet is at x = -0.0206; owner cells must be near minimum x
        assert bfs_mesh.cell_centers[mask][:, 0].max() < 0.0

    def test_unknown_patch_raises(self, bfs_mesh):
        import pytest

        with pytest.raises(ValueError):
            boundary_cell_mask(bfs_mesh, "nope")
