"""3-D hex-box case: generator → parser → graph → banded kernels, end to end.

Golden tests against analytically known counts/geometry (ROADMAP: 3-D mesh
cases).  The 20×12×12 box lands its RCM bandwidth in (128, 256], taking the
5-tile-window Pallas layout through a real parsed OpenFOAM mesh.
"""

import numpy as np
import pytest

from gnn_bfs_rans_tpu.foam.casegen import generate_box_case
from gnn_bfs_rans_tpu.foam.reader import FoamCase
from gnn_bfs_rans_tpu.graph import build_graph


@pytest.fixture(scope="module")
def box_case(tmp_path_factory):
    path = tmp_path_factory.mktemp("box3d")
    golden = generate_box_case(path, 6, 5, 4)
    return path, golden


class TestBoxMeshParsing:
    def test_golden_counts(self, box_case):
        path, golden = box_case
        nx, ny, nz = 6, 5, 4
        assert golden["n_cells"] == nx * ny * nz
        assert golden["n_points"] == (nx + 1) * (ny + 1) * (nz + 1)
        expect_internal = ((nx - 1) * ny * nz + nx * (ny - 1) * nz
                           + nx * ny * (nz - 1))
        assert golden["n_internal_faces"] == expect_internal
        mesh = FoamCase(path).load_mesh()
        assert mesh.n_cells == golden["n_cells"]
        assert mesh.n_faces == golden["n_faces"]
        assert mesh.n_internal_faces == golden["n_internal_faces"]
        assert mesh.points.shape == (golden["n_points"], 3)
        assert set(mesh.boundaries) == {"xmin", "xmax", "ymin", "ymax",
                                        "zmin", "zmax"}
        assert mesh.boundaries["xmin"].n_faces == 5 * 4

    def test_cell_centers_exact(self, box_case):
        """Hex cell centroid-of-unique-face-vertices == analytic center."""
        path, golden = box_case
        mesh = FoamCase(path).load_mesh()
        # points are written with 9 significant digits (%.9g)
        np.testing.assert_allclose(
            mesh.cell_centers, golden["cell_centers"], rtol=1e-7, atol=1e-9
        )

    def test_fields_roundtrip(self, box_case):
        path, golden = box_case
        case = FoamCase(path)
        f = case.load_fields("100", n_cells=golden["n_cells"], strict=True)
        from gnn_bfs_rans_tpu.foam.casegen import box_fields

        expect = box_fields(golden["cell_centers"])
        for name in ("U", "p", "k", "epsilon", "nut"):
            np.testing.assert_allclose(f[name], expect[name], rtol=1e-5,
                                       atol=1e-8)


class TestBoxGraph:
    def test_degree_and_bidirectionality(self, box_case):
        path, _ = box_case
        mesh = FoamCase(path).load_mesh()
        g = build_graph(mesh, reorder="none")
        deg = np.asarray(g.in_degree)[: g.n_nodes]
        # 3-D interior cells have 6 neighbors; corners 3
        assert deg.max() == 6 and deg.min() == 3
        # interior count: (nx-2)(ny-2)(nz-2) cells of degree 6
        assert (deg == 6).sum() == 4 * 3 * 2

    def test_band_window_5_on_real_3d_mesh(self, tmp_path):
        # 20×12×12: RCM bandwidth lands in (128, 256] → 5-tile window
        generate_box_case(tmp_path / "c", 20, 12, 12)
        mesh = FoamCase(tmp_path / "c").load_mesh()
        g = build_graph(mesh, with_band=True)
        assert g.band is not None, "expected a band on the 3-D box"
        assert g.band.window == 5
        assert float(np.asarray(g.band.adj, np.float64).sum()) == g.n_edges

    def test_w5_kernels_match_segment_on_3d_mesh(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig

        generate_box_case(tmp_path / "c", 20, 12, 12)
        mesh = FoamCase(tmp_path / "c").load_mesh()
        g = build_graph(mesh, with_band=True).to_device()
        assert g.band.window == 5
        cfg = dict(hidden_dim=16, num_layers=2, dropout=0.0, norm_type="layer")
        for lt in ("GCN", "GAT"):
            m_p = FlowGNN(ModelConfig(layer_type=lt, backend="pallas", **cfg))
            var = m_p.init(jax.random.PRNGKey(0), g, train=False)
            out_p = m_p.apply(var, g, train=False)
            m_s = FlowGNN(ModelConfig(layer_type=lt, backend="segment", **cfg))
            out_s = m_s.apply(var, g, train=False)
            np.testing.assert_allclose(
                np.asarray(out_p)[: g.n_nodes], np.asarray(out_s)[: g.n_nodes],
                rtol=1e-4, atol=1e-4,
            )


class TestBoxTraining:
    def test_end_to_end_dataset_and_train_smoke(self, box_case):
        import jax
        import jax.numpy as jnp

        from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig
        from gnn_bfs_rans_tpu.train import TrainConfig, load_dataset
        from gnn_bfs_rans_tpu.train.loop import init_state, make_train_step

        path, _ = box_case
        ds = load_dataset(path, ["100"])
        assert ds.n_snapshots == 1
        mcfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GCN",
                           dropout=0.0, norm_type="layer", backend="dense")
        tcfg = TrainConfig(lr=1e-2)
        model = FlowGNN(mcfg)
        graph = ds.graph
        state = init_state(model, graph, tcfg, jax.random.PRNGKey(0))
        step = make_train_step(model, tcfg)
        targets = jnp.asarray(ds.targets)
        lr = jnp.asarray(1e-2, jnp.float32)
        losses = []
        for i in range(150):
            state, loss = step(state, graph, targets, lr, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert losses[-1] < 0.6 * losses[0], (losses[0], losses[-1])
