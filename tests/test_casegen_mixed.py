"""Mixed hex/prism case: generator → parser → graph → banded kernels.

The polyhedral fixture (VERDICT r1 item 8): odd z-layers split into
triangular prisms, so the faces file mixes 3- and 4-vertex faces, interior
hexes reach degree 8 (> the hex D_max of 6), and conv parity runs on a
genuinely mixed-cell parsed mesh.
"""

import numpy as np
import pytest

from gnn_bfs_rans_tpu.foam.casegen import box_fields, generate_mixed_prism_case
from gnn_bfs_rans_tpu.foam.reader import FoamCase
from gnn_bfs_rans_tpu.graph import build_graph


@pytest.fixture(scope="module")
def mixed_case(tmp_path_factory):
    path = tmp_path_factory.mktemp("mixed")
    golden = generate_mixed_prism_case(path, 6, 5, 5)
    return path, golden


class TestMixedMeshParsing:
    def test_golden_counts(self, mixed_case):
        path, golden = mixed_case
        nx, ny, nz = 6, 5, 5
        n_even, n_odd = 3, 2  # k = 0,2,4 hex layers; k = 1,3 split layers
        assert golden["n_cells"] == nx * ny * (n_even + 2 * n_odd)
        mesh = FoamCase(path).load_mesh()
        assert mesh.n_cells == golden["n_cells"]
        assert mesh.n_faces == golden["n_faces"]
        assert mesh.n_internal_faces == golden["n_internal_faces"]
        # internal faces: lateral quads + per-split-cell diagonal quads +
        # 2 triangles per z-interface cell column
        expect_internal = (
            (nx - 1) * ny * nz            # +x quads (one per i-pair, all k)
            + nx * (ny - 1) * nz          # +y quads
            + nx * ny * n_odd             # diagonal quads in split layers
            + 2 * nx * ny * (nz - 1)      # two triangles per z interface
        )
        assert golden["n_internal_faces"] == expect_internal

    def test_faces_file_mixes_triangles_and_quads(self, mixed_case):
        """The variable-size face parser must see both 3( and 4( faces."""
        path, _ = mixed_case
        text = (path / "constant" / "polyMesh" / "faces").read_text()
        assert "\n3(" in text and "\n4(" in text

    def test_cell_centers_exact(self, mixed_case):
        """Prism centers = mean of 6 unique vertices (reader definition)."""
        path, golden = mixed_case
        mesh = FoamCase(path).load_mesh()
        np.testing.assert_allclose(
            mesh.cell_centers, golden["cell_centers"], rtol=1e-7, atol=1e-9
        )

    def test_fields_roundtrip(self, mixed_case):
        path, golden = mixed_case
        f = FoamCase(path).load_fields(
            "100", n_cells=golden["n_cells"], strict=True)
        expect = box_fields(golden["cell_centers"])
        for name in ("U", "p", "k", "epsilon", "nut"):
            np.testing.assert_allclose(f[name], expect[name], rtol=1e-5,
                                       atol=1e-8)


class TestMixedGraph:
    def test_degree_exceeds_hex_max(self, mixed_case):
        """Interior hexes sandwiched between split layers have degree 8."""
        path, _ = mixed_case
        mesh = FoamCase(path).load_mesh()
        g = build_graph(mesh, reorder="none")
        deg = np.asarray(g.in_degree)[: g.n_nodes]
        assert deg.max() == 8
        # hexes in layer k=2 with all lateral neighbors: (nx-2)(ny-2)
        assert (deg == 8).sum() == 4 * 3
        # prisms: ≤ 5 faces
        assert deg.min() >= 3

    def test_band_and_conv_parity_on_mixed_mesh(self, tmp_path):
        """Banded pallas == segment on a parsed mixed-cell mesh, all convs.

        16×16×7 lands the RCM bandwidth past one 128-tile → 5-tile window
        with degree-8 rows — the exact configuration the hex fixtures never
        exercised.
        """
        import jax

        from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig

        generate_mixed_prism_case(tmp_path / "c", 16, 16, 7)
        mesh = FoamCase(tmp_path / "c").load_mesh()
        g = build_graph(mesh, with_band=True).to_device()
        assert g.band is not None
        assert g.band.window == 5
        deg = np.asarray(g.in_degree)[: g.n_nodes]
        assert deg.max() == 8
        cfg = dict(hidden_dim=16, num_layers=2, dropout=0.0, norm_type="layer")
        for lt in ("GCN", "GAT", "GIN", "Transformer"):
            m_p = FlowGNN(ModelConfig(layer_type=lt, backend="pallas", **cfg))
            var = m_p.init(jax.random.PRNGKey(0), g, train=False)
            out_p = m_p.apply(var, g, train=False)
            m_s = FlowGNN(ModelConfig(layer_type=lt, backend="segment", **cfg))
            out_s = m_s.apply(var, g, train=False)
            np.testing.assert_allclose(
                np.asarray(out_p)[: g.n_nodes], np.asarray(out_s)[: g.n_nodes],
                rtol=1e-4, atol=1e-4, err_msg=lt,
            )

    def test_training_smoke(self, mixed_case):
        import jax
        import jax.numpy as jnp

        from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig
        from gnn_bfs_rans_tpu.train import TrainConfig, load_dataset
        from gnn_bfs_rans_tpu.train.loop import init_state, make_train_step

        path, _ = mixed_case
        ds = load_dataset(path, ["100"])
        mcfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GCN",
                           dropout=0.0, norm_type="layer", backend="dense")
        tcfg = TrainConfig(lr=1e-2)
        model = FlowGNN(mcfg)
        state = init_state(model, ds.graph, tcfg, jax.random.PRNGKey(0))
        step = make_train_step(model, tcfg)
        targets = jnp.asarray(ds.targets)
        lr = jnp.asarray(1e-2, jnp.float32)
        losses = []
        for i in range(120):
            state, loss = step(state, ds.graph, targets, lr,
                               jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert losses[-1] < 0.6 * losses[0], (losses[0], losses[-1])
