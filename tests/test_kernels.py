"""Banded Pallas kernel tests vs segment-op ground truth (interpret mode).

On CPU the kernels run through the Pallas interpreter; the same code path
compiles via Mosaic on TPU (exercised by bench.py and the TPU smoke run).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_bfs_rans_tpu.graph.band import build_band
from gnn_bfs_rans_tpu.graph.structs import build_padded_graph
from gnn_bfs_rans_tpu.kernels.banded import (
    banded_gat,
    banded_spmm,
    banded_transformer,
)
from gnn_bfs_rans_tpu.kernels.reference import (
    banded_gat_ref,
    banded_spmm_ref,
    banded_transformer_ref,
)


def _band_graph(n=64, tile=16, seed=0, width=None):
    """A banded random graph: edges only between indices within ``width``."""
    rng = np.random.default_rng(seed)
    width = width if width is not None else tile
    src, dst = [], []
    for i in range(n):
        for j in range(max(0, i - width + 1), min(n, i + width)):
            if i != j and rng.random() < 0.3:
                src.append(j)
                dst.append(i)
    # symmetrize
    pairs = set(zip(src, dst)) | set(zip(dst, src))
    # ensure no isolated nodes: chain edges
    for i in range(n - 1):
        pairs.add((i, i + 1))
        pairs.add((i + 1, i))
    pairs = {(s, d) for s, d in pairs if abs(s - d) < width}
    src = np.array([p[0] for p in sorted(pairs)], dtype=np.int32)
    dst = np.array([p[1] for p in sorted(pairs)], dtype=np.int32)
    node_feat = rng.normal(size=(n, 3)).astype(np.float32)
    edge_feat = rng.normal(size=(len(src), 4)).astype(np.float32)
    g = build_padded_graph(src, dst, edge_feat, node_feat,
                           node_align=tile, edge_align=32)
    band = build_band(
        np.asarray(g.senders)[: g.n_edges],
        np.asarray(g.receivers)[: g.n_edges],
        g.n_pad,
        np.asarray(g.node_mask),
        np.asarray(g.in_degree),
        tile=tile,
        edge_feat=np.asarray(g.edge_feat)[: g.n_edges],
    )
    assert band is not None
    g = dataclasses.replace(g, band=band)
    return g


class TestBandConstruction:
    def test_adj_captures_all_edges(self):
        g = _band_graph()
        band = g.band
        assert float(jnp.sum(band.adj.astype(jnp.float32))) == g.n_edges

    def test_wide_edges_widen_window(self):
        # an edge 2.5 tiles wide → 5-tile SpMM window; the attention layout
        # pads from the exact column offsets: max(t·T − s) = 32,
        # max(s − t·T − T + 1) = 25 → pad 32, Wcols = 16 + 2·32 = 80
        src = np.array([0, 40, 0, 1], dtype=np.int32)
        dst = np.array([40, 0, 1, 0], dtype=np.int32)
        band = build_band(src, dst, 48, np.ones(48, bool), np.ones(48), tile=16)
        assert band is not None and band.window == 5
        assert band.width_cols == 80

    def test_band_rejects_too_wide_graph(self):
        # an edge wider than max_window_tiles allows → band must refuse
        src = np.array([0, 90], dtype=np.int32)
        dst = np.array([90, 0], dtype=np.int32)
        band = build_band(src, dst, 96, np.ones(96, bool), np.ones(96), tile=16)
        assert band is None

    @pytest.mark.parametrize("width", [16, 30])
    def test_gcn_coeffs_match_dense(self, width):
        g = _band_graph(width=width)
        n = g.n_nodes
        band = g.band
        # dense Â normalized
        A = np.zeros((g.n_pad, g.n_pad))
        s = np.asarray(g.senders)[: g.n_edges]
        r = np.asarray(g.receivers)[: g.n_edges]
        A[r, s] = 1.0
        A[np.arange(n), np.arange(n)] += 1.0
        d = A.sum(axis=1)
        inv = np.where(d > 0, 1 / np.sqrt(np.maximum(d, 1)), 0)
        expected = inv[:, None] * A * inv[None, :]
        # reconstruct dense from band
        tile = band.tile
        k0 = band.window // 2
        got = np.zeros_like(expected)
        bn = np.asarray(band.gcn)
        for t in range(band.n_tiles):
            for k in range(band.window):
                c0 = (t - k0 + k) * tile
                if c0 < 0 or c0 >= g.n_pad:
                    continue
                got[t * tile:(t + 1) * tile, c0:c0 + tile] = bn[t, k]
        np.testing.assert_allclose(got[:n, :n], expected[:n, :n], rtol=1e-5)

    def test_edge_band_roundtrip(self):
        g = _band_graph()
        band = g.band
        assert band.edge is not None
        tile = band.tile
        pad_left = (band.width_cols - tile) // 2
        s = np.asarray(g.senders)[: g.n_edges]
        r = np.asarray(g.receivers)[: g.n_edges]
        feat = np.asarray(g.edge_feat)[: g.n_edges]
        eb = np.asarray(band.edge, dtype=np.float32)  # [n, D_e, T, Wcols]
        t, row = r // tile, r % tile
        col = s - t * tile + pad_left
        got = eb[t, :, row, col]
        np.testing.assert_allclose(got, feat, rtol=1e-6)


class TestBandedSpMM:
    @pytest.mark.parametrize("width", [16, 30])
    def test_matches_reference_and_dense(self, width):
        g = _band_graph(width=width)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(g.n_pad, 32)).astype(np.float32))
        out_k = banded_spmm(g.band.adj, x)
        out_r = banded_spmm_ref(g.band.adj, x)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   rtol=1e-5, atol=1e-5)
        # vs segment ground truth (plain sum aggregation)
        from gnn_bfs_rans_tpu.ops import segment as sops
        out_s = sops.aggregate_sum(
            x, g.senders, g.receivers, g.n_pad, edge_mask=g.edge_mask
        )
        np.testing.assert_allclose(np.asarray(out_k)[: g.n_nodes],
                                   np.asarray(out_s)[: g.n_nodes],
                                   rtol=1e-4, atol=1e-5)

    def test_gradient(self):
        g = _band_graph()
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(g.n_pad, 16)).astype(np.float32))

        def loss_k(x_):
            return jnp.sum(banded_spmm(g.band.adj, x_) ** 2)

        def loss_r(x_):
            return jnp.sum(banded_spmm_ref(g.band.adj, x_) ** 2)

        gk = jax.grad(loss_k)(x)
        gr = jax.grad(loss_r)(x)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


class TestBandedGAT:
    @pytest.mark.parametrize("width", [16, 30])
    def test_matches_reference(self, width):
        g = _band_graph(width=width)
        rng = np.random.default_rng(3)
        H, C = 2, 8
        z = jnp.asarray(rng.normal(size=(g.n_pad, H * C)).astype(np.float32))
        a_s = jnp.asarray(rng.normal(size=(g.n_pad, H)).astype(np.float32))
        a_d = jnp.asarray(rng.normal(size=(g.n_pad, H)).astype(np.float32))
        out_k = banded_gat(g.band.bias_self, z, a_s, a_d, H, 0.2)
        out_r = banded_gat_ref(g.band.bias_self, z, a_s, a_d, H, 0.2)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("width", [16, 30])
    def test_gradient_flows_wide(self, width):
        g = _band_graph(width=width)
        rng = np.random.default_rng(14)
        H, C = 2, 8
        z = jnp.asarray(rng.normal(size=(g.n_pad, H * C)).astype(np.float32))
        a_s = jnp.asarray(rng.normal(size=(g.n_pad, H)).astype(np.float32))
        a_d = jnp.asarray(rng.normal(size=(g.n_pad, H)).astype(np.float32))

        def loss(fn):
            return lambda z_, s_, d_: jnp.sum(
                fn(g.band.bias_self, z_, s_, d_, H, 0.2) ** 2
            )

        gk = jax.grad(loss(banded_gat), argnums=(0, 1, 2))(z, a_s, a_d)
        gr = jax.grad(loss(banded_gat_ref), argnums=(0, 1, 2))(z, a_s, a_d)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_gradient_flows(self):
        g = _band_graph()
        rng = np.random.default_rng(4)
        H, C = 2, 8
        z = jnp.asarray(rng.normal(size=(g.n_pad, H * C)).astype(np.float32))
        a_s = jnp.asarray(rng.normal(size=(g.n_pad, H)).astype(np.float32))
        a_d = jnp.asarray(rng.normal(size=(g.n_pad, H)).astype(np.float32))

        def loss(z_, s_, d_):
            return jnp.sum(banded_gat(g.band.bias_self, z_, s_, d_, H, 0.2) ** 2)

        def loss_ref(z_, s_, d_):
            return jnp.sum(
                banded_gat_ref(g.band.bias_self, z_, s_, d_, H, 0.2) ** 2
            )

        gk = jax.grad(loss, argnums=(0, 1, 2))(z, a_s, a_d)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(z, a_s, a_d)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


class TestBandedTransformer:
    @pytest.mark.parametrize("width", [16, 30])
    def test_matches_reference(self, width):
        g = _band_graph(width=width)
        rng = np.random.default_rng(5)
        H, C = 2, 8
        q = jnp.asarray(rng.normal(size=(g.n_pad, H * C)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(g.n_pad, H * C)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(g.n_pad, H * C)).astype(np.float32))
        out_k = banded_transformer(g.band.bias_noself, q, k, v, H)
        out_r = banded_transformer_ref(g.band.bias_noself, q, k, v, H)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("width", [16, 30])
    def test_gradients_match_reference(self, width):
        g = _band_graph(width=width)
        rng = np.random.default_rng(9)
        H, C = 2, 8
        args = [
            jnp.asarray(rng.normal(size=(g.n_pad, H * C)).astype(np.float32))
            for _ in range(3)
        ]

        def loss(fn):
            return lambda q_, k_, v_: jnp.sum(
                fn(g.band.bias_noself, q_, k_, v_, H) ** 2
            )

        gk = jax.grad(loss(banded_transformer), argnums=(0, 1, 2))(*args)
        gr = jax.grad(loss(banded_transformer_ref), argnums=(0, 1, 2))(*args)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("width", [16, 30])
    def test_edge_conditioned_matches_reference(self, width):
        from gnn_bfs_rans_tpu.kernels.banded import banded_transformer_edge
        from gnn_bfs_rans_tpu.kernels.reference import (
            banded_transformer_edge_ref,
        )

        g = _band_graph(width=width)
        rng = np.random.default_rng(7)
        H, C, D = 2, 8, 4
        q = jnp.asarray(rng.normal(size=(g.n_pad, H * C)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(g.n_pad, H * C)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(g.n_pad, H * C)).astype(np.float32))
        qw = jnp.asarray(rng.normal(size=(g.n_pad, H * D)).astype(np.float32))
        out_k, s_k = banded_transformer_edge(
            g.band.bias_noself, g.band.edge, q, k, v, qw, H
        )
        out_r, s_r = banded_transformer_edge_ref(
            g.band.bias_noself, g.band.edge, q, k, v, qw, H
        )
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_r),
                                   rtol=1e-4, atol=1e-5)

    def test_edge_conditioned_gradients(self):
        from gnn_bfs_rans_tpu.kernels.banded import banded_transformer_edge
        from gnn_bfs_rans_tpu.kernels.reference import (
            banded_transformer_edge_ref,
        )

        g = _band_graph()
        rng = np.random.default_rng(8)
        H, C, D = 2, 4, 4
        args = [
            jnp.asarray(rng.normal(size=(g.n_pad, H * C)).astype(np.float32))
            for _ in range(3)
        ] + [jnp.asarray(rng.normal(size=(g.n_pad, H * D)).astype(np.float32))]

        def loss(fn):
            def inner(q_, k_, v_, w_):
                out, s = fn(g.band.bias_noself, g.band.edge, q_, k_, v_, w_, H)
                return jnp.sum(out ** 2) + jnp.sum(s ** 2)
            return inner

        gk = jax.grad(loss(banded_transformer_edge), argnums=(0, 1, 2, 3))(*args)
        gr = jax.grad(loss(banded_transformer_edge_ref), argnums=(0, 1, 2, 3))(*args)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


def _geo_bands(nx=32, ny=16, tile=32):
    """A geometric grid graph with BOTH the generic edge band and the
    factorized geo band built on identical structure."""
    from gnn_bfs_rans_tpu.graph.band import build_band
    from gnn_bfs_rans_tpu.utils.synthetic import build_grid_graph

    g = build_grid_graph(nx, ny, with_band=False, tile=tile)
    s = np.asarray(g.senders)[: g.n_edges]
    r = np.asarray(g.receivers)[: g.n_edges]
    ef = np.asarray(g.edge_feat)[: g.n_edges]
    args = (s, r, g.n_pad, np.asarray(g.node_mask), np.asarray(g.in_degree))
    b_edge = build_band(*args, tile=tile, components=("bias_noself", "edge"),
                        edge_feat=ef)
    b_geo = build_band(*args, tile=tile, components=("bias_noself", "geo"),
                       edge_feat=ef, node_pos=np.asarray(g.node_feat))
    return g, b_edge, b_geo


class TestGeoFactorizedTransformer:
    """The geometric factorization (2 banded planes + positions) must equal
    the generic 4-plane edge-conditioned kernel exactly (same math)."""

    def test_geo_band_built_for_geometric_features(self):
        _, b_edge, b_geo = _geo_bands()
        assert b_edge.edge is not None and b_edge.geo is None
        assert b_geo.geo is not None and b_geo.pos is not None
        assert b_geo.edge is None  # geo supersedes the generic planes
        assert b_geo.geo.shape[1] == 2  # (dist, 1/dist) planes

    def test_geo_refused_for_random_features(self):
        """Random (non-geometric) features must fall back to 'edge'."""
        g = _band_graph()
        from gnn_bfs_rans_tpu.graph.band import build_band

        s = np.asarray(g.senders)[: g.n_edges]
        r = np.asarray(g.receivers)[: g.n_edges]
        ef = np.asarray(g.edge_feat)[: g.n_edges]
        band = build_band(
            s, r, g.n_pad, np.asarray(g.node_mask),
            np.asarray(g.in_degree), tile=32,
            components=("bias_noself", "geo", "edge"), edge_feat=ef,
            node_pos=np.asarray(g.node_feat),
        )
        assert band.geo is None and band.edge is not None

    def test_geo_matches_generic_forward(self):
        from gnn_bfs_rans_tpu.kernels.banded import (
            banded_transformer_edge,
            banded_transformer_geo,
        )

        g, b_edge, b_geo = _geo_bands()
        rng = np.random.default_rng(10)
        H, C = 4, 8
        q, k, v = (
            jnp.asarray(rng.normal(size=(g.n_pad, H * C)).astype(np.float32))
            for _ in range(3)
        )
        qw = jnp.asarray(rng.normal(size=(g.n_pad, H * 4)).astype(np.float32))
        out_e, s_e = banded_transformer_edge(
            b_edge.bias_noself, b_edge.edge, q, k, v, qw, H)
        out_g, s_g = banded_transformer_geo(
            b_geo.bias_noself, b_geo.geo, jnp.asarray(b_geo.pos),
            q, k, v, qw, H)
        np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_e),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_g), np.asarray(s_e),
                                   rtol=1e-4, atol=1e-5)

    def test_geo_matches_generic_gradients(self):
        from gnn_bfs_rans_tpu.kernels.banded import (
            banded_transformer_edge,
            banded_transformer_geo,
        )

        g, b_edge, b_geo = _geo_bands(nx=32, ny=8)
        rng = np.random.default_rng(11)
        H, C = 2, 4
        args = [
            jnp.asarray(rng.normal(size=(g.n_pad, H * C)).astype(np.float32))
            for _ in range(3)
        ] + [jnp.asarray(rng.normal(size=(g.n_pad, H * 4)).astype(np.float32))]

        def loss(fn, *band):
            def inner(q_, k_, v_, w_):
                out, s = fn(*band, q_, k_, v_, w_, H)
                return jnp.sum(out ** 2) + jnp.sum(jnp.sin(s))
            return inner

        ge = jax.grad(
            loss(banded_transformer_edge, b_edge.bias_noself, b_edge.edge),
            argnums=(0, 1, 2, 3))(*args)
        gg = jax.grad(
            loss(banded_transformer_geo, b_geo.bias_noself, b_geo.geo,
                 jnp.asarray(b_geo.pos)),
            argnums=(0, 1, 2, 3))(*args)
        for a, b in zip(ge, gg):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_geo_mean_matches_generic_mean(self):
        from gnn_bfs_rans_tpu.kernels.banded import (
            banded_transformer_edge_mean,
            banded_transformer_geo_mean,
        )

        g, b_edge, b_geo = _geo_bands()
        rng = np.random.default_rng(12)
        H, C = 4, 8
        q, k, v = (
            jnp.asarray(rng.normal(size=(g.n_pad, H * C)).astype(np.float32))
            for _ in range(3)
        )
        qw = jnp.asarray(rng.normal(size=(g.n_pad, H * 4)).astype(np.float32))
        out_e, s_e = banded_transformer_edge_mean(
            b_edge.bias_noself, b_edge.edge, q, k, v, qw, H)
        out_g, s_g = banded_transformer_geo_mean(
            b_geo.bias_noself, b_geo.geo, jnp.asarray(b_geo.pos),
            q, k, v, qw, H)
        np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_e),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_g), np.asarray(s_e),
                                   rtol=1e-4, atol=1e-5)


class TestMeanHeadVariants:
    """Kernels with the concat=False head-mean epilogue fused in-kernel."""

    def _gat_inputs(self, g, H=2, C=8, seed=9):
        rng = np.random.default_rng(seed)
        z = jnp.asarray(rng.normal(size=(g.n_pad, H * C)).astype(np.float32))
        a_s = jnp.asarray(rng.normal(size=(g.n_pad, H)).astype(np.float32))
        a_d = jnp.asarray(rng.normal(size=(g.n_pad, H)).astype(np.float32))
        return z, a_s, a_d

    @pytest.mark.parametrize("width", [16, 30])
    def test_gat_mean_matches_full(self, width):
        from gnn_bfs_rans_tpu.kernels.banded import banded_gat_mean

        g = _band_graph(width=width)
        H, C = 2, 8
        z, a_s, a_d = self._gat_inputs(g, H, C)
        out_m = banded_gat_mean(g.band.bias_self, z, a_s, a_d, H, 0.2)
        out_f = banded_gat(g.band.bias_self, z, a_s, a_d, H, 0.2)
        assert out_m.shape == (g.n_pad, C)
        np.testing.assert_allclose(
            np.asarray(out_m), np.asarray(out_f).reshape(-1, H, C).mean(1),
            rtol=1e-5, atol=1e-6)

    def test_gat_mean_gradients_match_full(self):
        from gnn_bfs_rans_tpu.kernels.banded import banded_gat_mean

        g = _band_graph()
        H, C = 2, 8
        z, a_s, a_d = self._gat_inputs(g, H, C)

        def loss_m(z_, s_, d_):
            return jnp.sum(
                banded_gat_mean(g.band.bias_self, z_, s_, d_, H, 0.2) ** 2)

        def loss_f(z_, s_, d_):
            out = banded_gat(g.band.bias_self, z_, s_, d_, H, 0.2)
            return jnp.sum(out.reshape(-1, H, C).mean(axis=1) ** 2)

        gm = jax.grad(loss_m, argnums=(0, 1, 2))(z, a_s, a_d)
        gf = jax.grad(loss_f, argnums=(0, 1, 2))(z, a_s, a_d)
        for a, b in zip(gm, gf):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_transformer_mean_matches_full(self):
        from gnn_bfs_rans_tpu.kernels.banded import banded_transformer_mean

        g = _band_graph()
        rng = np.random.default_rng(11)
        H, C = 2, 8
        q, k, v = (jnp.asarray(
            rng.normal(size=(g.n_pad, H * C)).astype(np.float32))
            for _ in range(3))
        out_m = banded_transformer_mean(g.band.bias_noself, q, k, v, H)
        out_f = banded_transformer(g.band.bias_noself, q, k, v, H)
        assert out_m.shape == (g.n_pad, C)
        np.testing.assert_allclose(
            np.asarray(out_m), np.asarray(out_f).reshape(-1, H, C).mean(1),
            rtol=1e-5, atol=1e-6)

        def loss_m(q_, k_, v_):
            return jnp.sum(
                banded_transformer_mean(g.band.bias_noself, q_, k_, v_, H) ** 2)

        def loss_f(q_, k_, v_):
            out = banded_transformer(g.band.bias_noself, q_, k_, v_, H)
            return jnp.sum(out.reshape(-1, H, C).mean(axis=1) ** 2)

        gm = jax.grad(loss_m, argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gm, gf):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_transformer_edge_mean_matches_full(self):
        from gnn_bfs_rans_tpu.kernels.banded import (
            banded_transformer_edge,
            banded_transformer_edge_mean,
        )

        g = _band_graph()
        rng = np.random.default_rng(12)
        H, C, D = 2, 8, 4
        q, k, v = (jnp.asarray(
            rng.normal(size=(g.n_pad, H * C)).astype(np.float32))
            for _ in range(3))
        qw = jnp.asarray(rng.normal(size=(g.n_pad, H * D)).astype(np.float32))
        out_m, s_m = banded_transformer_edge_mean(
            g.band.bias_noself, g.band.edge, q, k, v, qw, H)
        out_f, s_f = banded_transformer_edge(
            g.band.bias_noself, g.band.edge, q, k, v, qw, H)
        assert out_m.shape == (g.n_pad, C)
        np.testing.assert_allclose(
            np.asarray(out_m), np.asarray(out_f).reshape(-1, H, C).mean(1),
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s_m), np.asarray(s_f),
                                   rtol=1e-5, atol=1e-6)

        def loss(fn):
            def inner(q_, k_, v_, w_):
                out, s = fn(g.band.bias_noself, g.band.edge, q_, k_, v_, w_, H)
                if out.shape[1] == H * C:
                    out = out.reshape(-1, H, C).mean(axis=1)
                return jnp.sum(out ** 2) + jnp.sum(s ** 2)
            return inner

        gm = jax.grad(loss(banded_transformer_edge_mean),
                      argnums=(0, 1, 2, 3))(q, k, v, qw)
        gf = jax.grad(loss(banded_transformer_edge),
                      argnums=(0, 1, 2, 3))(q, k, v, qw)
        for a, b in zip(gm, gf):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestAttentionDropout:
    """In-kernel dropout: deterministic per seed, fwd/bwd mask consistency.

    Runs on every backend: the TPU path draws from the Mosaic PRNG, the
    interpret path (CPU CI) from the counter-based hash stream
    (``kernels.banded._hash_bits``) — different bits, same contract, and the
    backward-replay checks below exercise it identically.

    GAT output is LINEAR in z for fixed alphas+mask, so a full-step
    directional difference equals the AD directional derivative exactly
    (up to f32 accumulation noise) — a strong check that the backward
    kernel replays the identical PRNG stream.
    """

    def _inputs(self, g, H=2, C=8, seed=0):
        rng = np.random.default_rng(seed)
        z = jnp.asarray(rng.normal(size=(g.n_pad, H * C)).astype(np.float32))
        a = jnp.asarray(rng.normal(size=(g.n_pad, H)).astype(np.float32))
        return z, a

    def test_deterministic_and_seed_sensitive(self):
        g = _band_graph(tile=128, n=512)
        z, a = self._inputs(g)
        s1 = jnp.asarray([7], jnp.int32)
        s2 = jnp.asarray([8], jnp.int32)
        o1 = banded_gat(g.band.bias_self, z, a, a, 2, 0.2, 0.3, s1)
        o2 = banded_gat(g.band.bias_self, z, a, a, 2, 0.2, 0.3, s1)
        o3 = banded_gat(g.band.bias_self, z, a, a, 2, 0.2, 0.3, s2)
        assert bool(jnp.all(o1 == o2))
        assert bool(jnp.any(o1 != o3))

    def test_bwd_mask_matches_fwd(self):
        g = _band_graph(tile=128, n=512)
        z, a = self._inputs(g)
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(size=z.shape).astype(np.float32))
        d = jnp.asarray(rng.normal(size=z.shape).astype(np.float32))
        seed = jnp.asarray([42], jnp.int32)

        def loss(z_):
            return jnp.vdot(
                banded_gat(g.band.bias_self, z_, a, a, 2, 0.2, 0.3, seed), w
            ) / 100.0

        fd = float(loss(z + d) - loss(z))
        ad = float(jnp.vdot(jax.grad(loss)(z), d))
        assert abs(fd - ad) / max(abs(fd), 1e-9) < 1e-2

    def test_dropout_rate_observed(self):
        """~rate of attention entries are dropped (hash stream uniformity)."""
        g = _band_graph(tile=128, n=512)
        z, a = self._inputs(g)
        z1 = jnp.ones_like(z)
        seed = jnp.asarray([11], jnp.int32)
        base = banded_gat(g.band.bias_self, z1, a * 0, a * 0, 2, 0.2, 0.0, None)
        drop = banded_gat(g.band.bias_self, z1, a * 0, a * 0, 2, 0.2, 0.4, seed)
        # with uniform logits and all-ones values, each row output is the
        # kept fraction rescaled by 1/keep: mean ratio ≈ 1, per-entry jitter
        ratio = np.asarray(drop[: g.n_nodes] / base[: g.n_nodes])
        assert abs(ratio.mean() - 1.0) < 0.05
        assert ratio.std() > 0.05  # it did actually drop entries

    def test_transformer_edge_dropout_grad_and_determinism(self):
        from gnn_bfs_rans_tpu.kernels.banded import banded_transformer_edge

        g = _band_graph(tile=128, n=512)
        z, _ = self._inputs(g)
        rng = np.random.default_rng(5)
        qw = jnp.asarray(rng.normal(size=(g.n_pad, 2 * 4)).astype(np.float32))
        seed = jnp.asarray([9], jnp.int32)

        def run(v_):
            o, s = banded_transformer_edge(
                g.band.bias_noself, g.band.edge, z, z, v_, qw, 2, 0.3, seed)
            return jnp.sum(o ** 2) + jnp.sum(s ** 2)

        o1 = run(z)
        o2 = run(z)
        assert float(o1) == float(o2)
        gz = jax.grad(run)(z)
        assert bool(jnp.isfinite(gz).all())

    def test_transformer_dropout_runs_under_grad(self):
        g = _band_graph(tile=128, n=512)
        z, _ = self._inputs(g)
        seed = jnp.asarray([3], jnp.int32)
        gz = jax.grad(lambda v_: jnp.sum(
            banded_transformer(g.band.bias_noself, z, z, v_, 2, 0.25, seed) ** 2
        ))(z)
        assert bool(jnp.isfinite(gz).all())


class TestConvBackendParity:
    """pallas-backend convs must match the segment backend on a band graph."""

    @pytest.mark.parametrize(
        "layer_type",
        ["GCN", "GIN", "GAT", "Transformer", "Transformer-edge"],
    )
    @pytest.mark.parametrize("width", [16, 30])
    def test_conv_pallas_vs_segment(self, layer_type, width):
        from gnn_bfs_rans_tpu.models.convs import CONV_REGISTRY

        g = _band_graph(width=width)
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(size=(g.n_pad, 16)).astype(np.float32))
        kwargs = dict(features=16)
        if layer_type.startswith(("GAT", "Transformer")):
            kwargs["heads"] = 2
        if layer_type == "Transformer":
            kwargs["edge_dim"] = None
        elif layer_type == "Transformer-edge":
            layer_type = "Transformer"
            kwargs["edge_dim"] = 4  # exercises the edge-conditioned kernel
        mod_s = CONV_REGISTRY[layer_type](backend="segment", **kwargs)
        variables = mod_s.init(jax.random.PRNGKey(0), x, g)
        out_s = mod_s.apply(variables, x, g)
        mod_p = CONV_REGISTRY[layer_type](backend="pallas", **kwargs)
        out_p = mod_p.apply(variables, x, g)
        np.testing.assert_allclose(
            np.asarray(out_s)[: g.n_nodes],
            np.asarray(out_p)[: g.n_nodes],
            rtol=1e-4, atol=1e-4,
        )


class TestBFSGraphBand:
    def test_bfs_graph_gets_band(self, bfs_mesh):
        from gnn_bfs_rans_tpu.graph import build_graph

        g = build_graph(bfs_mesh, with_band=True)
        assert g.perm is not None
        assert g.band is not None
        assert g.band.tile == 128
        assert float(jnp.sum(g.band.adj.astype(jnp.float32))) == g.n_edges
        # permutation is a bijection on real nodes
        perm = np.asarray(g.perm)[: g.n_nodes]
        assert len(np.unique(perm)) == g.n_nodes

    def test_rcm_prediction_invariance(self, bfs_mesh):
        """Same model params on reordered vs raw graph → same per-cell output."""
        from gnn_bfs_rans_tpu.graph import build_graph
        from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig

        g_rcm = build_graph(bfs_mesh, reorder="rcm", with_band=False)
        g_raw = build_graph(bfs_mesh, reorder="none", with_band=False)
        cfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GCN",
                          dropout=0.0, backend="segment")
        model = FlowGNN(cfg)
        variables = model.init(jax.random.PRNGKey(0), g_raw, train=False)
        out_raw = np.asarray(model.apply(variables, g_raw, train=False))
        out_rcm = np.asarray(model.apply(variables, g_rcm, train=False))
        perm = np.asarray(g_rcm.perm)[: g_rcm.n_nodes]
        unperm = np.empty_like(out_rcm[: g_rcm.n_nodes])
        unperm[perm] = out_rcm[: g_rcm.n_nodes]
        np.testing.assert_allclose(
            unperm, out_raw[: g_raw.n_nodes], rtol=2e-2, atol=2e-4
        )


class TestBandLayoutProperties:
    """Invariants of the half-tile attention layout (graph.band.Band)."""

    def test_bfs_band_is_half_tile_narrow(self, bfs_mesh):
        """BFS bandwidth 58 < 64 → 256-column windows (not 3 full tiles)."""
        from gnn_bfs_rans_tpu.graph import build_graph

        g = build_graph(bfs_mesh, with_band=True)
        assert g.band.width_cols == 256
        # reach maxes over ALL tensors: the SpMM full-tile layout (k0·T=128)
        # dominates the attention windows' 64 — the halo must cover both
        assert g.band.reach == 128
        assert g.band.window == 3  # SpMM layout keeps full tiles
        assert g.band.bias_self.shape == (g.n_pad // 128, 128, 256)

    def test_mask_columns_cover_all_edges(self):
        """Every edge lands inside its receiver tile's window columns."""
        g = _band_graph(tile=32, width=20)
        band = g.band
        tile = band.tile
        pad = (band.width_cols - tile) // 2
        s = np.asarray(g.senders)[: g.n_edges]
        r = np.asarray(g.receivers)[: g.n_edges]
        col = s - (r // tile) * tile + pad
        assert (col >= 0).all() and (col < band.width_cols).all()
        m = np.asarray(band.bias_noself)
        assert (m[r // tile, r % tile, col] == 1).all()
        # and the mask has exactly n_edges set bits
        assert int(m.sum()) == g.n_edges

    def test_attention_only_band_window_property(self):
        """Bands built without adj/gcn derive window from the mask width."""
        from gnn_bfs_rans_tpu.graph.band import build_band

        g = _band_graph(tile=32)
        s = np.asarray(g.senders)[: g.n_edges]
        r = np.asarray(g.receivers)[: g.n_edges]
        band = build_band(s, r, g.n_pad, np.asarray(g.node_mask),
                          np.asarray(g.in_degree), tile=32,
                          components=("bias_self",))
        assert band.adj is None and band.gcn is None
        assert band.window == -(-band.width_cols // band.tile)
        assert band.reach == (band.width_cols - band.tile) // 2


class TestPartitionReachFallback:
    def test_halo_narrower_than_reach_falls_back_dense(self):
        """A mesh whose attention reach exceeds the halo must drop the band
        slices (dense partitioned path) instead of silently mis-windowing."""
        from gnn_bfs_rans_tpu.parallel.partition import _slice_band

        # bandwidth > 128 → reach > 128 = halo
        g = _band_graph(n=2048, tile=128, width=200)
        assert g.band.reach > 128
        out, tile = _slice_band(g, 2, 1024, 128)
        assert out == {} and tile == 0


class TestFusedProjectionGAT:
    """banded_gat_mean_fused (inference path: z = x·W inside the kernel)."""

    @pytest.mark.parametrize("width", [16, 30])
    def test_matches_unfused(self, width):
        from gnn_bfs_rans_tpu.kernels.banded import (
            banded_gat_mean,
            banded_gat_mean_fused,
        )

        g = _band_graph(width=width)
        rng = np.random.default_rng(3)
        H, C, F = 2, 8, 16
        x = jnp.asarray(rng.normal(size=(g.n_pad, F)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(F, H * C)).astype(np.float32)) * 0.3
        # round 4: the fused op takes PACKED alphas [N, 2H] (one matmul,
        # no narrow src/dst split in HBM)
        wa = jnp.asarray(rng.normal(size=(F, 2 * H)).astype(np.float32)) * 0.2
        al = jnp.dot(x, wa, preferred_element_type=jnp.float32)
        z = x @ w
        ref = banded_gat_mean(g.band.bias_self, z, al[:, :H], al[:, H:],
                              H, 0.2, 0.0, None)
        got = banded_gat_mean_fused(g.band.bias_self, w, al, x, H, 0.2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_conv_eval_uses_fused_and_matches_train_forward(self):
        """GATConv eval (fused) == the train-mode forward at dropout 0."""
        from gnn_bfs_rans_tpu.models.convs import GATConv

        g = _band_graph(width=16)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(g.n_pad, 16)).astype(np.float32))
        mod = GATConv(features=16, heads=2, backend="pallas", dropout=0.0)
        variables = mod.init(jax.random.PRNGKey(0), x, g)
        out_eval = mod.apply(variables, x, g, True)    # fused path
        out_train = mod.apply(variables, x, g, False)  # unfused (z residual)
        np.testing.assert_allclose(np.asarray(out_eval),
                                   np.asarray(out_train),
                                   rtol=1e-5, atol=1e-5)

    def test_fused_gradients_match_unfused(self):
        """The trainable fused path (custom VJP re-projects z) must produce
        the same gradients as projecting outside + banded_gat_mean."""
        from gnn_bfs_rans_tpu.kernels.banded import (
            banded_gat_mean,
            banded_gat_mean_fused,
        )

        g = _band_graph(width=16)
        rng = np.random.default_rng(7)
        H, C, F = 2, 8, 16
        x = jnp.asarray(rng.normal(size=(g.n_pad, F)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(F, H * C)).astype(np.float32)) * 0.3
        wa = jnp.asarray(rng.normal(size=(F, 2 * H)).astype(np.float32)) * 0.2

        def loss_unfused(w_, wa_, x_):
            z = jnp.dot(x_, w_, preferred_element_type=jnp.float32)
            al = jnp.dot(x_, wa_, preferred_element_type=jnp.float32)
            out = banded_gat_mean(g.band.bias_self, z, al[:, :H], al[:, H:],
                                  H, 0.2, 0.0, None)
            return jnp.sum(out * out)

        def loss_fused(w_, wa_, x_):
            al = jnp.dot(x_, wa_, preferred_element_type=jnp.float32)
            out = banded_gat_mean_fused(g.band.bias_self, w_, al, x_,
                                        H, 0.2, 0.0, None)
            return jnp.sum(out * out)

        g1 = jax.grad(loss_unfused, argnums=(0, 1, 2))(w, wa, x)
        g2 = jax.grad(loss_fused, argnums=(0, 1, 2))(w, wa, x)
        for a, b, name in zip(g1, g2, ("dw", "dwa", "dx")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4, err_msg=name)

    def test_inkernel_project_matches_separate(self):
        """The carry-based direct-dz + in-kernel projection backward
        (project_x/project_w) must reproduce the separate fold+matmul
        gradients exactly — exercised directly because the size gate keeps
        it off at test shapes."""
        from gnn_bfs_rans_tpu.kernels.banded_bwd import banded_gat_bwd

        g = _band_graph(width=16)
        rng = np.random.default_rng(11)
        H, C, F = 2, 8, 16
        hc = H * C
        x = jnp.asarray(rng.normal(size=(g.n_pad, F)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(F, hc)).astype(np.float32)) * 0.3
        z = jnp.dot(x, w, preferred_element_type=jnp.float32)
        al = jnp.asarray(rng.normal(size=(g.n_pad, 2 * H)).astype(np.float32))
        cot = jnp.asarray(rng.normal(size=(g.n_pad, C)).astype(np.float32))

        dz, da_ref = banded_gat_bwd(
            g.band.bias_self, z, al, cot, H, 0.2, mean_expand=True)
        dx_ref = jnp.dot(dz, w.T, preferred_element_type=jnp.float32)
        dw_ref = jnp.dot(x.T, dz, preferred_element_type=jnp.float32)

        dx, dw, da = banded_gat_bwd(
            g.band.bias_self, z, al, cot, H, 0.2, mean_expand=True,
            project_x=x, project_w=w)
        np.testing.assert_allclose(np.asarray(da), np.asarray(da_ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                                   rtol=2e-4, atol=2e-4)

        # dropout path: seeds replay identically through the flush step
        seed = jnp.zeros((1,), jnp.int32)
        dz_d, _ = banded_gat_bwd(
            g.band.bias_self, z, al, cot, H, 0.2, dropout_rate=0.25,
            seed=seed, mean_expand=True)
        dx_d, dw_d, _ = banded_gat_bwd(
            g.band.bias_self, z, al, cot, H, 0.2, dropout_rate=0.25,
            seed=seed, mean_expand=True, project_x=x, project_w=w)
        np.testing.assert_allclose(
            np.asarray(dx_d),
            np.asarray(jnp.dot(dz_d, w.T,
                               preferred_element_type=jnp.float32)),
            rtol=2e-4, atol=2e-4)

    def test_alpha_inkernel_project_matches_separate(self):
        """The α-inside-the-boundary backward (alpha_wa) must reproduce the
        separate dz/dα path exactly — exercised directly because the size
        gate keeps it off at test shapes."""
        from gnn_bfs_rans_tpu.kernels.banded_bwd import banded_gat_bwd

        g = _band_graph(width=16)
        rng = np.random.default_rng(13)
        H, C, F = 2, 8, 16
        hc = H * C
        x = jnp.asarray(rng.normal(size=(g.n_pad, F)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(F, hc)).astype(np.float32)) * 0.3
        wa = jnp.asarray(
            rng.normal(size=(F, 2 * H)).astype(np.float32)) * 0.2
        z = jnp.dot(x, w, preferred_element_type=jnp.float32)
        al = jnp.dot(x, wa, preferred_element_type=jnp.float32)
        cot = jnp.asarray(rng.normal(size=(g.n_pad, C)).astype(np.float32))

        dz, da = banded_gat_bwd(
            g.band.bias_self, z, al, cot, H, 0.2, mean_expand=True)
        dx_ref = (jnp.dot(dz, w.T, preferred_element_type=jnp.float32)
                  + jnp.dot(da, wa.T, preferred_element_type=jnp.float32))
        dw_ref = jnp.dot(x.T, dz, preferred_element_type=jnp.float32)
        dwa_ref = jnp.dot(x.T, da, preferred_element_type=jnp.float32)

        dx, dw, dwa = banded_gat_bwd(
            g.band.bias_self, z, al, cot, H, 0.2, mean_expand=True,
            project_x=x, project_w=w, alpha_wa=wa)
        np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dwa), np.asarray(dwa_ref),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                                   rtol=2e-4, atol=2e-4)

        # dropout: the flush-step guard must also zero the α streams
        seed = jnp.zeros((1,), jnp.int32)
        dz_d, da_d = banded_gat_bwd(
            g.band.bias_self, z, al, cot, H, 0.2, dropout_rate=0.25,
            seed=seed, mean_expand=True)
        dx_d, _, dwa_d = banded_gat_bwd(
            g.band.bias_self, z, al, cot, H, 0.2, dropout_rate=0.25,
            seed=seed, mean_expand=True, project_x=x, project_w=w,
            alpha_wa=wa)
        np.testing.assert_allclose(
            np.asarray(dwa_d),
            np.asarray(jnp.dot(x.T, da_d,
                               preferred_element_type=jnp.float32)),
            rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(dx_d),
            np.asarray(jnp.dot(dz_d, w.T, preferred_element_type=jnp.float32)
                       + jnp.dot(da_d, wa.T,
                                 preferred_element_type=jnp.float32)),
            rtol=2e-4, atol=2e-4)

    def test_tr_inkernel_project_matches_separate(self):
        """The transformer carry-based in-kernel projection backward must
        reproduce the separate-path gradients (geo path; wblk is
        block-diagonal by construction, so only its diagonal blocks carry
        structurally live cotangents)."""
        from gnn_bfs_rans_tpu.kernels.banded_bwd import banded_transformer_bwd

        _, _, band = _geo_bands()
        rng = np.random.default_rng(5)
        H, C, F = 2, 8, 16
        hc = H * C
        n = band.bias_noself.shape[0] * band.tile
        x = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))
        wq = jnp.asarray(rng.normal(size=(F, hc)).astype(np.float32)) * 0.3
        wk = jnp.asarray(rng.normal(size=(F, hc)).astype(np.float32)) * 0.3
        wv = jnp.asarray(rng.normal(size=(F, hc)).astype(np.float32)) * 0.3
        w_e = rng.normal(size=(4, H, C)).astype(np.float32) * 0.2
        eye_h = np.eye(H, dtype=np.float32)
        wblk = jnp.asarray((eye_h[:, None, :, None]
                            * np.transpose(w_e, (1, 2, 0))[:, :, None, :]
                            ).reshape(hc, H * 4))
        q = jnp.dot(x, wq)
        k = jnp.dot(x, wk)
        v = jnp.dot(x, wv)
        qw = jnp.dot(q, wblk)
        cot = jnp.asarray(rng.normal(size=(n, C)).astype(np.float32))
        gs = jnp.asarray(rng.normal(size=(n, H * 4)).astype(np.float32))

        dq, dk, dv, dqw = banded_transformer_bwd(
            band.bias_noself, q, k, v, cot, H, qw=qw, gs=gs,
            geo_band=band.geo, pos=band.pos, mean_expand=True)
        dq_full = dq.astype(jnp.float32) + jnp.dot(dqw, wblk.T)
        mask = jnp.asarray((eye_h[:, None, :, None]
                            * np.ones((1, C, 1, 4), np.float32)
                            ).reshape(hc, H * 4))
        refs = dict(
            dx=jnp.dot(dq_full, wq.T) + jnp.dot(dk, wk.T)
            + jnp.dot(dv, wv.T),
            dwq=jnp.dot(x.T, dq_full), dwk=jnp.dot(x.T, dk),
            dwv=jnp.dot(x.T, dv), dbq=jnp.sum(dq_full, 0),
            dbk=jnp.sum(dk, 0), dbv=jnp.sum(dv, 0),
            dwblk=jnp.dot(q.T, dqw) * mask)
        outs = banded_transformer_bwd(
            band.bias_noself, q, k, v, cot, H, qw=qw, gs=gs,
            geo_band=band.geo, pos=band.pos, mean_expand=True,
            project_x=x, project_wq=wq, project_wk=wk, project_wv=wv,
            project_wblk=wblk)
        for val, name in zip(
                outs, ("dx", "dwq", "dwk", "dwv", "dbq", "dbk", "dbv",
                       "dwblk")):
            np.testing.assert_allclose(
                np.asarray(val), np.asarray(refs[name]),
                rtol=3e-4, atol=3e-4, err_msg=name)

    def test_fused_train_conv_matches_unfused_grads(self):
        """GATConv(fuse_train=True) train-mode value AND grads == unfused."""
        from gnn_bfs_rans_tpu.models.convs import GATConv

        g = _band_graph(width=16)
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(g.n_pad, 16)).astype(np.float32))
        base = GATConv(features=16, heads=2, backend="pallas", dropout=0.0)
        fused = GATConv(features=16, heads=2, backend="pallas", dropout=0.0,
                        fuse_train=True)
        variables = base.init(jax.random.PRNGKey(0), x, g)

        def loss(mod, params, x_):
            out = mod.apply({"params": params}, x_, g, False)  # train mode
            return jnp.sum(out * out)

        l1, g1 = jax.value_and_grad(lambda p: loss(base, p, x))(
            variables["params"])
        l2, g2 = jax.value_and_grad(lambda p: loss(fused, p, x))(
            variables["params"])
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
        flat2 = dict(jax.tree_util.tree_flatten_with_path(g2)[0])
        for path, leaf in flat1:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat2[path]),
                rtol=2e-4, atol=2e-4, err_msg=str(path))

    def test_fused_train_dropout_matches_unfused_stream(self):
        """In-kernel dropout seeds per receiver tile: fused and unfused
        kernels replay the same mask for the same seed."""
        from gnn_bfs_rans_tpu.kernels.banded import (
            banded_gat_mean,
            banded_gat_mean_fused,
        )

        g = _band_graph(width=16)
        rng = np.random.default_rng(9)
        H, C, F = 2, 8, 16
        x = jnp.asarray(rng.normal(size=(g.n_pad, F)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(F, H * C)).astype(np.float32)) * 0.3
        wa = jnp.asarray(rng.normal(size=(F, 2 * H)).astype(np.float32)) * 0.2
        al = jnp.dot(x, wa, preferred_element_type=jnp.float32)
        seed = jnp.asarray([1234], jnp.int32)
        z = jnp.dot(x, w, preferred_element_type=jnp.float32)
        ref = banded_gat_mean(g.band.bias_self, z, al[:, :H], al[:, H:],
                              H, 0.2, 0.3, seed)
        got = banded_gat_mean_fused(g.band.bias_self, w, al, x, H,
                                    0.2, 0.3, seed)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_transformer_conv_eval_fused_matches_train_forward(self):
        """TransformerConv eval (fused q/k/v projections) == train forward."""
        from gnn_bfs_rans_tpu.models.convs import TransformerConv

        g, _, b_geo = _geo_bands()
        import dataclasses as _dc
        g = _dc.replace(g, band=b_geo)
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(g.n_pad, 16)).astype(np.float32))
        mod = TransformerConv(features=16, heads=2, backend="pallas",
                              dropout=0.0, edge_dim=4, fuse_eval=True)
        variables = mod.init(jax.random.PRNGKey(0), x, g)
        out_eval = mod.apply(variables, x, g, True)    # fused path
        out_train = mod.apply(variables, x, g, False)  # unfused
        np.testing.assert_allclose(np.asarray(out_eval),
                                   np.asarray(out_train),
                                   rtol=1e-4, atol=1e-5)


class TestCombinePartials:
    """The fused shifted-slice fold must equal the scatter-add formulation."""

    @pytest.mark.parametrize("n_tiles,w_sub,sub,tile", [
        (8, 6, 4, 8),    # 3-tile window, r=2 (flagship layout)
        (8, 10, 4, 8),   # 5-tile window, r=2
        (8, 4, 4, 8),    # half-tile-clamped window (k0 not a multiple of r)
        (5, 3, 8, 8),    # r=1 degenerate
    ])
    def test_matches_scatter_add_reference(self, n_tiles, w_sub, sub, tile):
        import jax.numpy as jnp

        from gnn_bfs_rans_tpu.kernels.banded_bwd import combine_partials

        rng = np.random.default_rng(0)
        feat = 5
        part = jnp.asarray(
            rng.normal(size=(n_tiles, w_sub, sub, feat)).astype(np.float32))

        # the original formulation: W_sub strided .at[].add onto a padded acc
        r = tile // sub
        k0 = (w_sub - r) // 2
        pad = max(-(-k0 // r), (w_sub - 1 - k0) // r + 1)
        acc = jnp.zeros((n_tiles + 2 * pad, r, sub, feat), jnp.float32)
        for k in range(w_sub):
            offs = k - k0 + pad * r
            acc = acc.at[offs // r:offs // r + n_tiles, offs % r].add(part[:, k])
        ref = acc.reshape((n_tiles + 2 * pad) * tile, feat)[
            pad * tile:pad * tile + n_tiles * tile]

        out = combine_partials(part, tile)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


class TestFoldPartials:
    """Pallas read-once fold vs the XLA shifted-slice reference
    (kernels.banded_bwd.fold_partials / combine_partials)."""

    @pytest.mark.parametrize("w_sub,n_tiles", [(3, 5), (4, 7), (5, 4)])
    def test_matches_combine(self, w_sub, n_tiles):
        from gnn_bfs_rans_tpu.kernels.banded_bwd import (
            combine_partials,
            fold_partials,
        )

        tile, sub, feat = 16, 8, 128
        rng = np.random.default_rng(11)
        part = jnp.asarray(
            rng.normal(size=(n_tiles, w_sub, sub, feat)).astype(np.float32))
        ref = combine_partials(part, tile)
        got = fold_partials(part, tile)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_bf16_output_dtype(self):
        from gnn_bfs_rans_tpu.kernels.banded_bwd import (
            combine_partials,
            fold_partials,
        )

        tile, sub, feat, n_tiles, w_sub = 16, 8, 128, 6, 4
        rng = np.random.default_rng(12)
        part = jnp.asarray(
            rng.normal(size=(n_tiles, w_sub, sub, feat)).astype(np.float32))
        got = fold_partials(part, tile, out_dtype=jnp.bfloat16)
        assert got.dtype == jnp.bfloat16
        ref = combine_partials(part, tile).astype(jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)
