"""Conv-layer numerical tests vs dense numpy reference implementations.

torch_geometric is unavailable in this image, so each conv's semantics (as
documented in the PyG papers/defaults used by the reference,
``gnn_model.py:62-84``) is re-derived here with explicit dense-adjacency
numpy math and both backends are checked against it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_bfs_rans_tpu.models.convs import GATConv, GCNConv, GINConv, TransformerConv


def _init_and_apply(module_cls, kwargs, g, x, **call_kwargs):
    mod = module_cls(**kwargs)
    import dataclasses

    g = dataclasses.replace(g, node_feat=jnp.asarray(x))
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
    out = mod.apply(variables, jnp.asarray(x), g, **call_kwargs)
    return variables, np.asarray(out)


def _dense_from_params(variables, name):
    return {k: np.asarray(v) for k, v in variables["params"][name].items()} if name in variables["params"] else None


@pytest.fixture(scope="module")
def setup(tiny_graph):
    g, adj = tiny_graph
    rng = np.random.default_rng(1)
    n = adj.shape[0]
    x = np.zeros((g.n_pad, 8), dtype=np.float32)
    x[:n] = rng.normal(size=(n, 8)).astype(np.float32)
    return g, adj, x, n


class TestGCN:
    def _reference(self, variables, x, adj):
        W = np.asarray(variables["params"]["lin"]["kernel"])  # [in, out]
        b = np.asarray(variables["params"]["bias"])
        n = adj.shape[0]
        a_hat = adj.astype(np.float64) + np.eye(n)
        d = a_hat.sum(axis=1)
        d_inv = 1.0 / np.sqrt(d)
        norm = d_inv[:, None] * a_hat * d_inv[None, :]
        return norm @ (x[:n].astype(np.float64) @ W) + b

    @pytest.mark.parametrize("backend", ["segment", "dense"])
    def test_matches_dense_math(self, setup, backend):
        g, adj, x, n = setup
        variables, out = _init_and_apply(
            GCNConv, dict(features=16, backend=backend), g, x
        )
        expected = self._reference(variables, x, adj)
        np.testing.assert_allclose(out[:n], expected, rtol=1e-4, atol=1e-5)

    def test_backends_agree(self, setup):
        g, adj, x, n = setup
        mod_s = GCNConv(features=16, backend="segment")
        variables = mod_s.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
        out_s = mod_s.apply(variables, jnp.asarray(x), g)
        out_d = GCNConv(features=16, backend="dense").apply(
            variables, jnp.asarray(x), g
        )
        np.testing.assert_allclose(
            np.asarray(out_s)[:n], np.asarray(out_d)[:n], rtol=1e-4, atol=1e-5
        )


class TestGAT:
    def _reference(self, variables, x, adj):
        p = variables["params"]
        W = np.asarray(p["lin"]["kernel"])  # [in, H*C]
        a_src = np.asarray(p["att_src"])[0]  # [H, C]
        a_dst = np.asarray(p["att_dst"])[0]
        bias = np.asarray(p["bias"])
        n = adj.shape[0]
        H, C = a_src.shape
        z = (x[:n].astype(np.float64) @ W).reshape(n, H, C)
        al_s = np.einsum("nhc,hc->nh", z, a_src)
        al_d = np.einsum("nhc,hc->nh", z, a_dst)
        a_hat = adj.astype(bool) | np.eye(n, dtype=bool)  # self-loops
        out = np.zeros((n, H, C))
        for i in range(n):
            nbrs = np.nonzero(a_hat[i])[0]
            logits = al_s[nbrs] + al_d[i]  # [k, H]
            logits = np.where(logits > 0, logits, 0.2 * logits)  # LeakyReLU
            e = np.exp(logits - logits.max(axis=0))
            attn = e / e.sum(axis=0)
            out[i] = np.einsum("kh,khc->hc", attn, z[nbrs])
        return out.mean(axis=1) + bias  # concat=False → mean heads

    @pytest.mark.parametrize("backend", ["segment", "dense"])
    def test_matches_dense_math(self, setup, backend):
        g, adj, x, n = setup
        variables, out = _init_and_apply(
            GATConv, dict(features=16, heads=4, backend=backend), g, x
        )
        expected = self._reference(variables, x, adj)
        np.testing.assert_allclose(out[:n], expected, rtol=1e-4, atol=1e-5)

    def test_backends_agree(self, setup):
        g, adj, x, n = setup
        mod = GATConv(features=16, heads=4, backend="segment")
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
        out_s = mod.apply(variables, jnp.asarray(x), g)
        out_d = GATConv(features=16, heads=4, backend="dense").apply(
            variables, jnp.asarray(x), g
        )
        np.testing.assert_allclose(
            np.asarray(out_s)[:n], np.asarray(out_d)[:n], rtol=1e-4, atol=1e-5
        )


class TestGIN:
    def _reference(self, variables, x, adj):
        p = variables["params"]
        W0, b0 = np.asarray(p["mlp_0"]["kernel"]), np.asarray(p["mlp_0"]["bias"])
        W1, b1 = np.asarray(p["mlp_1"]["kernel"]), np.asarray(p["mlp_1"]["bias"])
        n = adj.shape[0]
        agg = adj.astype(np.float64) @ x[:n].astype(np.float64)
        h = x[:n] + agg  # eps = 0
        h = np.maximum(h @ W0 + b0, 0)
        return h @ W1 + b1

    @pytest.mark.parametrize("backend", ["segment", "dense"])
    def test_matches_dense_math(self, setup, backend):
        g, adj, x, n = setup
        variables, out = _init_and_apply(
            GINConv, dict(features=8, backend=backend), g, x
        )
        expected = self._reference(variables, x, adj)
        np.testing.assert_allclose(out[:n], expected, rtol=1e-4, atol=1e-5)


class TestTransformer:
    def _reference(self, variables, x, adj, edge_feat=None, g=None):
        p = variables["params"]
        n = adj.shape[0]
        def lin(name, v):
            return v @ np.asarray(p[name]["kernel"]) + np.asarray(p[name]["bias"])
        H = 4
        xq = x[:n].astype(np.float64)
        q = lin("lin_query", xq)
        k = lin("lin_key", xq)
        v = lin("lin_value", xq)
        C = q.shape[1] // H
        q, k, v = (a.reshape(n, H, C) for a in (q, k, v))
        ek = None
        if edge_feat is not None:
            We = np.asarray(p["lin_edge"]["kernel"])
            ek = (edge_feat.astype(np.float64) @ We).reshape(-1, H, C)
        out = np.zeros((n, H, C))
        senders = np.asarray(g.senders)
        receivers = np.asarray(g.receivers)
        for i in range(n):
            if edge_feat is None:
                nbrs = np.nonzero(adj[i])[0]
                kk, vv = k[nbrs], v[nbrs]
            else:
                eids = np.nonzero((receivers[: g.n_edges] == i))[0]
                nbrs = senders[eids]
                kk = k[nbrs] + ek[eids]
                vv = v[nbrs] + ek[eids]
            if len(nbrs) == 0:
                continue
            logits = np.einsum("hc,khc->kh", q[i], kk) / np.sqrt(C)
            e = np.exp(logits - logits.max(axis=0))
            attn = e / e.sum(axis=0)
            out[i] = np.einsum("kh,khc->hc", attn, vv)
        skip = lin("lin_skip", xq)
        return out.mean(axis=1) + skip

    @pytest.mark.parametrize("backend", ["segment", "dense"])
    def test_matches_dense_math(self, setup, backend):
        g, adj, x, n = setup
        variables, out = _init_and_apply(
            TransformerConv, dict(features=16, heads=4, backend=backend), g, x
        )
        expected = self._reference(variables, x, adj, g=g)
        np.testing.assert_allclose(out[:n], expected, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("backend", ["segment", "dense"])
    def test_edge_conditioning(self, setup, backend):
        g, adj, x, n = setup
        variables, out = _init_and_apply(
            TransformerConv,
            dict(features=16, heads=4, edge_dim=4, backend=backend),
            g, x,
        )
        ef = np.asarray(g.edge_feat)
        expected = self._reference(variables, x, adj, edge_feat=ef, g=g)
        np.testing.assert_allclose(out[:n], expected, rtol=1e-4, atol=1e-5)

    def test_backends_agree_with_edges(self, setup):
        g, adj, x, n = setup
        mod = TransformerConv(features=16, heads=4, edge_dim=4, backend="segment")
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
        out_s = mod.apply(variables, jnp.asarray(x), g)
        out_d = TransformerConv(
            features=16, heads=4, edge_dim=4, backend="dense"
        ).apply(variables, jnp.asarray(x), g)
        np.testing.assert_allclose(
            np.asarray(out_s)[:n], np.asarray(out_d)[:n], rtol=1e-4, atol=1e-5
        )
