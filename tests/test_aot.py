"""Precompiled-executable cache (utils.aot): round-trip, fallback, Predictor."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from gnn_bfs_rans_tpu.utils.aot import load_or_compile


def test_round_trip_and_cache_hit(tmp_path):
    @jax.jit
    def f(x, y):
        return {"s": x @ y, "t": jnp.sum(x)}

    x = jnp.asarray(np.arange(12.0, dtype=np.float32).reshape(3, 4))
    y = jnp.asarray(np.ones((4, 2), np.float32))

    c1 = load_or_compile(f, (x, y), tmp_path)
    out1 = c1(x, y)
    files = list(tmp_path.glob("aot_*.pkl"))
    assert len(files) == 1, "executable must be serialized to disk"

    # second load must come from the cache file (same key) and agree
    c2 = load_or_compile(f, (x, y), tmp_path)
    out2 = c2(x, y)
    np.testing.assert_allclose(np.asarray(out1["s"]), np.asarray(out2["s"]))
    np.testing.assert_allclose(np.asarray(out1["s"]),
                               np.asarray(f(x, y)["s"]))
    assert len(list(tmp_path.glob("aot_*.pkl"))) == 1


def test_different_shapes_get_different_entries(tmp_path):
    @jax.jit
    def f(x):
        return x * 2.0

    load_or_compile(f, (jnp.ones((4,)),), tmp_path)
    load_or_compile(f, (jnp.ones((8,)),), tmp_path)
    assert len(list(tmp_path.glob("aot_*.pkl"))) == 2


def test_corrupt_cache_falls_back(tmp_path, recwarn):
    @jax.jit
    def f(x):
        return x + 1.0

    x = jnp.ones((4,))
    load_or_compile(f, (x,), tmp_path)
    (file,) = tmp_path.glob("aot_*.pkl")
    file.write_bytes(pickle.dumps({"serialized": b"garbage"}))
    c = load_or_compile(f, (x,), tmp_path)
    np.testing.assert_allclose(np.asarray(c(x)), np.asarray(x) + 1.0)
    assert any("AOT cache load failed" in str(w.message) for w in recwarn.list)


def test_predictor_uses_aot_cache(tmp_path):
    """End-to-end: train one step, save, predict twice — the second
    Predictor must hit the serialized executable and agree exactly."""
    import jax

    from gnn_bfs_rans_tpu.infer import Predictor
    from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig
    from gnn_bfs_rans_tpu.train import TrainConfig, load_dataset
    from gnn_bfs_rans_tpu.train.checkpoint import save_checkpoint
    from gnn_bfs_rans_tpu.train.loop import init_state

    ds = load_dataset("/root/reference/OpenFOAM-data", ["282"])
    mcfg = ModelConfig(hidden_dim=16, num_layers=1, layer_type="GCN",
                       dropout=0.0)
    tcfg = TrainConfig()
    model = FlowGNN(mcfg)
    state = init_state(model, ds.graph, tcfg, jax.random.PRNGKey(0))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(ckpt, "best", state, epoch=1, val_loss=1.0,
                    model_config=mcfg, train_config=tcfg,
                    normalizer=ds.normalizer)

    p1 = Predictor.from_checkpoint(ckpt, backend="dense", aot=True)
    out1 = p1.predict_packed(ds.graph)
    assert (ckpt / "aot").exists() and list((ckpt / "aot").glob("aot_*.pkl"))

    p2 = Predictor.from_checkpoint(ckpt, backend="dense", aot=True)
    out2 = p2.predict_packed(ds.graph)
    np.testing.assert_array_equal(out1, out2)

    # default 'auto' is off on CPU (XLA:CPU AOT deserialization is not
    # reliable across host machine features); forward must still agree
    p3 = Predictor.from_checkpoint(ckpt, backend="dense")
    assert p3.aot_dir is None or jax.default_backend() == "tpu"
    np.testing.assert_allclose(p3.predict_packed(ds.graph), out1,
                               rtol=1e-6, atol=1e-7)
