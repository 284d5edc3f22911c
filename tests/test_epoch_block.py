"""Device-resident epoch-block training (loop.make_epoch_block).

The blocked loop must reproduce the host loop's semantics: the on-device
plateau scheduler matches the host ReduceLROnPlateau state machine, a block
of K epochs equals K blocks of 1 epoch, and the Trainer's blocked mode cuts
blocks at save_every/curriculum boundaries with exact checkpoint cadence.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig
from gnn_bfs_rans_tpu.train import (
    ReduceLROnPlateau,
    TrainConfig,
    Trainer,
    load_dataset,
)
from gnn_bfs_rans_tpu.train.loop import (
    init_epoch_block_carry,
    init_state,
    make_epoch_block,
    plateau_init,
    plateau_update,
)


@pytest.fixture(scope="module")
def dataset():
    return load_dataset("/root/reference/OpenFOAM-data", ["100", "200", "282"])


class TestPlateauUpdate:
    def test_matches_host_scheduler(self):
        cfg = TrainConfig(lr=1.0, plateau_factor=0.5, plateau_patience=2,
                          plateau_threshold=1e-4)
        host = ReduceLROnPlateau(1.0, factor=0.5, patience=2, threshold=1e-4)
        dev = plateau_init(1.0)
        rng = np.random.default_rng(0)
        metrics = [1.0, 0.9, 0.9, 0.9, 0.9, 0.5, 0.5001, 0.6, 0.7, 0.7]
        metrics += list(rng.uniform(0.3, 0.5, 30))
        step = jax.jit(lambda s, m: plateau_update(s, m, cfg))
        for m in metrics:
            host_lr = host.step(m)
            dev = step(dev, jnp.asarray(m, jnp.float32))
            assert float(dev.lr) == pytest.approx(host_lr, rel=1e-6), m
        assert float(dev.best) == pytest.approx(host.best, rel=1e-6)

    def test_min_lr_floor(self):
        cfg = TrainConfig(lr=1.0, plateau_factor=0.5, plateau_patience=0,
                          plateau_min_lr=0.3)
        dev = plateau_init(1.0)
        for _ in range(10):
            dev = plateau_update(dev, jnp.asarray(1.0, jnp.float32), cfg)
        assert float(dev.lr) == pytest.approx(0.3)


class TestEpochBlock:
    def _setup(self, dataset, **tkw):
        mcfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GCN",
                           dropout=0.0)
        tcfg = TrainConfig(lr=1e-3, **tkw)
        model = FlowGNN(mcfg)
        graph = dataset.graph
        targets = jnp.asarray(dataset.targets)
        state = init_state(model, graph, tcfg, jax.random.PRNGKey(0))
        return model, tcfg, graph, targets, state

    def test_block_equals_sequential_singles(self, dataset):
        model, tcfg, graph, targets, state = self._setup(dataset)
        block_fn = make_epoch_block(model, tcfg, targets.shape[0])
        c_a = init_epoch_block_carry(state, tcfg.lr, jax.random.PRNGKey(7))
        c_a, outs_a = block_fn(c_a, graph, targets,
                               jnp.asarray(0, jnp.int32), n_epochs=4)

        # the carry is donated → rebuild state/key (same seeds → identical)
        _, _, _, _, state = self._setup(dataset)
        c_b = init_epoch_block_carry(state, tcfg.lr, jax.random.PRNGKey(7))
        singles = []
        for e in range(4):
            c_b, o = block_fn(c_b, graph, targets,
                              jnp.asarray(e, jnp.int32), n_epochs=1)
            singles.append(o)

        np.testing.assert_allclose(
            np.asarray(outs_a["train_loss"]),
            np.concatenate([np.asarray(o["train_loss"]) for o in singles]),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(outs_a["val_loss"]),
            np.concatenate([np.asarray(o["val_loss"]) for o in singles]),
            rtol=1e-6,
        )
        for la, lb in zip(jax.tree.leaves(c_a.state.params),
                          jax.tree.leaves(c_b.state.params)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-6, atol=1e-7)

    def test_best_tracking(self, dataset):
        model, tcfg, graph, targets, state = self._setup(dataset)
        block_fn = make_epoch_block(model, tcfg, targets.shape[0])
        carry = init_epoch_block_carry(state, tcfg.lr, jax.random.PRNGKey(1))
        carry, outs = block_fn(carry, graph, targets,
                               jnp.asarray(0, jnp.int32), n_epochs=5)
        vals = np.asarray(outs["val_loss"])
        assert float(carry.best_val) == pytest.approx(vals.min(), rel=1e-6)
        assert int(carry.best_epoch) == int(np.argmin(vals)) + 1

    def test_rejects_indivisible_batches(self, dataset):
        model, tcfg, graph, targets, state = self._setup(dataset, batch_size=2)
        with pytest.raises(ValueError, match="divisible"):
            make_epoch_block(model, tcfg, targets.shape[0])

    def test_cosine_lr_schedule(self, dataset):
        model, tcfg, graph, targets, state = self._setup(
            dataset, epochs=8, scheduler="cosine")
        block_fn = make_epoch_block(model, tcfg, targets.shape[0])
        carry = init_epoch_block_carry(state, tcfg.lr, jax.random.PRNGKey(1))
        carry, outs = block_fn(carry, graph, targets,
                               jnp.asarray(0, jnp.int32), n_epochs=8)
        lrs = np.asarray(outs["lr"])
        expect = [
            0.5 * tcfg.lr * (1 + np.cos(np.pi * e / 7.0)) for e in range(8)
        ]
        np.testing.assert_allclose(lrs, expect, rtol=1e-5)


class TestTrainerBlocked:
    def test_blocked_run_history_and_checkpoints(self, dataset, tmp_path):
        mcfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GCN",
                           dropout=0.0)
        tcfg = TrainConfig(lr=1e-3, epochs=6, save_every=2, batch_size=1,
                           epoch_block=3)
        tr = Trainer(dataset, mcfg, tcfg, output_dir=tmp_path,
                     log_fn=lambda *a: None)
        hist = tr.train()
        assert hist["epoch"] == [1, 2, 3, 4, 5, 6]
        assert all(np.isfinite(hist["train_loss"]))
        assert (tmp_path / "best").exists()
        for e in (2, 4, 6):
            assert (tmp_path / f"epoch_{e}").exists()
        hist_file = json.loads((tmp_path / "training_history.json").read_text())
        assert set(hist_file) == {
            "epoch", "train_loss", "val_loss", "field_errors", "learning_rate"
        }
        # metrics.jsonl has one line per epoch
        lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
        assert len(lines) == 6

    def test_blocked_resume(self, dataset, tmp_path):
        mcfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GCN",
                           dropout=0.0)
        tcfg = TrainConfig(lr=1e-3, epochs=2, save_every=2, batch_size=1,
                           epoch_block=2)
        tr = Trainer(dataset, mcfg, tcfg, output_dir=tmp_path,
                     log_fn=lambda *a: None)
        tr.train()
        tcfg2 = TrainConfig(lr=1e-3, epochs=4, save_every=2, batch_size=1,
                            epoch_block=2)
        tr2 = Trainer(dataset, mcfg, tcfg2, output_dir=tmp_path,
                      log_fn=lambda *a: None)
        tr2.initialize(resume=True)
        assert tr2.start_epoch == 3
        hist = tr2.train()
        assert hist["epoch"][-1] == 4

    def test_blocked_curriculum_boundary(self, dataset, tmp_path):
        """Freeze phase ends exactly at curriculum_epochs; phase 2 halves LR."""
        mcfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GCN",
                           dropout=0.0)
        tcfg = TrainConfig(lr=1e-3, epochs=4, save_every=10, batch_size=1,
                           epoch_block=4, curriculum_epochs=2)
        logs = []
        tr = Trainer(dataset, mcfg, tcfg, output_dir=tmp_path,
                     log_fn=lambda *a: logs.append(" ".join(map(str, a))))
        hist = tr.train()
        assert hist["epoch"] == [1, 2, 3, 4]
        # lr halves when pressure unfreezes at epoch 3
        assert hist["learning_rate"][2] == pytest.approx(5e-4, rel=1e-6)
        assert any("phase 2" in l for l in logs)

    def test_blocked_indivisible_falls_back(self, dataset, tmp_path):
        """batch_size=2 with 3 snapshots can't scan — falls back silently."""
        mcfg = ModelConfig(hidden_dim=16, num_layers=2, layer_type="GCN",
                           dropout=0.0)
        tcfg = TrainConfig(lr=1e-3, epochs=2, save_every=2, batch_size=2,
                           epoch_block=2)
        tr = Trainer(dataset, mcfg, tcfg, output_dir=tmp_path,
                     log_fn=lambda *a: None)
        hist = tr.train()
        assert hist["epoch"] == [1, 2]
