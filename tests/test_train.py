"""End-to-end training tests: loss decreases, checkpoints round-trip, resume."""

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
from gnn_bfs_rans_tpu.train.loop import init_state, make_train_step


@pytest.fixture(scope="module")
def small_dataset():
    return load_dataset(
        "/root/reference/OpenFOAM-data", ["0", "100", "200", "282"]
    )


class TestDataset:
    def test_reference_default_yields_three_samples(self, small_dataset):
        """Quirk 2: t=0 (uniform ICs) excluded by default → 3 samples."""
        assert small_dataset.time_dirs == ["100", "200", "282"]
        assert small_dataset.targets.shape == (3, 12288, 7)

    def test_include_uniform(self):
        ds = load_dataset(
            "/root/reference/OpenFOAM-data", ["0", "282"], include_uniform=True
        )
        assert ds.time_dirs == ["0", "282"]

    def test_targets_normalized(self, small_dataset):
        t = small_dataset.targets
        mask = np.asarray(small_dataset.graph.node_mask)
        real = t[:, mask, :]
        # pooled stats across snapshots should be ~N(0,1) per channel
        # (z-velocity is identically 0 → std floored, mean stays 0)
        assert abs(real[..., 0].mean()) < 1e-6
        assert abs(real[..., 3].mean()) < 1e-6
        np.testing.assert_allclose(real.reshape(-1, 7)[:, 0].std(), 1.0, rtol=1e-5)


class TestTrainStep:
    def test_loss_decreases(self, small_dataset):
        cfg = ModelConfig(hidden_dim=32, num_layers=2, layer_type="GCN")
        tcfg = TrainConfig(lr=1e-3, epochs=1)
        model = FlowGNN(cfg)
        graph = small_dataset.graph
        state = init_state(model, graph, tcfg, jax.random.PRNGKey(0))
        step = make_train_step(model, tcfg)
        targets = jnp.asarray(small_dataset.targets)
        losses = []
        rng = jax.random.PRNGKey(1)
        for i in range(30):
            rng, sk = jax.random.split(rng)
            state, loss = step(
                state, graph, targets, jnp.asarray(1e-3, jnp.float32), sk
            )
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.7, losses[::10]

    @pytest.mark.parametrize("layer_type", ["GCN", "GAT"])
    def test_remat_matches_plain_gradients(self, small_dataset, layer_type):
        """cfg.remat recomputes conv activations in the backward — the
        gradients must be bit-identical math to the plain path."""
        from gnn_bfs_rans_tpu.train.normalization import weighted_fieldwise_mse

        graph = small_dataset.graph
        targets = jnp.asarray(small_dataset.targets[:1])
        grads = {}
        for remat in (False, True):
            cfg = ModelConfig(hidden_dim=16, num_layers=2,
                              layer_type=layer_type, dropout=0.0, remat=remat)
            model = FlowGNN(cfg)
            variables = model.init(jax.random.PRNGKey(0), graph, train=False)

            def loss_fn(params):
                out, _ = model.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    graph, train=True, mutable=["batch_stats"],
                )
                return weighted_fieldwise_mse(out, targets[0], graph.node_mask)

            grads[remat] = jax.grad(loss_fn)(variables["params"])
        for a, b in zip(jax.tree.leaves(grads[False]),
                        jax.tree.leaves(grads[True])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)

    def test_eval_errors_match_concatenated(self, small_dataset):
        """Per-snapshot-mean errors == reference's concatenate-then-mean
        (train.py:241-264): exactly equal on a shared mesh (PARITY.md #7)."""
        from gnn_bfs_rans_tpu.train.loop import make_eval_step
        from gnn_bfs_rans_tpu.train.metrics import compute_field_errors

        cfg = ModelConfig(hidden_dim=16, num_layers=1, layer_type="GCN")
        tcfg = TrainConfig()
        model = FlowGNN(cfg)
        graph = small_dataset.graph
        state = init_state(model, graph, tcfg, jax.random.PRNGKey(0))
        targets = jnp.asarray(small_dataset.targets[:2])

        _, errors, out = make_eval_step(model, tcfg)(state, graph, targets)

        # reference formulation: concatenate snapshots along nodes, one mean
        out_cat = jnp.concatenate([out, out], axis=0)
        tgt_cat = jnp.concatenate([targets[0], targets[1]], axis=0)
        mask_cat = jnp.concatenate([graph.node_mask, graph.node_mask])
        ref = compute_field_errors(out_cat, tgt_cat, mask_cat)
        for k in errors:
            np.testing.assert_allclose(
                float(errors[k]), float(ref[k]), rtol=1e-6
            )

    def test_pressure_freeze_masks_gradients(self, small_dataset):
        cfg = ModelConfig(hidden_dim=16, num_layers=1, layer_type="GCN",
                          dropout=0.0, use_batch_norm=False)
        tcfg = TrainConfig(lr=1e-2)
        model = FlowGNN(cfg)
        graph = small_dataset.graph
        state = init_state(model, graph, tcfg, jax.random.PRNGKey(0))
        step = make_train_step(model, tcfg)
        targets = jnp.asarray(small_dataset.targets)
        k0 = np.asarray(state.params["out_3"]["kernel"]).copy()
        b0 = np.asarray(state.params["out_3"]["bias"]).copy()
        state, _ = step(
            state, graph, targets, jnp.asarray(1e-2, jnp.float32),
            jax.random.PRNGKey(2), freeze_pressure=True,
        )
        k1 = np.asarray(state.params["out_3"]["kernel"])
        b1 = np.asarray(state.params["out_3"]["bias"])
        # pressure column untouched (weight decay contributes but is masked too)
        np.testing.assert_allclose(k1[:, 3], k0[:, 3], atol=1e-12)
        np.testing.assert_allclose(b1[3], b0[3], atol=1e-12)
        # other columns moved
        assert np.abs(k1[:, 0] - k0[:, 0]).max() > 1e-6


class TestPlateauScheduler:
    def test_reduces_after_patience(self):
        sched = ReduceLROnPlateau(1.0, factor=0.5, patience=2, threshold=1e-4)
        lrs = [sched.step(1.0) for _ in range(10)]
        # first call sets best; 2 bad epochs tolerated, 3rd reduces
        assert lrs[:3] == [1.0, 1.0, 1.0]
        assert lrs[3] == 0.5
        assert lrs[7] == 0.25

    def test_improvement_resets(self):
        sched = ReduceLROnPlateau(1.0, factor=0.5, patience=2)
        sched.step(1.0)
        sched.step(0.99)  # > 1e-4 rel improvement → resets
        sched.step(1.0)
        sched.step(1.0)
        assert sched.lr == 1.0
        assert sched.step(1.0) == 0.5


class TestTrainerEndToEnd:
    def test_short_run_and_resume(self, small_dataset, tmp_path):
        mcfg = ModelConfig(hidden_dim=32, num_layers=2, layer_type="GCN")
        tcfg = TrainConfig(lr=1e-3, epochs=2, save_every=1, batch_size=1)
        tr = Trainer(small_dataset, mcfg, tcfg, output_dir=tmp_path, log_fn=lambda *a: None)
        hist = tr.train()
        assert hist["epoch"] == [1, 2]
        assert (tmp_path / "best").exists()
        assert (tmp_path / "epoch_2").exists()
        hist_file = json.loads((tmp_path / "training_history.json").read_text())
        assert set(hist_file) == {
            "epoch", "train_loss", "val_loss", "field_errors", "learning_rate"
        }
        assert set(hist_file["field_errors"]) == {"U", "p", "k", "epsilon", "nut"}

        # resume continues at epoch 3
        tcfg2 = TrainConfig(lr=1e-3, epochs=3, save_every=1, batch_size=1)
        tr2 = Trainer(small_dataset, mcfg, tcfg2, output_dir=tmp_path, log_fn=lambda *a: None)
        tr2.initialize(resume=True)
        assert tr2.start_epoch == 3
        hist2 = tr2.train()
        assert hist2["epoch"][-1] == 3

        # metrics.jsonl has exactly one row per epoch after resume (no
        # double-append of already-recorded epochs)
        rows = [json.loads(l) for l in
                (tmp_path / "metrics.jsonl").read_text().splitlines()]
        assert [r["epoch"] for r in rows] == [1, 2, 3]

    def test_predictor_round_trip(self, small_dataset, tmp_path):
        from gnn_bfs_rans_tpu.infer import Predictor

        mcfg = ModelConfig(hidden_dim=32, num_layers=2, layer_type="GCN")
        tcfg = TrainConfig(lr=1e-3, epochs=1, save_every=5)
        tr = Trainer(small_dataset, mcfg, tcfg, output_dir=tmp_path, log_fn=lambda *a: None)
        tr.train()
        pred = Predictor.from_checkpoint(tmp_path, "best")
        fields = pred.predict_fields(small_dataset.graph)
        assert fields["U"].shape == (12225, 3)
        assert fields["p"].shape == (12225, 1)
        # denormalized predictions are in physical units (p std ≈ 4+)
        assert np.isfinite(fields["U"]).all()
        # forward through loaded params equals trainer's final params forward
        # (trainer output is in graph/RCM order; predictor un-permutes)
        packed_trained = np.asarray(
            tr.eval_step(tr.state, tr.graph, tr.targets)[2]
        )[:12225]
        g = small_dataset.graph
        if g.perm is not None:
            unperm = np.empty_like(packed_trained)
            unperm[np.asarray(g.perm)[:12225]] = packed_trained
            packed_trained = unperm
        packed_loaded = pred.predict_packed(small_dataset.graph)
        np.testing.assert_allclose(
            packed_trained, packed_loaded, rtol=1e-5, atol=1e-6
        )


class TestPallasCheckpointInference:
    def test_predict_case_builds_band_for_pallas_checkpoint(self, tmp_path):
        """A pallas-backend checkpoint gets a banded graph at inference."""
        import jax

        from gnn_bfs_rans_tpu.infer import predict_case
        from gnn_bfs_rans_tpu.train import (
            FieldNormalizer,
            TrainConfig,
            load_dataset,
            save_checkpoint,
        )
        from gnn_bfs_rans_tpu.train.loop import init_state

        ds = load_dataset(
            "/root/reference/OpenFOAM-data", ["282"], with_band=True,
            band_components=("gcn",),
        )
        mcfg = ModelConfig(hidden_dim=16, num_layers=1, layer_type="GCN",
                           dropout=0.0, backend="pallas")
        tcfg = TrainConfig()
        model = FlowGNN(mcfg)
        state = init_state(model, ds.graph, tcfg, jax.random.PRNGKey(0))
        save_checkpoint(
            tmp_path, "best", state, epoch=1, val_loss=0.0,
            model_config=mcfg, train_config=tcfg, normalizer=ds.normalizer,
        )
        # default: backend overridden to dense for fast one-shot inference
        _, fields, graph = predict_case(tmp_path, "/root/reference/OpenFOAM-data")
        assert graph.band is None
        assert fields["U"].shape == (12225, 3)
        assert np.isfinite(fields["U"]).all()
        # honoring the training backend builds the band component it needs
        _, fields2, graph2 = predict_case(
            tmp_path, "/root/reference/OpenFOAM-data", backend=None
        )
        assert graph2.band is not None and graph2.band.gcn is not None
        np.testing.assert_allclose(fields2["U"], fields["U"], rtol=1e-4,
                                   atol=1e-5)


class TestTrainerAOT:
    def test_blocked_train_uses_aot_cache(self, small_dataset, tmp_path):
        """AOT for the TRAINING path (VERDICT r3 item 6): the blocked loop's
        epoch-block executables serialize to <output_dir>/aot, and a second
        cold trainer reuses them with identical results."""
        mcfg = ModelConfig(hidden_dim=32, num_layers=2, layer_type="GCN")
        tcfg = TrainConfig(lr=1e-3, epochs=4, save_every=4, batch_size=1,
                           epoch_block=2)
        tr = Trainer(small_dataset, mcfg, tcfg, output_dir=tmp_path,
                     log_fn=lambda *a: None, aot=True)
        hist = tr.train()
        assert hist["epoch"] == [1, 2, 3, 4]
        pkls = list((tmp_path / "aot").glob("aot_*.pkl"))
        assert pkls, "epoch-block executable must be serialized"

        # fresh trainer, same config: cache hit (no new entries), same loss
        tr2 = Trainer(small_dataset, mcfg, tcfg, output_dir=tmp_path / "run2",
                      log_fn=lambda *a: None, aot=True)
        tr2.aot_dir = tmp_path / "aot"  # share the cache dir
        hist2 = tr2.train()
        assert len(list((tmp_path / "aot").glob("aot_*.pkl"))) == len(pkls)
        np.testing.assert_allclose(
            hist["train_loss"], hist2["train_loss"], rtol=1e-6)

    def test_aot_off_by_default_on_cpu(self, small_dataset, tmp_path):
        tr = Trainer(small_dataset,
                     ModelConfig(hidden_dim=32, num_layers=2),
                     TrainConfig(epochs=1), output_dir=tmp_path,
                     log_fn=lambda *a: None)  # aot='auto' → off on CPU
        assert tr.aot_dir is None


class TestBNRecalibration:
    def test_recalibrate_closes_eval_gap(self, small_dataset, tmp_path):
        """BN re-estimation (Predictor.recalibrate_bn): after replacing the
        running stats with one exact dropout-free pass, eval-mode output
        matches the deterministic train-mode forward (VERDICT r4 accuracy
        diagnosis: EMA lag + bf16 batch-stat noise put a floor under
        eval-mode loss)."""
        import jax

        from gnn_bfs_rans_tpu.infer import Predictor

        mcfg = ModelConfig(hidden_dim=32, num_layers=2, layer_type="GCN",
                           dropout=0.1)
        # few epochs: running stats are far from converged → a real gap
        tcfg = TrainConfig(lr=1e-3, epochs=3, save_every=3, batch_size=1)
        tr = Trainer(small_dataset, mcfg, tcfg, output_dir=tmp_path,
                     log_fn=lambda *a: None)
        tr.train()
        pred = Predictor.from_checkpoint(tmp_path, "best", backend=None)
        g = small_dataset.graph.to_device()

        out_eval_before = pred.model.apply(
            {"params": pred.params, "batch_stats": pred.batch_stats},
            g, train=False)
        pred.recalibrate_bn(g)
        out_eval_after = pred.model.apply(
            {"params": pred.params, "batch_stats": pred.batch_stats},
            g, train=False)
        import dataclasses as _dc

        model0 = type(pred.model)(_dc.replace(pred.model_config, dropout=0.0))
        out_train, _ = model0.apply(
            {"params": pred.params, "batch_stats": pred.batch_stats},
            g, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})

        gap_before = float(jnp.abs(out_eval_before - out_train).max())
        gap_after = float(jnp.abs(out_eval_after - out_train).max())
        assert gap_after < gap_before * 0.05, (gap_before, gap_after)
        # residual ~2e-4: the EMA inversion divides by momentum (0.1),
        # amplifying f32 rounding of the stored stats 10x — still ~100x
        # tighter than the pre-recalibration gap
        assert gap_after < 1e-3


class TestTrainTimeBNRecal:
    """Round-5: bn_recal folds the BN re-estimation into TRAINING — val loss
    and best-model selection run on exact batch statistics, and checkpoints
    are saved recalibrated (VERDICT r4 item 1)."""

    def test_resolve_modes(self):
        from gnn_bfs_rans_tpu.train.recal import resolve_bn_recal

        f32 = ModelConfig()
        bf16 = ModelConfig(compute_dtype="bfloat16")
        ln = ModelConfig(compute_dtype="bfloat16", norm_type="layer")
        assert resolve_bn_recal("auto", f32) is False
        assert resolve_bn_recal("auto", bf16) is True
        assert resolve_bn_recal("auto", ln) is False  # nothing to recalibrate
        assert resolve_bn_recal("on", f32) is True
        assert resolve_bn_recal("on", ln) is False
        assert resolve_bn_recal("off", bf16) is False
        with pytest.raises(ValueError):
            resolve_bn_recal("maybe", f32)

    def test_checkpoint_saved_with_exact_stats(self, small_dataset, tmp_path):
        """With bn_recal on, the saved checkpoint's eval-mode forward matches
        the deterministic train-mode forward (no EMA gap left to recover)."""
        import dataclasses as _dc

        from gnn_bfs_rans_tpu.infer import Predictor

        mcfg = ModelConfig(hidden_dim=32, num_layers=2, layer_type="GCN",
                           dropout=0.1)
        tcfg = TrainConfig(lr=1e-3, epochs=3, save_every=3, batch_size=1,
                           bn_recal="on")
        tr = Trainer(small_dataset, mcfg, tcfg, output_dir=tmp_path,
                     log_fn=lambda *a: None)
        assert tr.bn_recal is True
        tr.train()

        from gnn_bfs_rans_tpu.train.checkpoint import load_meta

        assert load_meta(tmp_path, "best").get("bn_recalibrated") is True

        pred = Predictor.from_checkpoint(tmp_path, "best", backend=None)
        g = small_dataset.graph.to_device()
        out_eval = pred.model.apply(
            {"params": pred.params, "batch_stats": pred.batch_stats},
            g, train=False)
        model0 = type(pred.model)(_dc.replace(pred.model_config, dropout=0.0))
        out_train, _ = model0.apply(
            {"params": pred.params, "batch_stats": pred.batch_stats},
            g, train=True, mutable=["batch_stats"])
        gap = float(jnp.abs(out_eval - out_train).max())
        # eval ≈ deterministic train forward directly off disk (residual:
        # EMA-inversion f32 rounding + biased/unbiased var at n=12225)
        assert gap < 1e-3, gap

    def test_blocked_loop_recal_val_is_exact_stats_loss(
        self, small_dataset, tmp_path
    ):
        """In the device-resident epoch block, the recorded val loss equals
        the exact-batch-stats eval loss of the block-end state."""
        from gnn_bfs_rans_tpu.train.loop import make_eval_body

        mcfg = ModelConfig(hidden_dim=32, num_layers=2, layer_type="GCN",
                           dropout=0.0)
        tcfg = TrainConfig(lr=1e-3, epochs=4, save_every=4, batch_size=3,
                           epoch_block=4, bn_recal="on")
        tr = Trainer(small_dataset, mcfg, tcfg, output_dir=tmp_path,
                     log_fn=lambda *a: None)
        hist = tr.train()
        assert len(hist["val_loss"]) == 4
        loss, _, _ = jax.jit(make_eval_body(tr.model, tcfg, recal=True))(
            tr.state, tr.graph, tr.targets
        )
        np.testing.assert_allclose(
            hist["val_loss"][-1], float(loss), rtol=1e-6
        )

    def test_exact_bn_predictor_matches_recal_eval(
        self, small_dataset, tmp_path
    ):
        """A recal-trained checkpoint auto-selects the arithmetic-consistent
        train-mode forward at inference, reproducing the training metric's
        forward exactly (round-5: the eval-mode affine's ~2e-4 numerical
        differences re-roll reduced-precision rounding at sensitive nodes)."""
        from gnn_bfs_rans_tpu.infer import Predictor
        from gnn_bfs_rans_tpu.train.loop import make_eval_body

        mcfg = ModelConfig(hidden_dim=32, num_layers=2, layer_type="GCN",
                           dropout=0.1)
        tcfg = TrainConfig(lr=1e-3, epochs=2, save_every=2, bn_recal="on")
        tr = Trainer(small_dataset, mcfg, tcfg, output_dir=tmp_path,
                     log_fn=lambda *a: None)
        tr.train()
        pred = Predictor.from_checkpoint(tmp_path, "best", backend=None)
        assert pred.exact_bn is True  # auto from meta['bn_recalibrated']
        g = small_dataset.graph.to_device()
        out = pred._run_forward(g)
        _, _, out_recal = jax.jit(make_eval_body(tr.model, tcfg, recal=True))(
            tr.state, tr.graph, tr.targets
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(out_recal), rtol=0, atol=1e-6
        )
        # off/default-eval predictor still works and agrees closely in f32
        pred_off = Predictor.from_checkpoint(
            tmp_path, "best", backend=None, exact_bn=False
        )
        assert pred_off.exact_bn is False
        out_off = pred_off._run_forward(g)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(out_off), rtol=0, atol=1e-3
        )

    def test_recal_default_off_for_f32(self, small_dataset, tmp_path):
        """auto keeps reference-parity eval semantics for f32 models."""
        mcfg = ModelConfig(hidden_dim=16, num_layers=2)
        tcfg = TrainConfig(epochs=1)
        tr = Trainer(small_dataset, mcfg, tcfg, output_dir=tmp_path,
                     log_fn=lambda *a: None)
        assert tr.bn_recal is False


class TestShowcaseCheckpoint:
    def test_shipped_checkpoint_loads_and_predicts(self):
        """The committed examples/showcase_checkpoint must stay loadable and
        produce physical-range predictions (guards repo artifact corruption;
        the reference ships no trained checkpoint at all)."""
        from pathlib import Path

        from gnn_bfs_rans_tpu.infer import predict_case

        ckpt = Path(__file__).resolve().parents[1] / "examples" / "showcase_checkpoint"
        if not ckpt.exists():
            import pytest

            pytest.skip("showcase checkpoint not present")
        _, fields, graph = predict_case(ckpt, "/root/reference/OpenFOAM-data")
        assert fields["U"].shape == (12225, 3)
        assert np.isfinite(fields["U"]).all()
        # trained surrogate: bulk velocity scale ~O(1-10) m/s, not garbage
        assert 0.5 < np.abs(fields["U"]).max() < 50
