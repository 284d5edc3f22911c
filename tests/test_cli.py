"""CLI subcommand smoke tests (flag parity with the reference scripts)."""

import json

import numpy as np
import pytest

from gnn_bfs_rans_tpu.cli.main import main

CASE = "/root/reference/OpenFOAM-data"


def test_check_data(capsys):
    rc = main(["check-data", "--case_path", CASE])
    assert rc == 0
    out = capsys.readouterr().out
    assert "cells: 12225" in out
    assert "edges: 48340" in out


def test_check_data_bad_path():
    rc = main(["check-data", "--case_path", "/nonexistent"])
    assert rc == 1


def test_check_coordinates(capsys):
    rc = main(["check-coordinates", "--case_path", CASE])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Cell center coordinate ranges" in out


@pytest.mark.slow
def test_train_infer_visualize_pipeline(tmp_path, capsys):
    """Full pipeline: train 2 epochs → infer+compare → plots."""
    ckpt = tmp_path / "ckpt"
    rc = main([
        "train", "--case_path", CASE, "--output_dir", str(ckpt),
        "--hidden_dim", "32", "--num_layers", "2", "--epochs", "2",
        "--save_every", "2",
    ])
    assert rc == 0
    assert (ckpt / "best").exists()
    assert (ckpt / "training_history.json").exists()
    assert (ckpt / "normalizer.json").exists()

    pred = tmp_path / "pred"
    rc = main([
        "infer", "--checkpoint", str(ckpt), "--case_path", CASE,
        "--output_dir", str(pred), "--reference_time", "282",
        "--save_format", "both",
    ])
    assert rc == 0
    npz = np.load(pred / "predictions.npz")
    assert npz["U"].shape == (12225, 3)
    assert (pred / "predicted" / "U").exists()
    stats = json.loads((pred / "comparison.json").read_text())
    assert set(stats) == {"U", "p", "k", "epsilon", "nut"}
    assert all(np.isfinite(s["mae"]) for s in stats.values())

    rc = main([
        "plot-training", "--history", str(ckpt / "training_history.json"),
        "--detailed",
    ])
    assert rc == 0
    assert (ckpt / "training_curves.png").exists()
    assert (ckpt / "field_errors_detailed.png").exists()

    viz = tmp_path / "viz"
    rc = main([
        "visualize", "--checkpoint", str(ckpt), "--case_path", CASE,
        "--reference_time", "282", "--output_dir", str(viz),
    ])
    assert rc == 0
    assert (viz / "U_comparison.png").exists()
    assert (viz / "error_stats.json").exists()

    rc = main([
        "plot-lines", "--checkpoint", str(ckpt), "--case_path", CASE,
        "--reference_time", "282", "--output_dir", str(viz),
    ])
    assert rc == 0
    assert (viz / "line_Y_0.005.png").exists()
    assert (viz / "line_X_0.150.png").exists()


def test_export_torch(tmp_path, capsys):
    """export-torch writes a reference-format .pt from an Orbax checkpoint."""
    import jax
    import torch

    from gnn_bfs_rans_tpu.compat import load_torch_checkpoint
    from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig
    from gnn_bfs_rans_tpu.train import (
        FieldNormalizer,
        TrainConfig,
        load_dataset,
        save_checkpoint,
    )
    from gnn_bfs_rans_tpu.train.loop import init_state

    ds = load_dataset(CASE, ["282"])
    mcfg = ModelConfig(hidden_dim=16, num_layers=1, layer_type="GCN",
                       dropout=0.0)
    tcfg = TrainConfig()
    model = FlowGNN(mcfg)
    state = init_state(model, ds.graph, tcfg, jax.random.PRNGKey(0))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(ckpt, "best", state, epoch=3, val_loss=0.9,
                    model_config=mcfg, train_config=tcfg,
                    normalizer=ds.normalizer)

    out = tmp_path / "exported.pt"
    rc = main(["export-torch", "--checkpoint", str(ckpt),
               "--output", str(out)])
    assert rc == 0
    assert "reference torch format" in capsys.readouterr().out

    raw = torch.load(out, map_location="cpu", weights_only=False)
    assert raw["epoch"] == 3
    assert raw["config"]["layer_type"] == "GCN"
    params, batch_stats, cfg, norm = load_torch_checkpoint(str(out))
    out1 = model.apply({"params": state.params,
                        "batch_stats": state.batch_stats}, ds.graph,
                       train=False)
    out2 = model.apply({"params": params, "batch_stats": batch_stats},
                       ds.graph, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5, atol=1e-6)
    assert norm is not None and "U" in norm.scalers


def test_train_multitopo_cli(tmp_path, capsys):
    """Bucketed multi-topology training end to end through the CLI."""
    from gnn_bfs_rans_tpu.foam.casegen import generate_box_case

    a, b = tmp_path / "case_a", tmp_path / "case_b"
    generate_box_case(a, 4, 4, 3, time_dirs=("282",))
    generate_box_case(b, 8, 6, 4, time_dirs=("282",))
    out = tmp_path / "mt_out"
    rc = main([
        "train-multitopo", "--case_paths", str(a), str(b),
        "--output_dir", str(out), "--epochs", "3",
        "--hidden_dim", "16", "--num_layers", "1",
        "--node_align", "128", "--edge_align", "512",
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "2 bucket(s)" in text
    assert (out / "training_history.json").exists()
    assert (out / "best").exists()


def test_infer_boundary_self_loops(tmp_path, capsys):
    """--boundary_self_loops builds the reference's unfiltered-inference
    graph variant (inference.py:256): +1 self-edge per boundary face."""
    ckpt = tmp_path / "ckpt"
    rc = main([
        "train", "--case_path", CASE, "--output_dir", str(ckpt),
        "--hidden_dim", "16", "--num_layers", "1", "--epochs", "1",
        "--save_every", "1",
    ])
    assert rc == 0

    pred = tmp_path / "pred"
    rc = main([
        "infer", "--checkpoint", str(ckpt), "--case_path", CASE,
        "--output_dir", str(pred), "--boundary_self_loops",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    # 48,340 bidirectional internal edges + 25,010 boundary self-loops
    assert "12225 nodes, 73350 edges" in out
    npz = np.load(pred / "predictions.npz")
    assert npz["U"].shape == (12225, 3)  # node count unchanged


def test_train_progress_bar(tmp_path):
    """--progress runs the live tqdm bar through both trainer loops."""
    from gnn_bfs_rans_tpu.models.flow_gnn import ModelConfig
    from gnn_bfs_rans_tpu.train import TrainConfig, Trainer, load_dataset

    ds = load_dataset(CASE)
    for block in (1, 2):
        tcfg = TrainConfig(epochs=2, save_every=2, epoch_block=block)
        mcfg = ModelConfig(hidden_dim=16, num_layers=1)
        tr = Trainer(ds, mcfg, tcfg, output_dir=tmp_path / f"b{block}",
                     progress=True)
        tr.initialize()
        hist = tr.train()
        assert hist["epoch"] == [1, 2]
        assert tr._pbar is None  # bar closed, log restored
        assert tr.log is print
