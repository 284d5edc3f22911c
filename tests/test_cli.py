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
