"""Command-line interface: train / infer / visualize / plot-lines /
plot-training / check-data / check-coordinates / bench.

Flag parity with the reference's per-script argparse CLIs
(``train.py:267-300``, ``inference.py:224-240``, ``visualize.py:402-423``,
``plot_lines.py:231-250``, ``plot_training.py:168-177``,
``test_data_loading.py``, ``check_coordinates.py``) unified under one
entry point: ``python -m gnn_bfs_rans_tpu <subcommand> [flags]``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np


def _add_case_arg(p, default="OpenFOAM-data"):
    p.add_argument("--case_path", type=str, default=default,
                   help="Path to OpenFOAM case directory")


def cmd_train(args) -> int:
    from ..models.flow_gnn import ModelConfig
    from ..train import TrainConfig, Trainer, load_dataset

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    cfg_dict = {k: v for k, v in vars(args).items() if k not in ("func",)}
    (out_dir / "config.json").write_text(json.dumps(cfg_dict, indent=2))

    print("Loading dataset...")
    from ..graph.band import LAYER_COMPONENTS

    dataset = load_dataset(
        args.case_path, args.time_dirs, include_uniform=args.include_uniform,
        with_band=(args.backend == "pallas"),
        band_components=LAYER_COMPONENTS.get(args.layer_type),
    )
    print(f"Loaded {dataset.n_snapshots} samples: {dataset.time_dirs}")
    dataset.normalizer.save(out_dir / "normalizer.json")

    mcfg = ModelConfig(
        hidden_dim=args.hidden_dim,
        num_layers=args.num_layers,
        layer_type=args.layer_type,
        dropout=args.dropout,
        backend=args.backend,
        compute_dtype=args.compute_dtype,
        norm_type=args.norm_type,
    )
    tcfg = TrainConfig(
        lr=args.lr,
        weight_decay=args.weight_decay,
        epochs=args.epochs,
        batch_size=args.batch_size,
        pressure_ref_weight=args.pressure_ref_weight,
        curriculum_epochs=args.curriculum_epochs,
        save_every=args.save_every,
        seed=args.seed,
        plateau_min_lr=args.min_lr,
        scheduler=args.scheduler,
        epoch_block=args.epoch_block,
        bn_recal=args.bn_recal,
    )
    trainer = Trainer(dataset, mcfg, tcfg, output_dir=out_dir,
                      progress=getattr(args, "progress", False),
                      aot=(False if getattr(args, "no_aot", False) else "auto"))
    trainer.initialize(resume=args.resume)
    trainer.train()
    print("Training completed!")
    return 0


def cmd_infer(args) -> int:
    from ..foam.reader import FoamCase
    from ..foam.writer import save_fields_openfoam_format
    from ..infer import predict_case
    from ..train.metrics import compare_with_reference

    print(f"Loading model from {args.checkpoint}...")
    predictor, fields, graph = predict_case(
        args.checkpoint, args.case_path, name=args.checkpoint_name,
        boundary_self_loops=getattr(args, "boundary_self_loops", False),
        recalibrate_bn=getattr(args, "recalibrate_bn", False),
        exact_bn={"auto": "auto", "on": True, "off": False}[
            getattr(args, "bn_exact", "auto")],
    )
    print(f"Graph: {graph.n_nodes} nodes, {graph.n_edges} edges")
    print("Prediction completed!")

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if args.save_format in ("numpy", "both"):
        np.savez(out_dir / "predictions.npz", **fields)
        print(f"Saved predictions to {out_dir / 'predictions.npz'}")
    if args.save_format in ("openfoam", "both"):
        save_fields_openfoam_format(fields, out_dir, "predicted")
        print(f"Saved predictions in OpenFOAM format to {out_dir / 'predicted'}/")

    if args.reference_time:
        case = FoamCase(args.case_path)
        ref = case.load_fields(args.reference_time)
        stats = compare_with_reference(fields, ref)
        print("\n=== Field Comparison ===")
        for name, s in stats.items():
            print(f"{name}:")
            for k, v in s.items():
                print(f"  {k.upper():5s} {v:.6e}")
        (out_dir / "comparison.json").write_text(json.dumps(stats, indent=2))
    print("\nInference completed!")
    return 0


def _predict_filtered(args):
    """Common prefix of visualize/plot-lines: predict + z>=0 filter."""
    from ..foam.reader import FoamCase
    from ..infer import predict_case

    predictor, fields, graph = predict_case(
        args.checkpoint, args.case_path, name=args.checkpoint_name
    )
    case = FoamCase(args.case_path)
    mesh = case.load_mesh()
    ref_raw = case.load_fields(args.reference_time)
    ref = {
        "U": ref_raw["U"],
        "p": ref_raw["p"].reshape(-1, 1),
        "k": ref_raw["k"].reshape(-1, 1),
        "epsilon": ref_raw["epsilon"].reshape(-1, 1),
        "nut": ref_raw["nut"].reshape(-1, 1),
    }
    cc = mesh.cell_centers
    z_mask = cc[:, 2] >= 0
    if z_mask.sum() == 0:
        z_mask = np.ones(len(cc), dtype=bool)
    cc = cc[z_mask]
    fields = {k: np.asarray(v)[z_mask] for k, v in fields.items()}
    ref = {k: np.asarray(v)[z_mask] for k, v in ref.items()}
    return fields, ref, cc


def cmd_export_torch(args) -> int:
    from ..compat.torch_port import save_torch_checkpoint
    from ..models.flow_gnn import ModelConfig
    from ..train.checkpoint import load_checkpoint
    from ..train.normalization import FieldNormalizer

    restored, meta = load_checkpoint(args.checkpoint, args.checkpoint_name)
    mcfg = ModelConfig.from_dict(meta["model_config"])
    normalizer = (
        FieldNormalizer.from_dict(meta["normalizer"])
        if meta.get("normalizer") else None
    )
    save_torch_checkpoint(
        args.output,
        restored["params"],
        restored["batch_stats"],
        mcfg,
        normalizer=normalizer,
        epoch=int(meta.get("epoch", 0)),
        val_loss=float(meta.get("val_loss", float("nan"))),
        train_config=meta.get("train_config"),
    )
    print(f"Exported {args.checkpoint}/{args.checkpoint_name} -> {args.output} "
          f"({mcfg.layer_type} {mcfg.hidden_dim}x{mcfg.num_layers}, "
          "reference torch format)")
    return 0


def cmd_visualize(args) -> int:
    from ..viz.fields import compare_fields

    fields, ref, cc = _predict_filtered(args)
    print("Creating visualization plots...")
    stats = compare_fields(fields, ref, cc, args.output_dir)
    (Path(args.output_dir) / "error_stats.json").write_text(
        json.dumps(stats, indent=2)
    )
    print(f"\nVisualization complete! Plots saved to {args.output_dir}")
    return 0


def cmd_plot_lines(args) -> int:
    from ..viz.lines import plot_line_comparison

    fields, ref, cc = _predict_filtered(args)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    print(f"\nPlotting along horizontal line Y = {args.y_line}...")
    plot_line_comparison(
        fields, ref, cc, y_line=args.y_line,
        output_path=out_dir / f"line_Y_{args.y_line:.3f}.png", tol=args.tol,
    )
    print(f"\nPlotting along vertical line X = {args.x_line}...")
    plot_line_comparison(
        fields, ref, cc, x_line=args.x_line,
        output_path=out_dir / f"line_X_{args.x_line:.3f}.png", tol=args.tol,
    )
    print(f"\nLine plots saved to {out_dir}")
    return 0


def cmd_plot_training(args) -> int:
    from ..viz.training import plot_field_errors_detailed, plot_training_curves

    if not Path(args.history).exists():
        print(f"Error: history file not found: {args.history}")
        return 1
    plot_training_curves(args.history, args.output)
    if args.detailed:
        plot_field_errors_detailed(args.history)
    return 0


def cmd_check_data(args) -> int:
    """Data-pipeline smoke check (parity with test_data_loading.py)."""
    from ..foam.reader import FoamCase
    from ..graph.build import build_graph

    try:
        case = FoamCase(args.case_path)
        print("Loading mesh...")
        mesh = case.load_mesh()
        print(f"  points: {mesh.n_points}")
        print(f"  faces: {mesh.n_faces} ({mesh.n_internal_faces} internal)")
        print(f"  cells: {mesh.n_cells} ({mesh.n_internal_cells} internal)")
        print(f"  boundaries: {list(mesh.boundaries)}")
        for td in args.time_dirs:
            fields = case.load_fields(td, n_cells=mesh.n_cells)
            shapes = {k: v.shape for k, v in fields.items()}
            print(f"  time {td}: {shapes}")
        print("Building graph...")
        graph = build_graph(mesh)
        print(f"  nodes: {graph.n_nodes} (padded {graph.n_pad})")
        print(f"  edges: {graph.n_edges} (padded {graph.e_pad})")
        print(f"  max degree: {graph.max_degree}")
        print("OK")
        return 0
    except Exception as e:  # smoke contract: exit code 1 on any failure
        print(f"FAILED: {e}")
        return 1


def cmd_check_coordinates(args) -> int:
    """Coordinate diagnostic (parity with check_coordinates.py)."""
    from ..foam.reader import FoamCase

    case = FoamCase(args.case_path)
    mesh = case.load_mesh()
    cc = mesh.cell_centers
    print("Cell center coordinate ranges:")
    for i, axis in enumerate("xyz"):
        print(f"  {axis}: [{cc[:, i].min():.6f}, {cc[:, i].max():.6f}]")
    # BFS region accounting (expectation from blockMeshDict, scale 0.001)
    upstream = (cc[:, 0] < 0).sum()
    downstream = (cc[:, 0] >= 0).sum()
    below_step = ((cc[:, 0] >= 0) & (cc[:, 1] < 0)).sum()
    print(f"BFS regions: upstream(x<0)={upstream}, downstream(x>=0)={downstream}, "
          f"recirculation(x>=0,y<0)={below_step}")
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(12, 4))
        ax.scatter(cc[:, 0], cc[:, 1], s=0.2)
        ax.set_aspect("equal")
        ax.set_xlabel("X [m]")
        ax.set_ylabel("Y [m]")
        out = Path(args.output_dir) / "geometry.png"
        out.parent.mkdir(parents=True, exist_ok=True)
        plt.savefig(out, dpi=150, bbox_inches="tight")
        print(f"Saved geometry plot to {out}")
    return 0


def cmd_bench(args) -> int:
    from ..utils.bench import run_benchmark

    if args.mode == "dp":
        from ..utils.dp_bench import run_dp_scaling_benchmark

        result = run_dp_scaling_benchmark(
            n_devices=args.devices,
            case_path=args.case_path,
            layer_type=args.layer_type,
            num_layers=args.num_layers,
            hidden_dim=args.hidden_dim,
            backend=args.backend,
            compute_dtype=args.compute_dtype,
            steps=args.steps,
        )
        print(json.dumps(result))
        return 0

    if args.synthetic:
        from ..utils.synthetic import run_scale_benchmark

        result = run_scale_benchmark(
            n_nodes=args.synthetic,
            layer_type=args.layer_type,
            num_layers=args.num_layers,
            hidden_dim=args.hidden_dim,
            backend=args.backend,
            compute_dtype=args.compute_dtype,
            steps=args.steps,
        )
        print(json.dumps(result))
        return 0

    result = run_benchmark(
        case_path=args.case_path,
        layer_type=args.layer_type,
        num_layers=args.num_layers,
        hidden_dim=args.hidden_dim,
        backend=args.backend,
        steps=args.steps,
        mode=args.mode,
        compute_dtype=args.compute_dtype,
        trace=getattr(args, "trace", False),
    )
    print(json.dumps(result))
    return 0


def cmd_train_multitopo(args) -> int:
    """Bucketed training over cases with DIFFERENT mesh topologies.

    The reference's ``Batch.from_data_list`` could batch arbitrary graphs in
    one step; the TPU equivalent routes each case to a padding bucket and
    compiles one step per bucket shape (see train.multitopo).
    """
    from ..models.flow_gnn import ModelConfig
    from ..train.loop import TrainConfig
    from ..train.multitopo import MultiTopoTrainer, load_multitopo_dataset

    dataset = load_multitopo_dataset(
        args.case_paths,
        time_dir=args.time_dir,
        node_align=args.node_align,
        edge_align=args.edge_align,
    )
    mcfg = ModelConfig(
        hidden_dim=args.hidden_dim,
        num_layers=args.num_layers,
        layer_type=args.layer_type,
        dropout=args.dropout,
        norm_type=args.norm_type,
        backend=args.backend,
    )
    tcfg = TrainConfig(lr=args.lr, epochs=args.epochs, seed=args.seed)
    trainer = MultiTopoTrainer(dataset, mcfg, tcfg, output_dir=args.output_dir)
    trainer.train()
    print("Multi-topology training completed!")
    return 0


def cmd_train_multicase(args) -> int:
    """Streamed multi-case DP training + geometry-generalization report.

    With ``--case_paths`` the cases are real OpenFOAM directories sharing one
    mesh topology (streamed lazily, double-buffered to device); without, a
    synthetic perturbed-geometry family around ``--case_path`` with analytic
    targets is used and held-out-geometry errors are reported.
    """
    import jax
    from jax.sharding import Mesh

    from ..models.flow_gnn import ModelConfig
    from ..train import TrainConfig

    n_dev = min(args.devices or len(jax.devices()), len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    print(f"Data mesh: {n_dev} × {jax.devices()[0].platform}")

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.case_paths:
        from ..parallel.generalization import train_multicase_streamed
        from ..train.streaming import foam_case_source

        graph, normalizer, _ = foam_case_source(
            args.case_paths, chunk=n_dev, time_dir=args.time_dir
        )
        normalizer.save(out_dir / "normalizer.json")
        mcfg = ModelConfig(
            hidden_dim=args.hidden_dim, num_layers=args.num_layers,
            layer_type=args.layer_type, dropout=args.dropout,
            norm_type=args.norm_type, backend=args.backend,
        )
        from ..models.flow_gnn import FlowGNN

        def make_source():
            _, _, it = foam_case_source(
                args.case_paths, chunk=n_dev, time_dir=args.time_dir,
                normalizer=normalizer,
            )
            return it

        state, history = train_multicase_streamed(
            FlowGNN(mcfg), TrainConfig(lr=args.lr, seed=args.seed),
            mesh, graph, make_source, epochs=args.epochs, lr=args.lr,
            log_every=args.log_every,
        )
        for h in history:
            print(f"epoch {h['epoch']}: loss={h['loss']:.6f} ({h['seconds']:.1f}s)")
        (out_dir / "history.json").write_text(json.dumps(history, indent=2))
        print("Multi-case training completed!")
        return 0

    # synthetic perturbed-geometry family with analytic targets
    from ..foam.reader import FoamCase
    from ..graph.build import build_graph
    from ..parallel.generalization import run_geometry_generalization

    mesh_data = FoamCase(args.case_path).load_mesh()
    base_graph = build_graph(mesh_data)
    mcfg = ModelConfig(
        hidden_dim=args.hidden_dim, num_layers=args.num_layers,
        layer_type=args.layer_type, dropout=args.dropout,
        norm_type=args.norm_type, backend=args.backend,
    )
    res = run_geometry_generalization(
        base_graph, mesh,
        n_train_cases=args.n_cases, n_test_cases=args.n_test_cases,
        epochs=args.epochs, amplitude=args.amplitude,
        model_cfg=mcfg, lr=args.lr, seed=args.seed,
    )
    print(f"final train loss: {res['history'][-1]['loss']:.6f}")
    print("per-field errors (train-family / held-out geometry / ratio):")
    for f in ("U", "p", "k", "epsilon", "nut"):
        tr, te = res["train_errors"][f], res["heldout_errors"][f]
        print(f"  {f:8s} {tr:.5f} / {te:.5f} / {res['generalization_ratio'][f]:.2f}×")
    (out_dir / "generalization.json").write_text(json.dumps(res, indent=2))
    print(f"Saved report to {out_dir / 'generalization.json'}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="gnn_bfs_rans_tpu",
        description="TPU-native GNN flow-surrogate framework",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train", help="Train a FlowGNN surrogate")
    _add_case_arg(p)
    p.add_argument("--time_dirs", type=str, nargs="+",
                   default=["0", "100", "200", "282"])
    p.add_argument("--output_dir", type=str, default="checkpoints")
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--num_layers", type=int, default=6)
    p.add_argument("--layer_type", type=str, default="GCN",
                   choices=["GCN", "GAT", "GIN", "Transformer"])
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--weight_decay", type=float, default=1e-5)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--save_every", type=int, default=10)
    p.add_argument("--pressure_ref_weight", type=float, default=0.1)
    p.add_argument("--curriculum_epochs", type=int, default=0)
    p.add_argument("--min_lr", type=float, default=0.0,
                   help="Floor for the LR schedule")
    p.add_argument("--scheduler", type=str, default="plateau",
                   choices=["plateau", "cosine"])
    p.add_argument("--epoch_block", type=int, default=1,
                   help="Epochs per device-resident lax.scan block (1 = "
                        "host-driven per-epoch loop; >1 amortizes the "
                        "host→TPU dispatch RTT over whole epochs)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--backend", type=str, default="dense",
                   choices=["segment", "dense", "pallas"])
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16", "mixed"])
    p.add_argument("--norm_type", type=str, default="batch",
                   choices=["batch", "layer", "none"])
    p.add_argument("--bn_recal", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="BatchNorm recalibration: eval/best-selection on "
                        "exact batch statistics and checkpoints saved with "
                        "them (train/recal.py). auto = on for bfloat16 "
                        "batch-norm models")
    p.add_argument("--include_uniform", action="store_true",
                   help="Keep uniform (initial-condition) snapshots")
    p.add_argument("--resume", action="store_true",
                   help="Resume from the latest checkpoint in output_dir")
    p.add_argument("--progress", action="store_true",
                   help="Live tqdm epoch bar with loss postfix (parity with "
                        "the reference's per-batch bar, train.py:165,194)")
    p.add_argument("--no_aot", action="store_true",
                   help="Disable the precompiled-executable cache for the "
                        "training epoch blocks (<output_dir>/aot)")
    p.set_defaults(func=cmd_train)

    p = sub.add_parser("infer", help="Run inference with a trained model")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Checkpoint directory")
    p.add_argument("--checkpoint_name", type=str, default="best")
    _add_case_arg(p)
    p.add_argument("--output_dir", type=str, default="predictions")
    p.add_argument("--reference_time", type=str, default=None)
    p.add_argument("--save_format", type=str, default="numpy",
                   choices=["numpy", "openfoam", "both"])
    p.add_argument("--recalibrate_bn", action="store_true",
                   help="Re-estimate BatchNorm running stats with one exact "
                        "dropout-free pass before predicting (removes EMA "
                        "lag and bf16 batch-stat noise; see BENCHMARKS.md)")
    p.add_argument("--bn_exact", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="Predict through the arithmetic-consistent "
                        "deterministic train-mode forward (exact in-forward "
                        "BN statistics). auto = on for checkpoints trained "
                        "with --bn_recal")
    p.add_argument("--boundary_self_loops", action="store_true",
                   help="Add one self-edge per boundary face (the reference's "
                        "unfiltered-inference graph, inference.py:256); "
                        "default is the canonical training graph")
    p.set_defaults(func=cmd_infer)

    p = sub.add_parser(
        "export-torch",
        help="Export a checkpoint to the reference's torch .pt format",
    )
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Checkpoint directory")
    p.add_argument("--checkpoint_name", type=str, default="best")
    p.add_argument("--output", type=str, default="best_model.pt")
    p.set_defaults(func=cmd_export_torch)

    p = sub.add_parser("visualize", help="Field-comparison plots")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--checkpoint_name", type=str, default="best")
    _add_case_arg(p)
    p.add_argument("--reference_time", type=str, default="282")
    p.add_argument("--output_dir", type=str, default="visualizations")
    p.set_defaults(func=cmd_visualize)

    p = sub.add_parser("plot-lines", help="Line-extraction plots")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--checkpoint_name", type=str, default="best")
    _add_case_arg(p)
    p.add_argument("--reference_time", type=str, default="282")
    p.add_argument("--x_line", type=float, default=0.15)
    p.add_argument("--y_line", type=float, default=0.005)
    p.add_argument("--output_dir", type=str, default="visualizations")
    p.add_argument("--tol", type=float, default=1e-4)
    p.set_defaults(func=cmd_plot_lines)

    p = sub.add_parser("plot-training", help="Training-curve plots")
    p.add_argument("--history", type=str, default="checkpoints/training_history.json")
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--detailed", action="store_true")
    p.set_defaults(func=cmd_plot_training)

    p = sub.add_parser("check-data", help="Data-pipeline smoke check")
    _add_case_arg(p)
    p.add_argument("--time_dirs", type=str, nargs="+",
                   default=["0", "100", "200", "282"])
    p.set_defaults(func=cmd_check_data)

    p = sub.add_parser("check-coordinates", help="Coordinate diagnostic")
    _add_case_arg(p)
    p.add_argument("--plot", action="store_true")
    p.add_argument("--output_dir", type=str, default="visualizations")
    p.set_defaults(func=cmd_check_coordinates)

    p = sub.add_parser(
        "train-multicase",
        help="Streamed multi-case DP training / geometry generalization",
    )
    _add_case_arg(p)
    p.add_argument("--case_paths", type=str, nargs="*", default=None,
                   help="Real OpenFOAM case dirs sharing one mesh topology; "
                        "omit for the synthetic perturbed-geometry family")
    p.add_argument("--time_dir", type=str, default="282")
    p.add_argument("--output_dir", type=str, default="multicase_out")
    p.add_argument("--devices", type=int, default=None,
                   help="Data-axis size (default: all visible devices)")
    p.add_argument("--n_cases", type=int, default=16)
    p.add_argument("--n_test_cases", type=int, default=4)
    p.add_argument("--amplitude", type=float, default=0.05)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--hidden_dim", type=int, default=64)
    p.add_argument("--num_layers", type=int, default=3)
    p.add_argument("--layer_type", type=str, default="GCN",
                   choices=["GCN", "GAT", "GIN", "Transformer"])
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--norm_type", type=str, default="layer",
                   choices=["batch", "layer", "none"])
    p.add_argument("--backend", type=str, default="dense",
                   choices=["segment", "dense", "pallas"])
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=0)
    p.set_defaults(func=cmd_train_multicase)

    p = sub.add_parser(
        "train-multitopo",
        help="Bucketed training over cases with different mesh topologies",
    )
    p.add_argument("--case_paths", type=str, nargs="+", required=True,
                   help="OpenFOAM case dirs; meshes may differ arbitrarily "
                        "(similar sizes share a padding bucket + executable)")
    p.add_argument("--time_dir", type=str, default="282")
    p.add_argument("--output_dir", type=str, default="multitopo_out")
    p.add_argument("--node_align", type=int, default=512,
                   help="Node-padding bucket granularity")
    p.add_argument("--edge_align", type=int, default=2048,
                   help="Edge-padding bucket granularity")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--hidden_dim", type=int, default=64)
    p.add_argument("--num_layers", type=int, default=3)
    p.add_argument("--layer_type", type=str, default="GCN",
                   choices=["GCN", "GAT", "GIN", "Transformer"])
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--norm_type", type=str, default="layer",
                   choices=["batch", "layer", "none"])
    p.add_argument("--backend", type=str, default="dense",
                   choices=["segment", "dense", "pallas"])
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(func=cmd_train_multitopo)

    p = sub.add_parser("bench", help="Performance benchmark")
    _add_case_arg(p, default="/root/reference/OpenFOAM-data")
    p.add_argument("--layer_type", type=str, default="GAT")
    p.add_argument("--num_layers", type=int, default=4)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--backend", type=str, default="dense")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16", "mixed"])
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--mode", type=str, default="forward",
                   choices=["forward", "train", "dp"])
    p.add_argument("--devices", type=int, default=None,
                   help="mode=dp: data-mesh size N (default: all visible; "
                        "use XLA_FLAGS=--xla_force_host_platform_device_"
                        "count=N JAX_PLATFORMS=cpu for a virtual mesh)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="Benchmark a synthetic quad-grid of ~N cells instead")
    p.add_argument("--trace", action="store_true",
                   help="Also capture a per-op device trace of the step — a "
                        "dispatch-independent third timing witness "
                        "(utils.trace); adds a 'trace' block to the JSON")
    p.set_defaults(func=cmd_bench)

    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
