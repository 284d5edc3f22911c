"""Port reference PyTorch FlowGNN checkpoints into this framework.

The BASELINE north star requires reproducing the reference model's
denormalized predictions within float tolerance given its weights.  This
module maps a ``torch.save``'d checkpoint in the reference's format
(``train.py:453-460``: dict with ``model_state_dict``, ``config``,
``normalizer``) onto our flax parameter tree.

State-dict naming (from ``gnn_model.py``):

* ``input_proj.weight|bias``                → ``input_proj.kernel|bias``
* ``gnn_layers.{i}.…`` per conv type:
  - GCNConv:       ``lin.weight``, ``bias``
  - GATConv:       ``lin.weight`` (or ``lin_src.weight`` in older PyG),
                   ``att_src``, ``att_dst``, ``bias``
  - GINConv:       ``nn.0.weight|bias``, ``nn.2.weight|bias``
  - TransformerConv: ``lin_query|lin_key|lin_value|lin_skip.weight|bias``
                   (+ ``lin_edge.weight`` when edge_dim is set)
* ``batch_norms.{i}.module.weight|bias|running_mean|running_var``
  (PyG BatchNorm wraps BatchNorm1d as ``module``) → ``bn_{i}`` params +
  ``batch_stats``
* ``output_proj.{0,3,6,8}.weight|bias``     → ``out_0..out_3``

torch ``Linear.weight`` is ``[out, in]``; flax ``Dense.kernel`` is
``[in, out]`` — transposed on the way in.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..models.flow_gnn import ModelConfig
from ..train.normalization import FieldNormalizer


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, dtype=np.float32).T)


def _a(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def _get(sd: dict, *names: str):
    for n in names:
        if n in sd:
            return sd[n]
    raise KeyError(f"none of {names} in state dict (have {sorted(sd)[:8]}...)")


def convert_state_dict(
    state_dict: dict[str, Any], config: ModelConfig
) -> tuple[dict, dict]:
    """Torch state dict → (flax params, batch_stats)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict[str, Any] = {}
    batch_stats: dict[str, Any] = {}

    params["input_proj"] = {
        "kernel": _t(sd["input_proj.weight"]),
        "bias": _a(sd["input_proj.bias"]),
    }

    for i in range(config.num_layers):
        p = f"gnn_layers.{i}."
        layer_sd = {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}
        name = f"conv_{i}"
        if config.layer_type == "GCN":
            params[name] = {
                "lin": {"kernel": _t(_get(layer_sd, "lin.weight"))},
                "bias": _a(layer_sd["bias"]),
            }
        elif config.layer_type == "GAT":
            lin_w = _get(layer_sd, "lin.weight", "lin_src.weight", "lin_l.weight")
            params[name] = {
                "lin": {"kernel": _t(lin_w)},
                "att_src": _a(layer_sd["att_src"]),
                "att_dst": _a(layer_sd["att_dst"]),
                "bias": _a(layer_sd["bias"]),
            }
        elif config.layer_type == "GIN":
            params[name] = {
                "mlp_0": {
                    "kernel": _t(layer_sd["nn.0.weight"]),
                    "bias": _a(layer_sd["nn.0.bias"]),
                },
                "mlp_1": {
                    "kernel": _t(layer_sd["nn.2.weight"]),
                    "bias": _a(layer_sd["nn.2.bias"]),
                },
            }
            if "eps" in layer_sd:
                eps = _a(layer_sd["eps"]).reshape(())
                if abs(float(eps)) > 0:
                    params[name]["eps"] = eps
        elif config.layer_type == "Transformer":
            params[name] = {
                "lin_query": {
                    "kernel": _t(layer_sd["lin_query.weight"]),
                    "bias": _a(layer_sd["lin_query.bias"]),
                },
                "lin_key": {
                    "kernel": _t(layer_sd["lin_key.weight"]),
                    "bias": _a(layer_sd["lin_key.bias"]),
                },
                "lin_value": {
                    "kernel": _t(layer_sd["lin_value.weight"]),
                    "bias": _a(layer_sd["lin_value.bias"]),
                },
                "lin_skip": {
                    "kernel": _t(layer_sd["lin_skip.weight"]),
                    "bias": _a(layer_sd["lin_skip.bias"]),
                },
            }
            if "lin_edge.weight" in layer_sd:
                params[name]["lin_edge"] = {
                    "kernel": _t(layer_sd["lin_edge.weight"])
                }
        else:
            raise ValueError(f"unknown layer type {config.layer_type}")

        bnp = f"batch_norms.{i}."
        bn_sd = {k[len(bnp):]: v for k, v in sd.items() if k.startswith(bnp)}
        if bn_sd:
            params[f"bn_{i}"] = {
                "scale": _a(_get(bn_sd, "module.weight", "weight")),
                "bias": _a(_get(bn_sd, "module.bias", "bias")),
            }
            batch_stats[f"bn_{i}"] = {
                "mean": _a(_get(bn_sd, "module.running_mean", "running_mean")),
                "var": _a(_get(bn_sd, "module.running_var", "running_var")),
            }

    # output MLP: Sequential indices 0, 3, 6, 8 are the Linear layers
    for out_name, idx in (("out_0", 0), ("out_1", 3), ("out_2", 6), ("out_3", 8)):
        params[out_name] = {
            "kernel": _t(sd[f"output_proj.{idx}.weight"]),
            "bias": _a(sd[f"output_proj.{idx}.bias"]),
        }

    return params, batch_stats


def export_state_dict(
    params: dict[str, Any], batch_stats: dict[str, Any], config: ModelConfig
) -> dict[str, np.ndarray]:
    """Flax params → reference-format torch state dict (inverse of
    :func:`convert_state_dict`).

    Names follow the reference model exactly (``gnn_model.py``:
    ``input_proj.*``, ``gnn_layers.{i}.*`` per conv type,
    ``batch_norms.{i}.module.*``, ``output_proj.{0,3,6,8}.*``) so the
    exported dict loads into the reference's ``FlowGNN`` with
    ``load_state_dict`` — migration works in both directions.
    """
    sd: dict[str, np.ndarray] = {
        "input_proj.weight": _t(params["input_proj"]["kernel"]),
        "input_proj.bias": _a(params["input_proj"]["bias"]),
    }

    for i in range(config.num_layers):
        conv = params[f"conv_{i}"]
        p = f"gnn_layers.{i}."
        if config.layer_type == "GCN":
            sd[p + "lin.weight"] = _t(conv["lin"]["kernel"])
            sd[p + "bias"] = _a(conv["bias"])
        elif config.layer_type == "GAT":
            sd[p + "lin.weight"] = _t(conv["lin"]["kernel"])
            sd[p + "att_src"] = _a(conv["att_src"])
            sd[p + "att_dst"] = _a(conv["att_dst"])
            sd[p + "bias"] = _a(conv["bias"])
        elif config.layer_type == "GIN":
            sd[p + "nn.0.weight"] = _t(conv["mlp_0"]["kernel"])
            sd[p + "nn.0.bias"] = _a(conv["mlp_0"]["bias"])
            sd[p + "nn.2.weight"] = _t(conv["mlp_1"]["kernel"])
            sd[p + "nn.2.bias"] = _a(conv["mlp_1"]["bias"])
            if "eps" in conv:
                sd[p + "eps"] = _a(conv["eps"]).reshape(())
        elif config.layer_type == "Transformer":
            for lin in ("lin_query", "lin_key", "lin_value", "lin_skip"):
                sd[p + f"{lin}.weight"] = _t(conv[lin]["kernel"])
                sd[p + f"{lin}.bias"] = _a(conv[lin]["bias"])
            if "lin_edge" in conv:
                sd[p + "lin_edge.weight"] = _t(conv["lin_edge"]["kernel"])
        else:
            raise ValueError(f"unknown layer type {config.layer_type}")

        if f"bn_{i}" in params:
            bp = f"batch_norms.{i}.module."
            sd[bp + "weight"] = _a(params[f"bn_{i}"]["scale"])
            sd[bp + "bias"] = _a(params[f"bn_{i}"]["bias"])
            bs = batch_stats.get(f"bn_{i}", {})
            sd[bp + "running_mean"] = _a(
                bs.get("mean", np.zeros(config.hidden_dim))
            )
            sd[bp + "running_var"] = _a(
                bs.get("var", np.ones(config.hidden_dim))
            )
            # torch BatchNorm1d tracks a batch counter we don't keep; 0 is
            # inert (only used for momentum=None cumulative averaging)
            sd[bp + "num_batches_tracked"] = np.zeros((), np.int64)

    for out_name, idx in (("out_0", 0), ("out_1", 3), ("out_2", 6), ("out_3", 8)):
        sd[f"output_proj.{idx}.weight"] = _t(params[out_name]["kernel"])
        sd[f"output_proj.{idx}.bias"] = _a(params[out_name]["bias"])
    return sd


def save_torch_checkpoint(
    path: str,
    params: dict[str, Any],
    batch_stats: dict[str, Any],
    config: ModelConfig,
    normalizer: FieldNormalizer | None = None,
    epoch: int = 0,
    val_loss: float = float("nan"),
    train_config: Any = None,
) -> None:
    """Write a reference-format ``.pt`` checkpoint (``train.py:453-461``:
    dict with epoch / model_state_dict / optimizer_state_dict / val_loss /
    config / normalizer) loadable by the reference's ``load_model``
    (``inference.py:20-59``) — and by :func:`load_torch_checkpoint`.

    ``optimizer_state_dict`` is exported empty: optax Adam moments have no
    faithful positional mapping onto torch's parameter-id keyed state, and
    no reference loader reads it (it exists for torch-side resume only).
    """
    import torch

    sd = export_state_dict(params, batch_stats, config)
    cfg = {
        "hidden_dim": config.hidden_dim,
        "num_layers": config.num_layers,
        "layer_type": config.layer_type,
        "dropout": config.dropout,
    }
    if train_config is not None:
        t = train_config.to_dict() if hasattr(train_config, "to_dict") else dict(train_config)
        for k in ("lr", "weight_decay", "batch_size", "epochs",
                  "pressure_ref_weight", "curriculum_epochs", "save_every"):
            if k in t:
                cfg[k] = t[k]
    norm_data = None
    if normalizer is not None:
        norm_data = {
            "field_stats": normalizer.field_stats,
            "scalers": normalizer.scalers,
        }
    torch.save(
        {
            "epoch": int(epoch),
            # np.array(..., copy=True): torch.from_numpy on a non-writable
            # view (jax arrays export read-only buffers) warns loudly
            "model_state_dict": {
                k: torch.from_numpy(np.array(v)) for k, v in sd.items()
            },
            "optimizer_state_dict": {},
            "val_loss": float(val_loss),
            "config": cfg,
            "normalizer": norm_data,
        },
        path,
    )


def load_torch_checkpoint(path: str) -> tuple[dict, dict, ModelConfig, FieldNormalizer | None]:
    """Load a reference ``.pt`` checkpoint → (params, batch_stats, config, normalizer).

    Mirrors the reference loader's config-driven reconstruction
    (``inference.py:20-59``) without needing torch_geometric.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    cfg_dict = ckpt.get("config", {})
    sd = {k: v.detach().cpu().numpy() for k, v in ckpt["model_state_dict"].items()}

    layer_type = cfg_dict.get("layer_type", "GCN")
    hidden = int(cfg_dict.get("hidden_dim", 256))
    # architecture facts not present in the reference's config dict
    # (vars(args), train.py:300) are inferred from the weights themselves:
    input_dim = int(sd["input_proj.weight"].shape[1])
    output_dim = int(sd["output_proj.8.weight"].shape[0])
    heads = 4
    if "gnn_layers.0.att_src" in sd:
        heads = int(sd["gnn_layers.0.att_src"].shape[1])
    elif "gnn_layers.0.lin_query.weight" in sd:
        heads = int(sd["gnn_layers.0.lin_query.weight"].shape[0]) // hidden
    # the reference constructs TransformerConv WITHOUT edge_dim (quirk 3), so
    # lin_edge is absent from real reference checkpoints — the ported model
    # must not expect edge conditioning then
    use_edge_attr = "gnn_layers.0.lin_edge.weight" in sd
    config = ModelConfig(
        input_dim=input_dim,
        hidden_dim=hidden,
        output_dim=output_dim,
        num_layers=int(cfg_dict.get("num_layers", 6)),
        layer_type=layer_type,
        heads=heads,
        use_edge_attr=use_edge_attr,
        dropout=0.0,
    )
    params, batch_stats = convert_state_dict(sd, config)

    normalizer = None
    norm_data = ckpt.get("normalizer")
    if norm_data:
        normalizer = FieldNormalizer()
        normalizer.field_stats = norm_data.get("field_stats", {})
        normalizer.scalers = norm_data.get("scalers", {})
    return params, batch_stats, config, normalizer
