"""Checkpoint save/load/resume via Orbax, with JSON sidecars.

The reference saves torch dicts {epoch, model_state_dict, optimizer_state_dict,
val_loss, config, normalizer} (``train.py:453-469``) but has **no resume path**
(SURVEY.md §5).  Here:

* ``save_checkpoint``/``load_checkpoint`` — Orbax pytree checkpoint holding
  params, batch_stats, optimizer state, and step;
* ``meta.json`` sidecar — epoch, val_loss, model config, train config, and the
  normalizer stats (JSON, no pickle) so inference needs only the checkpoint
  directory, and loaders reconstruct the exact model like
  ``inference.py:20-59`` does from the embedded config;
* ``--resume`` actually works: ``latest_checkpoint`` finds the newest epoch.

Layout: ``<dir>/best`` and ``<dir>/epoch_<N>`` checkpoint dirs + sidecars.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp

from ..models.flow_gnn import ModelConfig
from .normalization import FieldNormalizer

_checkpointer = None


def _ckptr() -> ocp.StandardCheckpointer:
    global _checkpointer
    if _checkpointer is None:
        _checkpointer = ocp.StandardCheckpointer()
    return _checkpointer


def save_checkpoint(
    directory: str | Path,
    name: str,
    state: Any,
    *,
    epoch: int,
    val_loss: float,
    model_config: ModelConfig,
    train_config: Any,
    normalizer: FieldNormalizer | None,
    extra: dict | None = None,
) -> Path:
    directory = Path(directory).absolute()
    directory.mkdir(parents=True, exist_ok=True)
    path = directory / name
    tree = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    _ckptr().save(path, tree, force=True)
    _ckptr().wait_until_finished()
    meta = {
        "epoch": epoch,
        "val_loss": float(val_loss),
        "model_config": model_config.to_dict(),
        "train_config": (
            train_config.to_dict() if hasattr(train_config, "to_dict") else dict(train_config)
        ),
        "normalizer": normalizer.to_dict() if normalizer is not None else None,
        **(extra or {}),
    }
    (directory / f"{name}.meta.json").write_text(json.dumps(meta, indent=2))
    return path


def load_meta(directory: str | Path, name: str) -> dict:
    return json.loads((Path(directory) / f"{name}.meta.json").read_text())


def load_checkpoint(
    directory: str | Path, name: str, abstract_state: Any | None = None
) -> tuple[Any, dict]:
    """Restore the state pytree (+ meta).  When ``abstract_state`` is None the
    tree is restored with stored shapes/dtypes (dict of arrays)."""
    directory = Path(directory).absolute()
    path = directory / name
    meta = load_meta(directory, name)
    if abstract_state is not None:
        tree = {
            "step": abstract_state.step,
            "params": abstract_state.params,
            "batch_stats": abstract_state.batch_stats,
            "opt_state": abstract_state.opt_state,
        }
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, tree)
        restored = _ckptr().restore(path, abstract)
    else:
        try:
            restored = _ckptr().restore(path)
        except ValueError as e:
            if "was not found in jax.local_devices" not in str(e):
                raise
            # cross-device restore (e.g. a TPU-trained checkpoint opened on
            # CPU): orbax pins stored shardings to the saving device; rebuild
            # an abstract target from the stored metadata with shardings on
            # the CURRENT default device — the torch `map_location`
            # equivalent the reference relies on (`inference.py:23`).
            sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
            meta_tree = _ckptr().metadata(path).item_metadata
            abstract = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                               sharding=sharding),
                meta_tree,
                is_leaf=lambda m: hasattr(m, "shape") and hasattr(m, "dtype"),
            )
            restored = _ckptr().restore(path, abstract)
    return restored, meta


def restore_state(state_cls, restored: dict):
    return state_cls(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )


def latest_checkpoint(directory: str | Path) -> str | None:
    """Name of the newest epoch checkpoint (for --resume), else 'best', else None."""
    directory = Path(directory)
    if not directory.exists():
        return None
    epochs = []
    for p in directory.iterdir():
        if p.is_dir() and p.name.startswith("epoch_"):
            try:
                epochs.append((int(p.name.split("_")[1]), p.name))
            except (IndexError, ValueError):
                continue
    if epochs:
        return max(epochs)[1]
    if (directory / "best").exists():
        return "best"
    return None
