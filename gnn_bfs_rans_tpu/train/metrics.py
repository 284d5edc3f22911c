"""Per-field error metrics, matching the reference's definitions exactly.

``train.py:216-238`` (``compute_field_errors``): U error is the mean L2 norm
of the per-cell velocity error vector; scalar errors are MAE.
``inference.py:181-221`` adds RMSE / max / relative error for the inference
comparison block.  Definitions are preserved verbatim for comparability of
history files and benchmark numbers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

FIELD_NAMES = ("U", "p", "k", "epsilon", "nut")


def compute_field_errors(
    pred: jax.Array, target: jax.Array, node_mask: jax.Array
) -> dict[str, jax.Array]:
    """Per-field errors on packed [N_pad, 7] arrays (jit-friendly)."""
    m = node_mask.astype(pred.dtype)
    count = jnp.maximum(jnp.sum(m), 1.0)
    errors = {}
    u_err = jnp.linalg.norm(pred[:, 0:3] - target[:, 0:3], axis=1)
    errors["U"] = jnp.sum(u_err * m) / count
    for i, name in enumerate(("p", "k", "epsilon", "nut"), start=3):
        errors[name] = jnp.sum(jnp.abs(pred[:, i] - target[:, i]) * m) / count
    return errors


def comparison_stats(pred: np.ndarray, ref: np.ndarray, vector: bool) -> dict:
    """MAE/RMSE/max (+relative for scalars), as in ``inference.py:181-221``."""
    if vector:
        err = np.linalg.norm(pred - ref, axis=1)
        return {
            "mae": float(err.mean()),
            "rmse": float(np.sqrt((err**2).mean())),
            "max": float(err.max()),
        }
    pred = pred.reshape(-1)
    ref = ref.reshape(-1)
    err = np.abs(pred - ref)
    return {
        "mae": float(err.mean()),
        "rmse": float(np.sqrt((err**2).mean())),
        "max": float(err.max()),
        "rel": float(err.mean() / (np.abs(ref).mean() + 1e-10)),
    }


def compare_with_reference(
    predicted: dict[str, np.ndarray], reference: dict[str, np.ndarray]
) -> dict[str, dict]:
    """Field-by-field comparison dict (printed by the CLI like the reference)."""
    out = {}
    for name in FIELD_NAMES:
        if name not in predicted or name not in reference:
            continue
        pred = np.asarray(predicted[name])
        ref = np.asarray(reference[name])
        if name == "U":
            out[name] = comparison_stats(
                pred.reshape(-1, 3), ref.reshape(-1, 3), vector=True
            )
        else:
            out[name] = comparison_stats(pred, ref, vector=False)
    return out


def mean_normalized_error(pred: np.ndarray, ref: np.ndarray) -> float:
    """|pred−ref| / range(ref) × 100%, averaged — the visualization metric

    (``visualize.py:236-273``), used for the U/p "mean normalized error"
    baseline target.
    """
    pred = np.asarray(pred, dtype=np.float64).reshape(-1)
    ref = np.asarray(ref, dtype=np.float64).reshape(-1)
    ref_range = np.nanmax(ref) - np.nanmin(ref)
    if ref_range < 1e-10:
        ref_range = max(abs(np.nanmax(ref)), abs(np.nanmin(ref)))
    eps = max(ref_range * 1e-6, 1e-10)
    err = np.abs(pred - ref) / (ref_range + eps) * 100.0
    return float(err.mean())
