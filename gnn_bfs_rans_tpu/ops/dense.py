"""Dense padded-neighbor aggregation — the fast TPU formulation.

Unstructured CFD meshes have tiny bounded degree (≤4 on the 2D BFS quad mesh,
≤6 for hex meshes), so instead of edge-parallel scatter (which TPUs hate) we
gather each destination's ``D_max`` neighbor rows and reduce over the slot
axis with a mask: scatter-free, fully dense, VPU/MXU friendly, and the layout
XLA pipelines well.  This is the TPU-native replacement for the per-edge
gather/scatter in PyG's MessagePassing (SURVEY.md §3.4).

Shapes: ``nbr_idx/nbr_mask`` are ``[N, D]``; features ``[N, H]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_neighbors(x: jax.Array, nbr_idx: jax.Array) -> jax.Array:
    """[N, H] → [N, D, H] neighbor features."""
    return jnp.take(x, nbr_idx, axis=0)


def masked_sum(
    x: jax.Array,
    nbr_idx: jax.Array,
    nbr_mask: jax.Array,
    weight: jax.Array | None = None,
) -> jax.Array:
    """out[i] = Σ_d mask[i,d] * w[i,d] * x[nbr_idx[i,d]]  → [N, H]."""
    nbr = gather_neighbors(x, nbr_idx)                      # [N, D, H]
    w = nbr_mask.astype(x.dtype)
    if weight is not None:
        w = w * weight
    return jnp.einsum("nd,ndh->nh", w, nbr)


def masked_softmax(
    logits: jax.Array, nbr_mask: jax.Array, axis: int = 1
) -> jax.Array:
    """Softmax over the neighbor-slot axis with masked (padded) slots zeroed.

    ``logits``: [N, D] or [N, D, H].  Rows with no valid slots return zeros.
    """
    if logits.ndim == 3:
        mask = nbr_mask[:, :, None]
    else:
        mask = nbr_mask
    # softmax runs in float32 regardless of the compute dtype
    logits = logits.astype(jnp.float32)
    neg = jnp.asarray(-1e30, logits.dtype)
    masked = jnp.where(mask, logits, neg)
    m = jnp.max(masked, axis=axis, keepdims=True)
    m = jnp.maximum(m, -1e30)
    e = jnp.exp(masked - m)
    e = jnp.where(mask, e, 0.0)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, 1e-16)


def attention_aggregate(
    values: jax.Array,
    logits: jax.Array,
    nbr_idx: jax.Array,
    nbr_mask: jax.Array,
    self_logit: jax.Array | None = None,
    self_value: jax.Array | None = None,
) -> jax.Array:
    """Multi-head neighbor attention: softmax over slots (+ optional self slot).

    - ``values``: [N, H, C] per-node per-head value vectors (source side)
    - ``logits``: [N, D, H] per-slot per-head attention logits
    - ``self_logit``/``self_value``: optional [N, H] / [N, H, C] self-loop slot
      (GAT adds self-loops; Transformer does not by default)

    Returns [N, H, C] aggregated per-head outputs.
    """
    n, d, h = logits.shape
    nbr_vals = jnp.take(values, nbr_idx, axis=0)            # [N, D, H, C]
    if self_logit is not None:
        logits = jnp.concatenate([logits, self_logit[:, None, :]], axis=1)
        mask = jnp.concatenate(
            [nbr_mask, jnp.ones((n, 1), dtype=bool)], axis=1
        )
        nbr_vals = jnp.concatenate([nbr_vals, self_value[:, None]], axis=1)
    else:
        mask = nbr_mask
    attn = masked_softmax(logits, mask, axis=1)             # [N, D(+1), H]
    return jnp.einsum("ndh,ndhc->nhc", attn, nbr_vals)
