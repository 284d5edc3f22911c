"""Reference COO aggregation primitives built on ``jax.ops.segment_*``.

These are the ground-truth implementations of the gather→message→scatter core
that PyTorch-Geometric's ``MessagePassing`` performs inside the reference's
convs (SURVEY.md §3.4).  Edges are receiver-sorted (see ``graph.structs``), so
``indices_are_sorted=True`` lets XLA use the fast contiguous-segment path.

The faster dense-neighbor and Pallas paths (``ops.dense``, ``kernels``) are
allclose-tested against these.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_src(x: jax.Array, senders: jax.Array) -> jax.Array:
    """Per-edge source-node features ``x[senders]`` → [E, ...]."""
    return jnp.take(x, senders, axis=0)


def segment_sum_to_nodes(
    messages: jax.Array,
    receivers: jax.Array,
    num_nodes: int,
    edge_mask: jax.Array | None = None,
) -> jax.Array:
    """Scatter-add per-edge messages to their receiver nodes → [N, ...]."""
    if edge_mask is not None:
        messages = jnp.where(
            edge_mask.reshape((-1,) + (1,) * (messages.ndim - 1)), messages, 0.0
        )
    return jax.ops.segment_sum(
        messages, receivers, num_segments=num_nodes, indices_are_sorted=True
    )


def segment_max_to_nodes(
    values: jax.Array,
    receivers: jax.Array,
    num_nodes: int,
    edge_mask: jax.Array | None = None,
    neg_fill: float = -1e30,
) -> jax.Array:
    """Per-receiver max of per-edge values (for stable softmax)."""
    if edge_mask is not None:
        values = jnp.where(
            edge_mask.reshape((-1,) + (1,) * (values.ndim - 1)), values, neg_fill
        )
    return jax.ops.segment_max(
        values, receivers, num_segments=num_nodes, indices_are_sorted=True
    )


def edge_softmax(
    logits: jax.Array,
    receivers: jax.Array,
    num_nodes: int,
    edge_mask: jax.Array | None = None,
) -> jax.Array:
    """Numerically-stable softmax over each receiver's incoming edges.

    ``logits``: [E] or [E, H] (multi-head).  Returns attention weights with the
    same shape; padded edges get weight 0.
    """
    logits = logits.astype(jnp.float32)  # stable softmax in f32
    seg_max = segment_max_to_nodes(logits, receivers, num_nodes, edge_mask)
    seg_max = jnp.maximum(seg_max, -1e30)  # empty segments
    shifted = logits - jnp.take(seg_max, receivers, axis=0)
    expv = jnp.exp(shifted)
    if edge_mask is not None:
        expv = jnp.where(
            edge_mask.reshape((-1,) + (1,) * (expv.ndim - 1)), expv, 0.0
        )
    denom = segment_sum_to_nodes(expv, receivers, num_nodes)
    denom = jnp.maximum(denom, 1e-16)
    return expv / jnp.take(denom, receivers, axis=0)


def aggregate_sum(
    x: jax.Array,
    senders: jax.Array,
    receivers: jax.Array,
    num_nodes: int,
    edge_mask: jax.Array | None = None,
    edge_weight: jax.Array | None = None,
) -> jax.Array:
    """Weighted scatter-add of source features: out[i] = Σ_{j→i} w_ij x_j."""
    msg = gather_src(x, senders)
    if edge_weight is not None:
        msg = msg * edge_weight.reshape((-1,) + (1,) * (msg.ndim - 1))
    return segment_sum_to_nodes(msg, receivers, num_nodes, edge_mask)
