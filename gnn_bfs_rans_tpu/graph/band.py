"""Banded block-sparse adjacency for the Pallas MXU kernels.

After RCM reordering every edge satisfies ``|sender − receiver| < TILE``, so
for a tile of ``TILE`` consecutive receivers all senders fall inside a window
of three consecutive tiles ``[t−1, t, t+1]``.  Aggregation then becomes

    out[tile t] = Σ_{k∈{0,1,2}} A[t, k] @ x[tile t−1+k]

— three dense ``TILE×TILE`` matmuls per tile, a pure-MXU banded SpMM with no
gather or scatter (the TPU-native answer to PyG's per-edge scatter kernels,
SURVEY.md §3.4).  Attention variants reuse the same layout with additive
``0/−1e30`` masks and per-window softmax (flash-attention over the band).

All band tensors are precomputed once on host from the static graph:

* ``adj``        — 0/1 adjacency (GIN sum-aggregation weights)
* ``gcn``        — symmetric-normalized GCN coefficients incl. self-loops
* ``bias_self``  — additive attention mask with self-loops (GAT)
* ``bias_noself``— additive attention mask without self-loops (Transformer)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Band:
    adj: jax.Array          # [n_tiles, 3, T, T] float32 0/1
    gcn: jax.Array          # [n_tiles, 3, T, T] float32 normalized coeffs (+self)
    bias_self: jax.Array    # [n_tiles, 3, T, T] float32 0 / -1e30 (with self)
    bias_noself: jax.Array  # [n_tiles, 3, T, T] float32 0 / -1e30
    tile: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_tiles(self) -> int:
        return self.adj.shape[0]


def build_band(
    senders: np.ndarray,
    receivers: np.ndarray,
    n_pad: int,
    node_mask: np.ndarray,
    in_degree: np.ndarray,
    tile: int = 128,
) -> Band | None:
    """Build banded adjacency; returns None if the graph isn't band-limited.

    Requires ``n_pad % tile == 0`` and every edge within ±(tile−1).
    """
    if n_pad % tile != 0:
        return None
    if len(senders) and np.abs(
        senders.astype(np.int64) - receivers.astype(np.int64)
    ).max() >= tile:
        return None

    n_tiles = n_pad // tile
    adj = np.zeros((n_tiles, 3, tile, tile), dtype=np.float32)
    t = receivers // tile
    row = receivers % tile
    # window block k such that sender tile == receiver tile - 1 + k
    col_global = senders - (t - 1) * tile
    k = col_global // tile
    col = col_global % tile
    valid = (k >= 0) & (k < 3)
    if not valid.all():
        return None
    adj[t, k, row, col] = 1.0

    # Everything below stays float32 and in-place — these are [n_tiles,3,T,T]
    # tensors and float64 temporaries dominate build time on slow-memory hosts.
    diag_idx = np.arange(tile)
    # GCN: Â = A + I normalized by D̂^-1/2 on both sides; padding rows get 0.
    deg_hat = np.asarray(in_degree, dtype=np.float32) + np.float32(1.0)
    inv_sqrt = np.where(
        node_mask, np.float32(1.0) / np.sqrt(np.maximum(deg_hat, 1.0)), 0.0
    ).astype(np.float32)
    gcn = adj.copy()
    gcn[:, 1, diag_idx, diag_idx] += np.float32(1.0)  # self-loop
    # scale rows by inv_sqrt[receiver], cols by inv_sqrt[sender of that column]
    recv_scale = inv_sqrt.reshape(n_tiles, tile)      # [t, row]
    gcn *= recv_scale[:, None, :, None]
    padded = np.concatenate(
        [np.zeros(tile, np.float32), inv_sqrt, np.zeros(tile, np.float32)]
    )
    # send_scale[t, k, col] = inv_sqrt[(t-1+k)*tile + col] via a strided view
    send_scale = np.lib.stride_tricks.sliding_window_view(
        padded, 3 * tile
    )[::tile][:n_tiles].reshape(n_tiles, 3, tile)
    gcn *= send_scale[:, :, None, :]

    adj_self = adj.copy()
    adj_self[:, 1, diag_idx, diag_idx] = np.float32(1.0)
    # Padding rows must attend only to themselves (self bias) so softmax is
    # well-defined; their outputs are masked downstream anyway.
    neg = np.float32(NEG_INF)
    bias_self = np.where(adj_self > 0, np.float32(0.0), neg)
    bias_noself = np.where(adj > 0, np.float32(0.0), neg)

    # host-side numpy leaves (see graph.structs.build_padded_graph)
    return Band(
        adj=adj,
        gcn=gcn.astype(np.float32),
        bias_self=bias_self,
        bias_noself=bias_noself,
        tile=tile,
    )
