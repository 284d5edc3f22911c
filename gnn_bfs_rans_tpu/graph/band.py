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
import numpy as np

NEG_INF = -1e30


ALL_COMPONENTS = ("adj", "gcn", "bias_self", "bias_noself")

# band components each conv backend actually reads — used to build only
# what's needed (each component is ~n_pad*3*tile*4 bytes; at 1M cells the
# full set is ~6 GB, one component 1.5 GB)
LAYER_COMPONENTS = {
    "GCN": ("gcn",),
    "GIN": ("adj",),
    "GAT": ("bias_self",),
    "Transformer": ("bias_noself",),
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Band:
    adj: jax.Array | None          # [n_tiles, 3, T, T] float32 0/1
    gcn: jax.Array | None          # normalized GCN coeffs incl. self-loops
    bias_self: jax.Array | None    # 0 / -1e30 additive mask (with self)
    bias_noself: jax.Array | None  # 0 / -1e30 additive mask
    tile: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_tiles(self) -> int:
        for f in (self.adj, self.gcn, self.bias_self, self.bias_noself):
            if f is not None:
                return f.shape[0]
        raise ValueError("empty Band")


def build_band(
    senders: np.ndarray,
    receivers: np.ndarray,
    n_pad: int,
    node_mask: np.ndarray,
    in_degree: np.ndarray,
    tile: int = 128,
    components: tuple[str, ...] = ALL_COMPONENTS,
) -> Band | None:
    """Build banded adjacency; returns None if the graph isn't band-limited.

    Requires ``n_pad % tile == 0`` and every edge within ±(tile−1).
    ``components`` selects which band tensors to materialize (see
    LAYER_COMPONENTS) — each is O(n_pad · 3 · tile) floats.
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
    neg = np.float32(NEG_INF)

    gcn = None
    if "gcn" in components:
        # GCN: Â = A + I normalized by D̂^-1/2 on both sides; padding rows → 0.
        deg_hat = np.asarray(in_degree, dtype=np.float32) + np.float32(1.0)
        inv_sqrt = np.where(
            node_mask, np.float32(1.0) / np.sqrt(np.maximum(deg_hat, 1.0)), 0.0
        ).astype(np.float32)
        gcn = adj.copy()
        gcn[:, 1, diag_idx, diag_idx] += np.float32(1.0)  # self-loop
        recv_scale = inv_sqrt.reshape(n_tiles, tile)      # [t, row]
        gcn *= recv_scale[:, None, :, None]
        padded = np.concatenate(
            [np.zeros(tile, np.float32), inv_sqrt, np.zeros(tile, np.float32)]
        )
        # send_scale[t, k, col] = inv_sqrt[(t-1+k)*tile + col], strided view
        send_scale = np.lib.stride_tricks.sliding_window_view(
            padded, 3 * tile
        )[::tile][:n_tiles].reshape(n_tiles, 3, tile)
        gcn *= send_scale[:, :, None, :]

    bias_self = None
    if "bias_self" in components:
        adj_self = adj.copy()
        adj_self[:, 1, diag_idx, diag_idx] = np.float32(1.0)
        # Padding rows attend only to themselves so softmax is well-defined;
        # their outputs are masked downstream anyway.
        bias_self = np.where(adj_self > 0, np.float32(0.0), neg)

    bias_noself = None
    if "bias_noself" in components:
        bias_noself = np.where(adj > 0, np.float32(0.0), neg)

    # Mask-like tensors store exactly in bfloat16 (values are 0, 1, ±1e30 —
    # all exactly representable), halving their HBM traffic in the kernels.
    # GCN coefficients keep float32 (0.4% bf16 rounding would break the
    # 1e-4-tolerance parity with the segment/dense backends).
    import ml_dtypes

    bf16 = ml_dtypes.bfloat16

    def _bf(a):
        return None if a is None else a.astype(bf16)

    # host-side numpy leaves (see graph.structs.build_padded_graph)
    return Band(
        adj=_bf(adj) if "adj" in components else None,
        gcn=gcn,
        bias_self=_bf(bias_self),
        bias_noself=_bf(bias_noself),
        tile=tile,
    )
