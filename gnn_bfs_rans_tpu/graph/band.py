"""Banded block-sparse adjacency for the Pallas MXU kernels.

After RCM reordering every edge satisfies ``|sender − receiver| ≤ bandwidth``.
For a tile of ``TILE`` consecutive receivers all senders then fall inside a
window of ``W = 2·k0+1`` consecutive tiles ``[t−k0 … t+k0]`` where
``k0 = ceil(bandwidth/TILE)`` (k0=1 → the classic 3-tile window when
bandwidth < TILE, as on the BFS mesh; k0=2 → 5 tiles for 3-D hex meshes whose
RCM bandwidth lands in (TILE, 2·TILE]).  Aggregation then becomes

    out[tile t] = Σ_{k∈{0..W−1}} A[t, k] @ x[tile t−k0+k]

— ``W`` dense ``TILE×TILE`` matmuls per tile, a pure-MXU banded SpMM with no
gather or scatter (the TPU-native answer to PyG's per-edge scatter kernels,
SURVEY.md §3.4).  Attention variants reuse the same layout with 0/1 sparsity
masks — the kernels materialize the additive ``0/−1e30`` softmax bias from
them in VMEM ((mask−1)·1e30) — and per-window softmax (flash-attention over
the band).

All band tensors are precomputed once on host from the static graph:

* ``adj``        — 0/1 adjacency (GIN sum-aggregation weights)
* ``gcn``        — symmetric-normalized GCN coefficients incl. self-loops
* ``bias_self``  — int8 0/1 attention mask with self-loops (GAT)
* ``bias_noself``— int8 0/1 attention mask without self-loops (Transformer)

The attention masks store **int8**: they are the dominant HBM stream of the
fused attention kernels (the [W, T, T] plane per tile dwarfs the [T, H·C]
feature tiles), so 1-byte storage buys ~25% kernel time on the BFS mesh.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

NEG_INF = -1e30  # additive mask value the kernels materialize from 0/1 masks


ALL_COMPONENTS = ("adj", "gcn", "bias_self", "bias_noself", "geo", "edge")

# band components each conv backend actually reads — used to build only
# what's needed (each component is ~n_pad*W*tile*4 bytes; at 1M cells the
# full set is several GB, one component ~1.5 GB).  "edge" is the banded
# [.., D_e, T, T] edge-feature tensor for the edge-conditioned Transformer;
# "geo" is its factorized form for geometric features [unit dir(3), dist]
# (always the case for graphs from compute_edge_features): 2 stored planes
# (dist, 1/dist) instead of D_e=4 — the direction planes factor through the
# node positions, dir_d = (pos_i[d] − pos_j[d])/dist, so the kernels
# reconstruct them with one [T,4]@[4,W·T] matmul per head instead of
# streaming 4 f32 [W,T,T] planes from HBM.  When both are listed, "geo" is
# built iff the edge features validate as geometric (and "edge" is skipped);
# otherwise "edge" is the fallback.
LAYER_COMPONENTS = {
    "GCN": ("gcn",),
    "GIN": ("adj",),
    "GAT": ("bias_self",),
    "Transformer": ("bias_noself", "geo", "edge"),
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Band:
    """Banded adjacency tensors in two co-existing layouts.

    * SpMM tensors (``adj``, ``gcn``): full-tile window blocks
      ``[n_tiles, W, T, T]`` — W dense TILE×TILE MXU matmuls per tile.
    * Attention tensors (``bias_*``, ``edge``, ``geo``): pre-concatenated
      **half-tile windows** ``[.., T, Wcols]`` where the window of receiver
      tile ``t`` covers sender rows ``[t·T − k0s·(T/2), … + Wcols)`` with
      ``k0s = ceil(bandwidth / (T/2))``.  Half-tile granularity shrinks the
      attention kernels' [H·T, Wcols] softmax plane — their measured VPU
      bottleneck — by 33% whenever the RCM bandwidth ≤ T/2 (Wcols 256 vs
      384 on the BFS mesh, bandwidth 58), at identical coverage; bandwidth
      in (T/2, T] reproduces the old 3-tile width exactly (Wcols = 3·T).
    """

    adj: jax.Array | None          # [n_tiles, W, T, T] bf16 0/1
    gcn: jax.Array | None          # normalized GCN coeffs incl. self-loops
    bias_self: jax.Array | None    # [n_tiles, T, Wcols] int8 (with self)
    bias_noself: jax.Array | None  # [n_tiles, T, Wcols] int8
    tile: int = dataclasses.field(metadata=dict(static=True))
    edge: jax.Array | None = None  # [n_tiles, D_e, T, Wcols] f32 edge feats
    # factorized geometric edge planes: [n_tiles, 2, T, Wcols] f32 —
    # plane 0 = dist, plane 1 = 1/dist (0 off-band and on self-loops); the
    # direction planes are reconstructed in-kernel from `pos` (node coords)
    geo: jax.Array | None = None
    pos: jax.Array | None = None   # [n_pad, 4] f32 node coords (xyz, 0)

    def _any(self) -> jax.Array:
        for f in (self.adj, self.gcn, self.bias_self, self.bias_noself):
            if f is not None:
                return f
        raise ValueError("empty Band")

    @property
    def n_tiles(self) -> int:
        return self._any().shape[0]

    @property
    def window(self) -> int:
        """Number of full-tile window blocks W = 2·k0+1 (SpMM layout)."""
        for f in (self.adj, self.gcn):
            if f is not None:
                return f.shape[1]
        # attention-only band: equivalent full tiles covering Wcols
        return -(-self.width_cols // self.tile)

    @property
    def sub(self) -> int:
        """Attention window granularity (half tile)."""
        return self.tile // 2

    @property
    def width_cols(self) -> int:
        """Attention window width in sender columns (Wcols)."""
        for f in (self.bias_self, self.bias_noself):
            if f is not None:
                return f.shape[-1]
        if self.edge is not None:
            return self.edge.shape[-1]
        if self.geo is not None:
            return self.geo.shape[-1]
        return self.window * self.tile

    @property
    def reach(self) -> int:
        """Max sender-row distance covered on each side (node units) —
        the halo requirement of the node-sharded partitioned path."""
        r = 0
        for f in (self.adj, self.gcn):
            if f is not None:
                r = max(r, (f.shape[1] // 2) * self.tile)
        for f in (self.bias_self, self.bias_noself, self.edge, self.geo):
            if f is not None:
                r = max(r, (f.shape[-1] - self.tile) // 2)
        return r


def build_band(
    senders: np.ndarray,
    receivers: np.ndarray,
    n_pad: int,
    node_mask: np.ndarray,
    in_degree: np.ndarray,
    tile: int = 128,
    components: tuple[str, ...] = ALL_COMPONENTS,
    max_window_tiles: int = 5,
    edge_feat: np.ndarray | None = None,
    node_pos: np.ndarray | None = None,
) -> Band | None:
    """Build banded adjacency; returns None if the graph isn't band-limited.

    The window width ``W = 2·k0+1`` is chosen minimally from the measured
    tile-bandwidth (W=3 when bandwidth < tile); graphs needing
    ``W > max_window_tiles`` return None (caller falls back to the dense
    path).  ``components`` selects which band tensors to materialize (see
    LAYER_COMPONENTS) — each is O(n_pad · W · tile) floats.  When
    ``edge_feat`` ([n_edges, D_e]) is given, a band-layout edge tensor
    ``[n_tiles, W, D_e, T, T]`` is built for the edge-conditioned
    Graph-Transformer kernel.
    """
    if n_pad % tile != 0:
        return None

    n_tiles = n_pad // tile
    t = receivers // tile
    s_tile = senders // tile
    delta = s_tile - t
    k0 = int(np.abs(delta).max()) if len(senders) else 1
    k0 = max(k0, 1)
    window = 2 * k0 + 1
    if window > max_window_tiles:
        return None

    adj = np.zeros((n_tiles, window, tile, tile), dtype=np.float32)
    row = receivers % tile
    col = senders % tile
    k = delta + k0
    adj[t, k, row, col] = 1.0

    # Attention layout: half-tile window columns (see Band doc).  The
    # per-receiver-tile window starts k0s·sub rows before the tile; the pad
    # is sized from the EXACT per-edge column offsets (s − t·T), which is
    # never wider than the full-tile window the SpMM layout uses (col_off
    # ∈ [−k0·T, (k0+1)·T) by the tile-delta bound), and 33% narrower on
    # bandwidth ≤ T/2 meshes like the BFS case.
    sub = tile // 2
    if len(senders):
        col_off = senders.astype(np.int64) - t.astype(np.int64) * tile
        pad_needed = max(int(-col_off.min()), int(col_off.max()) - tile + 1, 1)
    else:
        col_off = np.zeros(0, np.int64)
        pad_needed = 1
    k0s = -(-pad_needed // sub)
    width = tile + 2 * k0s * sub
    if width > max_window_tiles * tile:
        return None
    attn_col = col_off + k0s * sub
    # self-loop column of row i: i + k0s·sub
    diag_col = np.arange(tile) + k0s * sub

    # Everything below stays float32 and in-place — these are [n_tiles,3,T,T]
    # tensors and float64 temporaries dominate build time on slow-memory hosts.
    diag_idx = np.arange(tile)

    gcn = None
    if "gcn" in components:
        # GCN: Â = A + I normalized by D̂^-1/2 on both sides; padding rows → 0.
        deg_hat = np.asarray(in_degree, dtype=np.float32) + np.float32(1.0)
        inv_sqrt = np.where(
            node_mask, np.float32(1.0) / np.sqrt(np.maximum(deg_hat, 1.0)), 0.0
        ).astype(np.float32)
        gcn = adj.copy()
        gcn[:, k0, diag_idx, diag_idx] += np.float32(1.0)  # self-loop
        recv_scale = inv_sqrt.reshape(n_tiles, tile)       # [t, row]
        gcn *= recv_scale[:, None, :, None]
        pad0 = np.zeros(k0 * tile, np.float32)
        padded = np.concatenate([pad0, inv_sqrt, pad0])
        # send_scale[t, k, col] = inv_sqrt[(t-k0+k)*tile + col], strided view
        send_scale = np.lib.stride_tricks.sliding_window_view(
            padded, window * tile
        )[::tile][:n_tiles].reshape(n_tiles, window, tile)
        gcn *= send_scale[:, :, None, :]

    bias_self = None
    if "bias_self" in components:
        bias_self = np.zeros((n_tiles, tile, width), dtype=np.int8)
        bias_self[t, row, attn_col] = 1
        # Every row attends at least to itself (incl. padding rows) so the
        # GAT kernel's softmax is always well-defined; padded-row outputs are
        # masked downstream anyway.
        bias_self[:, diag_idx, diag_col] = 1

    bias_noself = None
    if "bias_noself" in components:
        bias_noself = np.zeros((n_tiles, tile, width), dtype=np.int8)
        bias_noself[t, row, attn_col] = 1

    geo = None
    pos = None
    if (
        edge_feat is not None
        and node_pos is not None
        and "geo" in components
        and edge_feat.shape[1] == 4
    ):
        geo, pos = _try_build_geo(
            edge_feat, node_pos, senders, receivers, n_pad,
            n_tiles, width, tile, t, row, attn_col,
        )

    edge = None
    if edge_feat is not None and "edge" in components and geo is None:
        d_e = edge_feat.shape[1]
        edge = np.zeros((n_tiles, d_e, tile, width), dtype=np.float32)
        edge[t, :, row, attn_col] = np.asarray(edge_feat, dtype=np.float32)

    # The GIN adjacency stores exactly in bfloat16 (values 0/1), halving its
    # HBM traffic in the SpMM kernel; attention masks store int8 (see module
    # doc).  GCN coefficients keep float32 (0.4% bf16 rounding would break
    # the 1e-4-tolerance parity with the segment/dense backends).
    import ml_dtypes

    bf16 = ml_dtypes.bfloat16

    def _bf(a):
        return None if a is None else a.astype(bf16)

    # host-side numpy leaves (see graph.structs.build_padded_graph)
    return Band(
        adj=_bf(adj) if "adj" in components else None,
        gcn=gcn,
        bias_self=bias_self,
        bias_noself=bias_noself,
        tile=tile,
        # edge features keep float32: bf16 rounding (~0.4%) would break
        # backend parity of the edge-conditioned conv (same reason as gcn)
        edge=edge,
        geo=geo,
        pos=pos,
    )


def _try_build_geo(
    edge_feat, node_pos, senders, receivers, n_pad,
    n_tiles, width, tile, t, row, attn_col,
):
    """Factorized geometric edge planes, or (None, None) if the features
    aren't the geometric ``[unit dir(3), dist]`` of the node positions.

    Validates ``edge_feat ≈ [(pos_r − pos_s)/dist, dist]`` (the
    ``compute_edge_features`` convention — always true for graphs this
    framework builds; random-feature test fixtures fail the check and fall
    back to the generic "edge" planes).  Self-loops (zero features) store
    dist = 1/dist = 0, which reproduces their zero edge contribution.
    """
    ef = np.asarray(edge_feat, dtype=np.float32)
    pos = np.asarray(node_pos, dtype=np.float32)
    if pos.shape[0] < n_pad:
        pos = np.concatenate(
            [pos, np.zeros((n_pad - pos.shape[0], pos.shape[1]), np.float32)]
        )
    pos = pos[:n_pad]
    d = pos[receivers] - pos[senders]
    dist = np.linalg.norm(d, axis=1)
    nz = dist > 0
    recon = np.zeros_like(ef)
    recon[nz, :3] = d[nz] / dist[nz, None]
    recon[:, 3] = np.where(nz, dist, 0.0)
    scale_ref = max(float(np.abs(ef).max()), 1e-12)
    if not np.allclose(recon, ef, atol=1e-4 * scale_ref + 1e-6):
        return None, None

    geo = np.zeros((n_tiles, 2, tile, width), dtype=np.float32)
    inv = np.where(nz, 1.0 / np.maximum(dist, 1e-30), 0.0).astype(np.float32)
    geo[t, 0, row, attn_col] = np.where(nz, dist, 0.0).astype(np.float32)
    geo[t, 1, row, attn_col] = inv
    pos4 = np.zeros((n_pad, 4), dtype=np.float32)
    pos4[:, :3] = pos[:, :3]
    return geo, pos4
