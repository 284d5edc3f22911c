"""Static padded graph containers for TPU-resident message passing.

The graph is static per mesh: it is built once on host (numpy), padded to
MXU/VPU-friendly sizes, and ``device_put`` a single time.  Every training step
then runs over fixed shapes — XLA never recompiles across snapshots
(SURVEY.md §7 architecture principle).

Two synchronized adjacency encodings are carried:

* **COO** (``senders``/``receivers``/``edge_feat``/``edge_mask``), sorted by
  receiver — drives ``jax.ops.segment_sum`` reference aggregation and the
  edge-parallel Pallas kernels;
* **padded dense neighbor layout** (``nbr_idx``/``nbr_mask`` of shape
  ``[N_pad, D_max]``) — for each destination cell, the source indices of its
  incoming edges.  Unstructured-mesh cell degree is tiny (≤ 4 for the 2D BFS
  quad mesh, ≤ 6 for hex meshes), so gather + masked reduction over ``D_max``
  turns scatter-free aggregation into dense VPU work.

Replaces the reference's per-snapshot PyG ``Data`` rebuild
(``graph_constructor.py:92-269``) with a single canonical graph
(fixes SURVEY.md §2 quirk 4: training and inference share one graph).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Graph:
    """A padded, device-residable static graph.

    Array fields are pytree leaves; ``n_nodes``/``n_edges``/shape info are
    static metadata so jitted functions specialize on them.
    """

    # --- COO encoding, sorted by receiver ---
    node_feat: jax.Array     # [N_pad, F] float32 — cell-center coordinates
    senders: jax.Array       # [E_pad] int32 (padded entries point at node 0)
    receivers: jax.Array     # [E_pad] int32
    edge_feat: jax.Array     # [E_pad, 4] float32 — [unit dir xyz, distance]
    node_mask: jax.Array     # [N_pad] bool
    edge_mask: jax.Array     # [E_pad] bool
    in_degree: jax.Array     # [N_pad] float32 — true in-degree (no self loop)

    # --- dense neighbor layout ---
    nbr_idx: jax.Array       # [N_pad, D_max] int32 — sender per incoming slot
    nbr_mask: jax.Array      # [N_pad, D_max] bool
    nbr_edge: jax.Array      # [N_pad, D_max] int32 — COO edge id per slot

    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_edges: int = dataclasses.field(metadata=dict(static=True))

    # Optional: node permutation (new index → original cell id) when the
    # graph was bandwidth-reordered (graph.reorder), and the banded adjacency
    # blocks for the Pallas MXU kernels (graph.band).
    perm: jax.Array | None = None          # [N_pad] int32
    band: "object | None" = None           # graph.band.Band

    @property
    def n_pad(self) -> int:
        return self.node_feat.shape[0]

    @property
    def e_pad(self) -> int:
        return self.senders.shape[0]

    @property
    def max_degree(self) -> int:
        return self.nbr_idx.shape[1]

    def to_device(self, sharding=None) -> "Graph":
        arrays = {
            f.name: getattr(self, f.name)
            for f in dataclasses.fields(self)
            if f.name not in ("n_nodes", "n_edges")
            and getattr(self, f.name) is not None
        }
        put = {
            k: (jax.device_put(v, sharding) if sharding is not None else jax.device_put(v))
            for k, v in arrays.items()
        }
        return dataclasses.replace(self, **put)


def build_padded_graph(
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_feat: np.ndarray,
    node_feat: np.ndarray,
    node_align: int = 128,
    edge_align: int = 128,
    degree_align: int = 4,
) -> Graph:
    """Pad a host-side COO graph into a :class:`Graph`.

    Edges are sorted by receiver (then sender, for determinism) so per-node
    incoming runs are contiguous — this both makes ``segment_sum`` use its
    sorted fast path and makes the dense neighbor layout a reshape-style
    scatter. Padded edges carry ``senders = receivers = 0`` and a zero mask,
    so masked aggregation ignores them.
    """
    n_nodes = int(node_feat.shape[0])
    n_edges = int(senders.shape[0])
    order = np.lexsort((senders, receivers))
    senders = np.asarray(senders, dtype=np.int32)[order]
    receivers = np.asarray(receivers, dtype=np.int32)[order]
    edge_feat = np.asarray(edge_feat, dtype=np.float32)[order]

    n_pad = _round_up(max(n_nodes, 1), node_align)
    e_pad = _round_up(max(n_edges, 1), edge_align)

    node_feat_p = np.zeros((n_pad, node_feat.shape[1]), dtype=np.float32)
    node_feat_p[:n_nodes] = node_feat
    senders_p = np.zeros(e_pad, dtype=np.int32)
    senders_p[:n_edges] = senders
    receivers_p = np.zeros(e_pad, dtype=np.int32)
    receivers_p[:n_edges] = receivers
    edge_feat_p = np.zeros((e_pad, edge_feat.shape[1]), dtype=np.float32)
    edge_feat_p[:n_edges] = edge_feat
    node_mask = np.zeros(n_pad, dtype=bool)
    node_mask[:n_nodes] = True
    edge_mask = np.zeros(e_pad, dtype=bool)
    edge_mask[:n_edges] = True

    deg = np.bincount(receivers, minlength=n_pad).astype(np.float32)

    # Dense neighbor layout from the receiver-sorted COO.
    max_deg = int(deg.max()) if n_edges else 1
    d_max = _round_up(max(max_deg, 1), degree_align)
    nbr_idx = np.zeros((n_pad, d_max), dtype=np.int32)
    nbr_mask = np.zeros((n_pad, d_max), dtype=bool)
    nbr_edge = np.zeros((n_pad, d_max), dtype=np.int32)
    if n_edges:
        # slot index within each receiver's contiguous run
        starts = np.searchsorted(receivers, np.arange(n_pad))
        slot = np.arange(n_edges) - starts[receivers]
        nbr_idx[receivers, slot] = senders
        nbr_mask[receivers, slot] = True
        nbr_edge[receivers, slot] = np.arange(n_edges, dtype=np.int32)

    # Leaves stay host-side numpy: construction never round-trips through the
    # accelerator (important when the device is behind a network tunnel);
    # `to_device()` uploads once, and jit auto-transfers if callers skip it.
    return Graph(
        node_feat=node_feat_p,
        senders=senders_p,
        receivers=receivers_p,
        edge_feat=edge_feat_p,
        node_mask=node_mask,
        edge_mask=edge_mask,
        in_degree=deg,
        nbr_idx=nbr_idx,
        nbr_mask=nbr_mask,
        nbr_edge=nbr_edge,
        n_nodes=n_nodes,
        n_edges=n_edges,
    )
