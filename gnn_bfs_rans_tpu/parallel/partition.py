"""Node-sharded graph partitioning with halo exchange — large-mesh scaling.

The "sequence parallelism" analog for graphs (SURVEY.md §5 long-context row):
when a single mesh outgrows one chip's HBM, nodes are partitioned across the
device mesh and each message-passing layer exchanges a halo of boundary rows
with neighboring shards.

Because nodes are RCM-reordered (``graph.reorder``), adjacency is banded with
bandwidth ≪ tile, so a *contiguous* partition has all cross-shard edges within
one halo band of width ``halo`` (default 128) — each layer needs exactly one
``ppermute`` to each side (rides ICI), not an all-gather:

    x_ext layout per device: [ halo from d−1 | N_loc owned rows | halo from d+1 ]

Per layer: conv on the extended rows (halo outputs are garbage — their own
neighborhoods are incomplete), then the halo is refreshed from the owners'
freshly-computed values.  BatchNorm statistics psum across shards (exact
distributed BN).  Outputs are the owned rows, globally ordered by shard.

Memory per device: O(N/n_dev · H) — the path to meshes of tens of millions
of cells that a single chip cannot hold.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.structs import Graph
from ..models.flow_gnn import ModelConfig
from ..models.partitioned import PartitionedFlowGNN


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    """Per-shard stacked local graphs (leading axis = device).

    When the source graph carries a banded adjacency (``graph.band``) and the
    shard/halo boundaries are tile-aligned, the per-shard ``band_*`` tensors
    are contiguous slices of the global band — RCM-contiguous shards preserve
    the band structure exactly, so each shard runs the same Pallas MXU
    kernels as the single-chip path (halo rows extend the window).
    """

    node_feat: jax.Array   # [n_dev, N_ext, F]
    nbr_idx: jax.Array     # [n_dev, N_ext, D] — indices into the ext rows
    nbr_mask: jax.Array    # [n_dev, N_ext, D]
    real_mask: jax.Array   # [n_dev, N_ext] — real nodes incl. halo rows (convs)
    owned_mask: jax.Array  # [n_dev, N_ext] — owned real rows only (BN/output)
    in_degree: jax.Array   # [n_dev, N_ext] — true degrees, halo rows included

    halo: int = dataclasses.field(metadata=dict(static=True))
    n_loc: int = dataclasses.field(metadata=dict(static=True))
    n_nodes: int = dataclasses.field(metadata=dict(static=True))

    # banded adjacency slices for the Pallas kernels (see graph.band.Band)
    band_adj: jax.Array | None = None          # [n_dev, T_ext, W, T, T]
    band_gcn: jax.Array | None = None
    band_bias_self: jax.Array | None = None    # int8
    band_bias_noself: jax.Array | None = None  # int8
    band_edge: jax.Array | None = None         # [n_dev, T_ext, W, D_e, T, T]
    band_geo: jax.Array | None = None          # [n_dev, T_ext, W, 2, T, T]
    band_pos: jax.Array | None = None          # [n_dev, N_ext, 4]
    band_tile: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def n_dev(self) -> int:
        return self.node_feat.shape[0]

    @property
    def n_ext(self) -> int:
        return self.node_feat.shape[1]

    @property
    def has_band(self) -> bool:
        return self.band_tile > 0


def build_partition(
    graph: Graph, n_dev: int, halo: int = 128
) -> PartitionedGraph:
    """Split a (bandwidth-reordered) Graph into n_dev contiguous node shards.

    Requires ``n_pad % n_dev == 0`` and every edge within ``halo`` of its
    shard boundary (guaranteed when RCM bandwidth < halo).
    """
    n_pad = graph.n_pad
    if n_pad % n_dev != 0:
        raise ValueError(f"n_pad {n_pad} not divisible by {n_dev} shards")
    n_loc = n_pad // n_dev
    if n_loc < halo:
        raise ValueError(f"shard size {n_loc} smaller than halo {halo}")
    n_ext = n_loc + 2 * halo
    d_max = graph.max_degree

    g_nbr = np.asarray(graph.nbr_idx)
    g_mask = np.asarray(graph.nbr_mask)
    g_feat = np.asarray(graph.node_feat)
    g_nodemask = np.asarray(graph.node_mask)
    g_deg = np.asarray(graph.in_degree)
    f_dim = g_feat.shape[1]

    node_feat = np.zeros((n_dev, n_ext, f_dim), dtype=g_feat.dtype)
    nbr_idx = np.zeros((n_dev, n_ext, d_max), dtype=np.int32)
    nbr_mask = np.zeros((n_dev, n_ext, d_max), dtype=bool)
    real_mask = np.zeros((n_dev, n_ext), dtype=bool)
    owned_mask = np.zeros((n_dev, n_ext), dtype=bool)
    in_degree = np.zeros((n_dev, n_ext), dtype=g_deg.dtype)

    for d in range(n_dev):
        s, e = d * n_loc, (d + 1) * n_loc
        lo, hi = s - halo, e + halo
        src_lo, src_hi = max(lo, 0), min(hi, n_pad)
        dst_lo = src_lo - lo
        span = src_hi - src_lo
        node_feat[d, dst_lo:dst_lo + span] = g_feat[src_lo:src_hi]
        # degrees and real-node flags must be valid on halo rows too — GCN
        # coefficients of cross-boundary edges read the neighbor's degree
        real_mask[d, dst_lo:dst_lo + span] = g_nodemask[src_lo:src_hi]
        in_degree[d, dst_lo:dst_lo + span] = g_deg[src_lo:src_hi]
        # owned rows carry the aggregation structure; halo rows are inert.
        # Masked-out (padding) slots point at index 0 globally — retarget
        # them to the row itself so they stay inside the window.
        rows_global = np.arange(s, e)[:, None]
        shard_mask = g_mask[s:e]
        local = np.where(shard_mask, g_nbr[s:e], rows_global) - lo
        if len(local) and ((local < 0).any() or (local >= n_ext).any()):
            bad = int(
                np.where(shard_mask, np.abs(g_nbr[s:e] - rows_global), 0).max()
            )
            raise ValueError(
                f"edge exceeds halo {halo} on shard {d} (bandwidth {bad}); "
                "reorder the graph (rcm) or increase halo"
            )
        nbr_idx[d, halo:halo + n_loc] = local
        nbr_mask[d, halo:halo + n_loc] = g_mask[s:e]
        owned_mask[d, halo:halo + n_loc] = g_nodemask[s:e]

    band_slices, band_tile = _slice_band(graph, n_dev, n_loc, halo)

    return PartitionedGraph(
        node_feat=node_feat,
        nbr_idx=nbr_idx,
        nbr_mask=nbr_mask,
        real_mask=real_mask,
        owned_mask=owned_mask,
        in_degree=in_degree,
        halo=halo,
        n_loc=n_loc,
        n_nodes=graph.n_nodes,
        band_tile=band_tile,
        **band_slices,
    )


def _slice_band(
    graph: Graph, n_dev: int, n_loc: int, halo: int
) -> tuple[dict, int]:
    """Per-shard slices of the global banded adjacency.

    RCM-contiguous shards keep the band structure: shard ``d``'s extended
    rows are global rows ``[d·n_loc − halo, (d+1)·n_loc + halo)``, so its
    band tensors are the same contiguous slice of the global band (shifted
    window indexing is identity — window offsets are relative).  Owned tiles
    see their complete window as long as ``halo ≥ k0·tile``.

    Out-of-global-range tiles (outer halo of the first/last shard) stay
    all-zero; for ``bias_self`` their diagonal self-loop is set so the GAT
    kernel's every-row-has-an-entry invariant holds (cf. ``build_band``'s
    padding-row treatment; ``_transformer_kernel`` guards all-masked rows
    itself).
    """
    band = graph.band
    if band is None:
        return {}, 0
    tile = band.tile
    if halo % tile or n_loc % tile or halo < band.reach:
        # misaligned shard/halo boundaries (or halo narrower than the band
        # reach) — fall back to the dense partitioned path
        return {}, 0
    ht, lt = halo // tile, n_loc // tile
    n_ext_tiles = lt + 2 * ht
    n_tiles = graph.n_pad // tile

    out: dict[str, np.ndarray] = {}
    diag = np.arange(tile)
    for name in ("adj", "gcn", "bias_self", "bias_noself", "edge", "geo"):
        arr = getattr(band, name)
        if arr is None:
            continue
        arr = np.asarray(arr)
        local = np.zeros((n_dev, n_ext_tiles) + arr.shape[1:], dtype=arr.dtype)
        for d in range(n_dev):
            t_s = d * lt - ht
            src_lo, src_hi = max(t_s, 0), min(t_s + n_ext_tiles, n_tiles)
            local[d, src_lo - t_s:src_hi - t_s] = arr[src_lo:src_hi]
            if name == "bias_self":
                # out-of-global-range halo tiles: self-loop column of row i
                # in the [T, Wcols] attention layout is i + (Wcols − T)/2
                pad_left = (arr.shape[-1] - tile) // 2
                for j in list(range(0, src_lo - t_s)) + list(
                    range(src_hi - t_s, n_ext_tiles)
                ):
                    local[d, j, diag, diag + pad_left] = 1
        out[f"band_{name}"] = local
    if band.pos is not None:
        # node positions are row-indexed — slice like node_feat
        pos = np.asarray(band.pos)
        n_ext = (lt + 2 * ht) * tile
        local_pos = np.zeros((n_dev, n_ext, pos.shape[1]), dtype=pos.dtype)
        n_pad = n_tiles * tile
        for d in range(n_dev):
            s = d * n_loc - halo
            src_lo, src_hi = max(s, 0), min(s + n_ext, n_pad)
            local_pos[d, src_lo - s:src_hi - s] = pos[src_lo:src_hi]
        out["band_pos"] = local_pos
    return out, tile


def shard_partition(pgraph: PartitionedGraph, mesh: Mesh) -> PartitionedGraph:
    sh = NamedSharding(mesh, P("data"))
    return dataclasses.replace(
        pgraph,
        **{
            f.name: jax.device_put(getattr(pgraph, f.name), sh)
            for f in dataclasses.fields(pgraph)
            if f.name not in ("halo", "n_loc", "n_nodes", "band_tile")
            and getattr(pgraph, f.name) is not None
        },
    )


def _local_graph(pg: PartitionedGraph) -> Graph:
    """Assemble a per-device Graph view over the extended rows.

    ``pg`` holds this device's shard with a leading length-1 device axis
    (as seen inside ``shard_map``).  COO fields are unused by the dense and
    banded backends; single-entry dummies keep the container well-formed.
    When band slices are present, a local :class:`Band` is attached so the
    convs run the same Pallas kernels as the single-chip path.
    """
    from ..graph.band import Band

    node_feat = pg.node_feat[0]
    n_ext = node_feat.shape[0]
    band = None
    if pg.band_tile:
        band = Band(
            adj=None if pg.band_adj is None else pg.band_adj[0],
            gcn=None if pg.band_gcn is None else pg.band_gcn[0],
            bias_self=(None if pg.band_bias_self is None
                       else pg.band_bias_self[0]),
            bias_noself=(None if pg.band_bias_noself is None
                         else pg.band_bias_noself[0]),
            tile=pg.band_tile,
            edge=None if pg.band_edge is None else pg.band_edge[0],
            geo=None if pg.band_geo is None else pg.band_geo[0],
            pos=None if pg.band_pos is None else pg.band_pos[0],
        )
    dummy_e = jnp.zeros(8, jnp.int32)
    return Graph(
        node_feat=node_feat,
        senders=dummy_e,
        receivers=dummy_e,
        edge_feat=jnp.zeros((8, 4), jnp.float32),
        node_mask=pg.real_mask[0],
        edge_mask=jnp.zeros(8, bool),
        in_degree=pg.in_degree[0],
        nbr_idx=pg.nbr_idx[0],
        nbr_mask=pg.nbr_mask[0],
        nbr_edge=jnp.zeros_like(pg.nbr_idx[0]),
        n_nodes=n_ext,
        n_edges=0,
        band=band,
    )


def make_partitioned_forward(
    config: ModelConfig, mesh: Mesh, halo: int = 128
) -> Callable:
    """Jitted node-sharded forward: (params, batch_stats, pgraph) → [N, out].

    Parameter tree is identical to :class:`FlowGNN`'s (module names match), so
    any trained/ported checkpoint runs partitioned unchanged.
    """
    model = PartitionedFlowGNN(config, axis="data")

    def local_fwd(params, batch_stats, pg: PartitionedGraph):
        g = _local_graph(pg)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, g,
            owned_mask=pg.owned_mask[0], halo=halo, train=False,
        )
        n_loc = out.shape[0] - 2 * halo
        return out[halo:halo + n_loc][None]

    @jax.jit
    def forward(params, batch_stats, pgraph: PartitionedGraph):
        return jax.shard_map(
            local_fwd,
            mesh=mesh,
            in_specs=(P(), P(), P("data")),
            out_specs=P("data"),
            # pallas_call outputs don't carry varying-mesh-axis metadata yet;
            # vma checking would reject the banded kernels inside shard_map
            check_vma=False,
        )(params, batch_stats, pgraph)

    return forward


def gather_partitioned(out: jax.Array, pgraph: PartitionedGraph) -> np.ndarray:
    """[n_dev, N_loc, out] sharded → [n_nodes, out] host array in graph order."""
    host = np.asarray(jax.device_get(out))
    return host.reshape(-1, host.shape[-1])[: pgraph.n_nodes]


def shard_partitioned_targets(
    targets: np.ndarray, pgraph: PartitionedGraph, mesh: Mesh
) -> jax.Array:
    """[S, N_pad, 7] graph-order targets → [n_dev, S, N_loc, 7] sharded."""
    s = targets.shape[0]
    n_dev = pgraph.n_dev
    t = np.asarray(targets).reshape(s, n_dev, pgraph.n_loc, -1)
    t = np.transpose(t, (1, 0, 2, 3))
    return jax.device_put(t, NamedSharding(mesh, P("data")))


def make_partitioned_train_step(
    config: ModelConfig, train_cfg, mesh: Mesh, halo: int = 128
):
    """Node-sharded training: forward with halo exchange, loss on owned rows.

    Signature: ``(state, pgraph, targets, lr, rng) -> (state, loss)`` with
    ``targets`` as produced by :func:`shard_partitioned_targets`.  Params are
    replicated; per-shard gradients are psum'd explicitly in the local step
    (``check_vma=False`` — required by the Pallas kernels — disables
    shard_map's automatic cotangent reduction), yielding the exact global
    gradients.  Train-mode BatchNorm statistics psum over owned rows —
    identical to the full-graph statistics.
    """
    import jax.numpy as jnp
    import optax

    from ..train.loop import TrainState, _pressure_freeze_mask, make_optimizer
    from ..train.normalization import weighted_fieldwise_mse

    model = PartitionedFlowGNN(config, axis="data")
    tx = make_optimizer(train_cfg)

    def local_step(state, pg, targets_local, lr, rng):
        g = _local_graph(pg)
        own = pg.owned_mask[0]
        n_loc = own.shape[0] - 2 * halo
        tgt = targets_local[0]                    # [S, N_loc, 7]
        n_total = jnp.maximum(
            jax.lax.psum(jnp.sum(own.astype(jnp.float32)), "data"), 1.0
        )
        local_count = jnp.sum(own.astype(jnp.float32))

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                g, owned_mask=own, halo=halo, train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            out_owned = out[halo:halo + n_loc]
            own_rows = own[halo:halo + n_loc]
            ow = own_rows.astype(out.dtype)
            # per-snapshot MSE part on this shard's owned rows, weighted by
            # the shard's share of real nodes so the psum'd total equals the
            # global masked mean.  The pressure anchor is nonlinear in the
            # GLOBAL mean, so it is computed from psum'd sums instead.
            per = jax.vmap(
                lambda t: weighted_fieldwise_mse(
                    out_owned, t, own_rows, pressure_ref_weight=0.0,
                )
            )(tgt)
            share = jnp.mean(per) * (local_count / n_total)

            lam = train_cfg.pressure_ref_weight
            if lam > 0:
                p_pred_mean = jax.lax.psum(
                    jnp.sum(out_owned[:, 3] * ow), "data"
                ) / n_total
                p_tgt_means = jax.lax.psum(
                    jnp.sum(tgt[:, :, 3] * ow[None, :], axis=1), "data"
                ) / n_total                                  # [S]
                anchor = jnp.mean((p_pred_mean - p_tgt_means) ** 2)
                w_p = 3.0  # pressure field weight (DEFAULT_FIELD_WEIGHTS)
                n_dev = jax.lax.axis_size("data")
                share = share + w_p * lam * anchor / n_dev
            return share, mutated["batch_stats"]

        (share, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # With check_vma=False (needed for the Pallas kernels) shard_map no
        # longer auto-psums the cotangents of axis-invariant params — reduce
        # the per-shard gradients explicitly to the exact global gradient.
        grads = jax.lax.psum(grads, "data")
        loss = jax.lax.psum(share, "data")
        return loss, grads, new_bs

    from functools import partial

    @partial(jax.jit, static_argnames=("freeze_pressure",), donate_argnums=(0,))
    def step(state, pgraph: PartitionedGraph, targets, lr, rng,
             freeze_pressure: bool = False):
        loss, grads, new_bs = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,  # see make_partitioned_forward
        )(state, pgraph, targets, lr, rng)
        if freeze_pressure:
            grads = jax.tree_util.tree_map_with_path(_pressure_freeze_mask, grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        if freeze_pressure:
            updates = jax.tree_util.tree_map_with_path(
                _pressure_freeze_mask, updates
            )
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_bs, opt_state=new_opt,
        ), loss

    return step
