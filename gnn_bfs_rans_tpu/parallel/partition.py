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
    """Per-shard stacked local graphs (leading axis = device)."""

    node_feat: jax.Array   # [n_dev, N_ext, F]
    nbr_idx: jax.Array     # [n_dev, N_ext, D] — indices into the ext rows
    nbr_mask: jax.Array    # [n_dev, N_ext, D]
    real_mask: jax.Array   # [n_dev, N_ext] — real nodes incl. halo rows (convs)
    owned_mask: jax.Array  # [n_dev, N_ext] — owned real rows only (BN/output)
    in_degree: jax.Array   # [n_dev, N_ext] — true degrees, halo rows included

    halo: int = dataclasses.field(metadata=dict(static=True))
    n_loc: int = dataclasses.field(metadata=dict(static=True))
    n_nodes: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_dev(self) -> int:
        return self.node_feat.shape[0]

    @property
    def n_ext(self) -> int:
        return self.node_feat.shape[1]


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
    )


def shard_partition(pgraph: PartitionedGraph, mesh: Mesh) -> PartitionedGraph:
    sh = NamedSharding(mesh, P("data"))
    return dataclasses.replace(
        pgraph,
        **{
            f.name: jax.device_put(getattr(pgraph, f.name), sh)
            for f in dataclasses.fields(pgraph)
            if f.name not in ("halo", "n_loc", "n_nodes")
        },
    )


def _local_graph(pg_leaves: dict, halo: int) -> Graph:
    """Assemble a per-device Graph view over the extended rows.

    COO fields are unused by the dense backend; single-entry dummies keep the
    container well-formed.
    """
    node_feat = pg_leaves["node_feat"]
    n_ext = node_feat.shape[0]
    dummy_e = jnp.zeros(8, jnp.int32)
    return Graph(
        node_feat=node_feat,
        senders=dummy_e,
        receivers=dummy_e,
        edge_feat=jnp.zeros((8, 4), jnp.float32),
        node_mask=pg_leaves["real_mask"],
        edge_mask=jnp.zeros(8, bool),
        in_degree=pg_leaves["in_degree"],
        nbr_idx=pg_leaves["nbr_idx"],
        nbr_mask=pg_leaves["nbr_mask"],
        nbr_edge=jnp.zeros_like(pg_leaves["nbr_idx"]),
        n_nodes=n_ext,
        n_edges=0,
    )


def make_partitioned_forward(
    config: ModelConfig, mesh: Mesh, halo: int = 128
) -> Callable:
    """Jitted node-sharded forward: (params, batch_stats, pgraph) → [N, out].

    Parameter tree is identical to :class:`FlowGNN`'s (module names match), so
    any trained/ported checkpoint runs partitioned unchanged.
    """
    model = PartitionedFlowGNN(config, axis="data")

    def local_fwd(params, batch_stats, node_feat, nbr_idx, nbr_mask,
                  real_mask, owned_mask, in_degree):
        leaves = {
            "node_feat": node_feat[0],
            "nbr_idx": nbr_idx[0],
            "nbr_mask": nbr_mask[0],
            "real_mask": real_mask[0],
            "in_degree": in_degree[0],
        }
        g = _local_graph(leaves, halo)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, g,
            owned_mask=owned_mask[0], halo=halo, train=False,
        )
        n_loc = out.shape[0] - 2 * halo
        return out[halo:halo + n_loc][None]

    @jax.jit
    def forward(params, batch_stats, pgraph: PartitionedGraph):
        return jax.shard_map(
            local_fwd,
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), P("data"), P("data"),
                      P("data"), P("data")),
            out_specs=P("data"),
        )(params, batch_stats, pgraph.node_feat, pgraph.nbr_idx,
          pgraph.nbr_mask, pgraph.real_mask, pgraph.owned_mask,
          pgraph.in_degree)

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
    replicated; ``jax.grad`` inside shard_map auto-psums the cotangents over
    the data axis, so the returned gradients are the exact global gradients
    (see ``data_parallel``).  Train-mode BatchNorm statistics psum over owned
    rows — identical to the full-graph statistics.
    """
    import jax.numpy as jnp
    import optax

    from ..train.loop import TrainState, _pressure_freeze_mask, make_optimizer
    from ..train.normalization import weighted_fieldwise_mse

    model = PartitionedFlowGNN(config, axis="data")
    tx = make_optimizer(train_cfg)

    def local_step(state, node_feat, nbr_idx, nbr_mask, real_mask,
                   owned_mask, in_degree, targets_local, lr, rng):
        leaves = {
            "node_feat": node_feat[0],
            "nbr_idx": nbr_idx[0],
            "nbr_mask": nbr_mask[0],
            "real_mask": real_mask[0],
            "in_degree": in_degree[0],
        }
        g = _local_graph(leaves, halo)
        own = owned_mask[0]
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
        loss = jax.lax.psum(share, "data")
        return loss, grads, new_bs

    from functools import partial

    @partial(jax.jit, static_argnames=("freeze_pressure",), donate_argnums=(0,))
    def step(state, pgraph: PartitionedGraph, targets, lr, rng,
             freeze_pressure: bool = False):
        loss, grads, new_bs = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data"), P("data"),
                      P("data"), P("data"), P("data"), P(), P()),
            out_specs=(P(), P(), P()),
        )(state, pgraph.node_feat, pgraph.nbr_idx, pgraph.nbr_mask,
          pgraph.real_mask, pgraph.owned_mask, pgraph.in_degree,
          targets, lr, rng)
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
