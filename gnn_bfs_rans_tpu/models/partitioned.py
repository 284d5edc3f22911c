"""FlowGNN forward over a node shard with per-layer halo exchange.

Mirror of :class:`~gnn_bfs_rans_tpu.models.flow_gnn.FlowGNN` — identical
module names, hence an identical parameter tree (checkpoints interchange) —
but each block refreshes the halo rows from the owning shards via
``jax.lax.ppermute`` before the next conv reads them.  Runs inside
``jax.shard_map`` over a 1-D device mesh (see ``parallel.partition``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..graph.structs import Graph
from .convs import CONV_REGISTRY, _lecun_linear
from .flow_gnn import ModelConfig
from .norm import MaskedBatchNorm


def halo_exchange(x: jax.Array, halo: int, axis: str) -> jax.Array:
    """Refresh halo rows from the neighboring shards' owned rows.

    Layout: ``[halo from d−1 | owned | halo from d+1]``.  Boundary shards
    (d=0 left, d=n−1 right) receive zeros — no edges point there.
    """
    n_dev = jax.lax.axis_size(axis)
    n_ext = x.shape[0]
    n_loc = n_ext - 2 * halo
    if n_dev == 1:
        return x
    fwd = [(d, d + 1) for d in range(n_dev - 1)]
    bwd = [(d + 1, d) for d in range(n_dev - 1)]
    # my last owned rows → right neighbor's left halo
    from_left = jax.lax.ppermute(x[n_loc:n_loc + halo], axis, fwd)
    # my first owned rows → left neighbor's right halo
    from_right = jax.lax.ppermute(x[halo:2 * halo], axis, bwd)
    return x.at[:halo].set(from_left).at[halo + n_loc:].set(from_right)


class PartitionedFlowGNN(nn.Module):
    config: ModelConfig
    axis: str = "data"

    @nn.compact
    def __call__(
        self, graph: Graph, owned_mask: jax.Array, halo: int,
        train: bool = False
    ) -> jax.Array:
        cfg = self.config
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        x = graph.node_feat
        x = _lecun_linear(cfg.hidden_dim, name="input_proj", dtype=dtype)(x)
        # input projection is per-node → halo rows are already correct

        conv_cls = CONV_REGISTRY[cfg.layer_type]
        # The banded Pallas kernels run per shard when the partition carries
        # band slices (contiguous RCM shards preserve the band structure);
        # otherwise the dense neighbor layout is the fallback.
        backend = cfg.backend if graph.band is not None else "dense"
        # Edge conditioning rides the banded edge tensor only — the
        # partitioned layout carries no per-edge COO features, so the
        # non-band fallbacks must run with edge_dim=None (mirrors the
        # conv's own band_ok gate, which needs the TPU Mosaic PRNG when
        # attention dropout is active).
        edge_ok = (
            cfg.use_edge_attr
            and backend == "pallas"
            and graph.band is not None
            and (graph.band.edge is not None or graph.band.geo is not None)
            and (cfg.dropout == 0 or not train
                 or jax.default_backend() == "tpu")
        )
        for i in range(cfg.num_layers):
            kwargs: dict[str, Any] = dict(
                features=cfg.hidden_dim, backend=backend, name=f"conv_{i}",
                dtype=dtype,
            )
            call_kwargs: dict[str, Any] = {}
            if cfg.layer_type == "GAT":
                kwargs.update(heads=cfg.heads, concat=False, dropout=cfg.dropout)
                call_kwargs["deterministic"] = not train
            elif cfg.layer_type == "Transformer":
                kwargs.update(
                    heads=cfg.heads, concat=False, dropout=cfg.dropout,
                    edge_dim=(graph.edge_feat.shape[1] if edge_ok else None),
                )
                call_kwargs["deterministic"] = not train
            x_new = conv_cls(**kwargs)(x, graph, **call_kwargs)

            x = x + x_new
            if cfg.use_batch_norm and cfg.norm_type == "batch":
                # statistics over OWNED real rows only (each node counted
                # exactly once across the mesh), psum'd → exact global BN
                x = MaskedBatchNorm(
                    cfg.hidden_dim, name=f"bn_{i}", axis_name=self.axis
                )(
                    x.astype(jnp.float32), owned_mask,
                    use_running_average=not train,
                )
                if dtype is not None:
                    x = x.astype(dtype)
            elif cfg.use_batch_norm and cfg.norm_type == "layer":
                x = nn.LayerNorm(name=f"bn_{i}", dtype=dtype)(x)
            x = nn.relu(x)
            if cfg.dropout > 0 and train:
                rng = self.make_rng("dropout")
                rng = jax.random.fold_in(rng, jax.lax.axis_index(self.axis))
                keep = jax.random.bernoulli(rng, 1 - cfg.dropout, x.shape)
                x = x * keep / (1 - cfg.dropout)
            # halo rows were computed with incomplete neighborhoods — refresh
            # them from their owners before the next conv reads them
            x = halo_exchange(x, halo, self.axis)

        h = _lecun_linear(cfg.hidden_dim, name="out_0", dtype=dtype)(x)
        h = nn.relu(h)
        h = _lecun_linear(cfg.hidden_dim, name="out_1", dtype=dtype)(h)
        h = nn.relu(h)
        h = _lecun_linear(cfg.hidden_dim // 2, name="out_2", dtype=dtype)(h)
        h = nn.relu(h)
        out = _lecun_linear(cfg.output_dim, name="out_3")(
            h.astype(jnp.float32) if dtype is not None else h
        )
        return out
