"""FlowGNN — the flagship RANS flow-surrogate model.

Architecture parity with ``/root/reference/gnn_model.py:14-220`` (``FlowGNN``):
``Linear(3→H)`` input projection, ``L`` blocks of {conv, residual add,
BatchNorm, ReLU, dropout}, and the 4-layer output MLP ``H→H→H→H/2→out`` with
interleaved ReLU/dropout (``gnn_model.py:90-100``).  Output layout is
``[U(3), p, k, epsilon, nut]`` (+ optional residual channel when
``output_dim > 7``).

Differences by design (TPU-first):

* operates on the static padded :class:`~gnn_bfs_rans_tpu.graph.structs.Graph`
  — no runtime edge validation/repair (``gnn_model.py:125-156``); invariants
  are asserted once at graph build;
* batch normalization is masked over real nodes (padding excluded);
* the whole forward is jit-compatible: no data-dependent Python control flow.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..graph.structs import Graph
from .convs import CONV_REGISTRY, _lecun_linear
from .norm import FusedEpilogueBN, MaskedBatchNorm

FIELD_NAMES = ("U", "p", "k", "epsilon", "nut")
FIELD_SLICES = {"U": (0, 3), "p": (3, 4), "k": (4, 5), "epsilon": (5, 6), "nut": (6, 7)}


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Hyperparameters; defaults mirror the reference training CLI

    (``train.py:276-282``: hidden 256, 6 layers, GCN) with model-level
    defaults from ``gnn_model.py:20-30``.
    """

    input_dim: int = 3
    hidden_dim: int = 256
    output_dim: int = 7
    num_layers: int = 6
    layer_type: str = "GCN"      # GCN | GAT | GIN | Transformer
    heads: int = 4
    dropout: float = 0.1
    use_batch_norm: bool = True
    # 'batch' (reference parity) | 'layer' (per-node, DP/jit-trivial) | 'none'
    norm_type: str = "batch"
    use_edge_attr: bool = True   # feeds edge features to Transformer conv
    backend: str = "dense"       # segment | dense | pallas
    # float32 | bfloat16 | mixed (params stay f32 in all modes).
    # 'mixed': bfloat16 inside the convs and output MLP (MXU speed path) but
    # a float32 residual stream — the per-layer epilogue (residual add + BN +
    # ReLU + dropout) runs in f32, so rounding noise enters once per conv
    # instead of compounding through every elementwise op across layers.
    # Motivation (round-5 measurement): pure-bf16 activations put a
    # forward-noise floor of ~0.02 MAE(U) under the flagship accuracy bar —
    # f32-trained params evaluate at 0.0078 (f32) vs 0.0285 (bf16 forward);
    # the mixed stream keeps most of the bf16 speed while removing the
    # cross-layer accumulation term.
    compute_dtype: str = "float32"
    # Fused-projection eval kernel for the edge-conditioned Transformer
    # (q/k/v projected inside the Pallas kernel).  Off by default: measured
    # slower than the unfused path on the BFS mesh (see models/convs.py NOTE).
    fuse_eval: bool = False
    # Fused-projection GAT kernel in TRAINING too: z never round-trips HBM
    # in the forward; the custom VJP re-projects it for the backward.
    # Default ON: measured 3.71 → 3.16 ms/step (1.17×) on the flagship GAT
    # train config (tools/profile_fuse_train.py, artifacts/fuse_train_ab.json).
    fuse_train: bool = True
    # Fused residual+BN+ReLU+dropout training epilogue (kernels.epilogue):
    # ONE Pallas pass replaces the XLA chain, and the custom VJP stores only
    # the residual sum — no dropout/ReLU masks, no f32 normalization
    # intermediates.  Training-path only (eval keeps the running-stats
    # affine); applies when backend='pallas' and norm_type='batch'.
    fuse_epilogue: bool = True
    # Rematerialize each conv under jax.checkpoint: activations inside the
    # conv are recomputed in the backward instead of stored.  Mostly
    # obsolete for the GAT fuse_train path: its custom VJP keeps only conv
    # INPUTS as residuals, so the remat replay is dead code and the memory
    # saving is nil — 1M-cell training fits and runs fastest with remat
    # off (BENCHMARKS.md scale table).  Still meaningful for the unfused /
    # Transformer paths whose projections are stored residuals.
    remat: bool = False

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ModelConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class FlowGNN(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(
        self, graph: Graph, train: bool = False
    ) -> jax.Array:
        cfg = self.config
        mixed = cfg.compute_dtype == "mixed"
        dtype = (
            jnp.bfloat16
            if cfg.compute_dtype in ("bfloat16", "mixed")
            else None
        )
        x = graph.node_feat
        x = _lecun_linear(cfg.hidden_dim, name="input_proj", dtype=dtype)(x)
        if mixed:
            # f32 residual stream: convs see bf16 (cast at entry), their
            # outputs rejoin the stream in f32; BN/ReLU/dropout stay f32
            x = x.astype(jnp.float32)

        conv_cls = CONV_REGISTRY[cfg.layer_type]
        if cfg.remat:
            # static_argnums counts the __call__ args with self at 0:
            # (self, x, graph[, deterministic]) — the attention convs take a
            # static deterministic flag, GCN/GIN don't
            has_det = cfg.layer_type in ("GAT", "Transformer")
            conv_cls = nn.remat(
                conv_cls, static_argnums=(3,) if has_det else ()
            )
        for i in range(cfg.num_layers):
            kwargs: dict[str, Any] = dict(
                features=cfg.hidden_dim, backend=cfg.backend, name=f"conv_{i}",
                dtype=dtype,
            )
            call_args: tuple = ()
            if cfg.layer_type == "GAT":
                kwargs.update(heads=cfg.heads, concat=False,
                              dropout=cfg.dropout, fuse_train=cfg.fuse_train)
                call_args = (not train,)
            elif cfg.layer_type == "Transformer":
                kwargs.update(
                    heads=cfg.heads,
                    concat=False,
                    dropout=cfg.dropout,
                    edge_dim=(graph.edge_feat.shape[1] if cfg.use_edge_attr else None),
                    fuse_eval=cfg.fuse_eval,
                )
                call_args = (not train,)
            layer = conv_cls(**kwargs)
            x_in = x.astype(jnp.bfloat16) if mixed else x
            x_new = layer(x_in, graph, *call_args)
            if mixed:
                x_new = x_new.astype(jnp.float32)

            fused_ep = (
                cfg.fuse_epilogue
                and train
                and cfg.backend == "pallas"
                and cfg.use_batch_norm
                and cfg.norm_type == "batch"
            )
            if fused_ep:
                # residual→BN→ReLU→dropout in one kernel (gnn_model.py:184-192);
                # same param/variable names as the unfused path below
                x = FusedEpilogueBN(
                    cfg.hidden_dim, rate=cfg.dropout, name=f"bn_{i}"
                )(x, x_new, graph.n_nodes, train)
                continue

            x = x + x_new  # residual (gnn_model.py:184)
            if cfg.use_batch_norm and cfg.norm_type == "batch":
                # statistics accumulate in float32 inside MaskedBatchNorm;
                # the normalization itself stays in the compute dtype
                x = MaskedBatchNorm(cfg.hidden_dim, name=f"bn_{i}")(
                    x, graph.node_mask, use_running_average=not train,
                )
            elif cfg.use_batch_norm and cfg.norm_type == "layer":
                # per-node LayerNorm: no cross-node statistics → identical in
                # train/eval, padding-safe, and trivially correct under any
                # sharding (the BN alternative named in SURVEY.md §7)
                x = nn.LayerNorm(
                    name=f"bn_{i}", dtype=None if mixed else dtype
                )(x)
            x = nn.relu(x)
            x = nn.Dropout(cfg.dropout, name=f"drop_{i}")(
                x, deterministic=not train
            )

        # Output MLP: H→H→H→H/2→out with ReLU+dropout (gnn_model.py:90-100).
        h = _lecun_linear(cfg.hidden_dim, name="out_0", dtype=dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(cfg.dropout, name="out_drop_0")(h, deterministic=not train)
        h = _lecun_linear(cfg.hidden_dim, name="out_1", dtype=dtype)(h)
        h = nn.relu(h)
        h = nn.Dropout(cfg.dropout, name="out_drop_1")(h, deterministic=not train)
        h = _lecun_linear(cfg.hidden_dim // 2, name="out_2", dtype=dtype)(h)
        h = nn.relu(h)
        # final head always emits float32 (loss/metrics precision)
        out = _lecun_linear(cfg.output_dim, name="out_3")(
            h.astype(jnp.float32) if dtype is not None else h
        )
        return out


def split_fields(output: jax.Array) -> dict[str, jax.Array]:
    """Slice model output into named fields (``gnn_model.py:199-220``)."""
    fields = {name: output[:, a:b] for name, (a, b) in FIELD_SLICES.items()}
    if output.shape[1] > 7:
        fields["residual"] = output[:, 7:8]
    return fields


class FlowGNNSurrogate(nn.Module):
    """Encoder-decoder surrogate with optional additive BC embedding.

    Parity with ``gnn_model.py:223-291`` (``FlowGNNSurrogate``): two stacked
    FlowGNNs of ``num_layers // 2`` each; boundary-condition features are
    added between the stages when provided.
    """

    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        graph: Graph,
        boundary_conditions: jax.Array | None = None,
        train: bool = False,
    ) -> jax.Array:
        cfg = self.config
        enc_cfg = dataclasses.replace(
            cfg, output_dim=cfg.hidden_dim, num_layers=max(cfg.num_layers // 2, 1)
        )
        dec_cfg = dataclasses.replace(
            cfg,
            input_dim=cfg.hidden_dim,
            num_layers=max(cfg.num_layers // 2, 1),
        )
        encoded = FlowGNN(enc_cfg, name="encoder")(graph, train=train)
        if boundary_conditions is not None:
            encoded = encoded + boundary_conditions
        graph_dec = dataclasses.replace(graph, node_feat=encoded)
        return FlowGNN(dec_cfg, name="decoder")(graph_dec, train=train)
