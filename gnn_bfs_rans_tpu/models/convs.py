"""Message-passing conv zoo: GCN / GAT / GIN / Graph-Transformer.

Re-implements the semantics of the four conv variants the reference
instantiates from torch_geometric (``gnn_model.py:62-84``) as pure JAX modules
over the static padded :class:`~gnn_bfs_rans_tpu.graph.structs.Graph`:

* ``GCNConv``  — symmetric-normalized aggregation with self-loops,
  ``D̂^-1/2 (A+I) D̂^-1/2 X W + b`` (PyG ``GCNConv`` defaults);
* ``GATConv``  — per-edge additive attention, LeakyReLU slope 0.2,
  self-loops, ``heads=4, concat=False`` → mean over heads (PyG defaults);
* ``GINConv``  — ``MLP((1+eps)·x_i + Σ_j x_j)`` with the reference's
  2-layer MLP (``gnn_model.py:70-75``), no self-loops;
* ``TransformerConv`` — scaled dot-product attention over neighbors,
  ``heads=4, concat=False``, root weight; optionally conditions keys and
  values on edge features (``edge_dim``) — first-class here, whereas the
  reference computed edge attributes but never fed them to the conv
  (SURVEY.md §2 quirk 3).

Exact weight-for-weight parity with the PyTorch checkpoints is required by
BASELINE.md ("prediction parity"), so parameter shapes/initialization mirror
the torch modules and ``compat.torch_port`` maps state dicts onto these names.

Each conv supports two aggregation backends over the same Graph:
``segment`` (COO ``jax.ops.segment_*``; ground truth) and ``dense`` (padded
neighbor gather + masked reduce; the fast TPU path).  ``pallas`` uses the
fused Mosaic kernels from :mod:`gnn_bfs_rans_tpu.kernels` where profitable.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..graph.structs import Graph
from ..kernels import banded as _banded
from ..ops import dense as dops
from ..ops import segment as sops

Backend = str  # 'segment' | 'dense' | 'pallas'


def _lecun_linear(
    features: int,
    use_bias: bool = True,
    name: str | None = None,
    dtype=None,
):
    """Linear layer with torch-style (Kaiming-uniform) init for parity of scale.

    ``dtype`` is the computation dtype (params stay float32): pass
    ``jnp.bfloat16`` to run the matmul on the MXU's native precision.
    """
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class GCNConv(nn.Module):
    """Symmetric-normalized graph convolution (Kipf & Welling) with self-loops."""

    features: int
    backend: Backend = "dense"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, graph: Graph) -> jax.Array:
        h = _lecun_linear(self.features, use_bias=False, name="lin", dtype=self.dtype)(x)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if (self.backend == "pallas" and graph.band is not None
                and graph.band.gcn is not None):
            # band.gcn already carries D̂^-1/2 (A+I) D̂^-1/2 incl. self-loops
            from ..kernels.banded import banded_spmm
            # bias in the compute dtype: a raw f32-param add would
            # promote every inter-layer activation to f32 (measured as
            # add_convert fusions + doubled epilogue HBM traffic at 1M)
            out = banded_spmm(graph.band.gcn, h)
            return out + bias.astype(out.dtype)

        deg_hat = graph.in_degree + 1.0  # self-loop counted
        inv_sqrt = jax.lax.rsqrt(jnp.maximum(deg_hat, 1.0))
        inv_sqrt = jnp.where(graph.node_mask, inv_sqrt, 0.0)

        if self.backend == "segment":
            w = inv_sqrt[graph.senders] * inv_sqrt[graph.receivers]
            agg = sops.aggregate_sum(
                h, graph.senders, graph.receivers, graph.n_pad,
                edge_mask=graph.edge_mask, edge_weight=w,
            )
        elif self.backend in ("dense", "pallas"):  # pallas w/o band → dense
            # coeff[i, d] = 1/sqrt(deĝ_i deĝ_{nbr[i,d]})
            coeff = inv_sqrt[:, None] * inv_sqrt[graph.nbr_idx]
            agg = dops.masked_sum(h, graph.nbr_idx, graph.nbr_mask, coeff)
        else:
            raise ValueError(f"unknown backend {self.backend!r}")

        # self-loop contribution: 1/deĝ_i
        agg = agg + h * (inv_sqrt * inv_sqrt)[:, None]
        return agg + bias.astype(agg.dtype)


class GATConv(nn.Module):
    """Graph attention (Veličković) — additive logits, self-loops, mean heads."""

    features: int
    heads: int = 4
    concat: bool = False
    negative_slope: float = 0.2
    dropout: float = 0.0
    backend: Backend = "dense"
    dtype: Any = None
    # opt-in: use the fused-projection kernel for TRAINING too (backward
    # re-projects z via the custom VJP instead of storing it) — A/B measured,
    # see ModelConfig.fuse_train
    fuse_train: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, graph: Graph, deterministic: bool = True
    ) -> jax.Array:
        H, C = self.heads, self.features
        lin = _lecun_linear(H * C, use_bias=False, name="lin", dtype=self.dtype)
        # Fused-projection inference path: z = x·W happens inside the Pallas
        # kernel (per sender block, in VMEM) so the [N, H·C] z array never
        # round-trips HBM.  Eval/no-grad only — the training path keeps the
        # separate projection whose z is a backward residual.  The α logits
        # factor through W (α = x·(W·amat)), so z2d is never needed outside.
        fuse = (
            (deterministic or self.fuse_train)
            and not self.concat
            and self.backend == "pallas"
            and graph.band is not None
            and graph.band.bias_self is not None
        )
        if fuse:
            from ..kernels.banded import banded_gat_mean_fused

            # materialize W via the Dense trick (parameter naming unchanged)
            w = lin(jnp.eye(x.shape[1], dtype=x.dtype))  # [F, H·C]
            att_src = self.param(
                "att_src",
                nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
                (1, H, C),
            )
            att_dst = self.param(
                "att_dst",
                nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
                (1, H, C),
            )
            eye = jnp.eye(H, dtype=jnp.float32)
            amat = jnp.concatenate(
                [(eye[:, None, :] * att_src[0][:, :, None]).reshape(H * C, H),
                 (eye[:, None, :] * att_dst[0][:, :, None]).reshape(H * C, H)],
                axis=1,
            )
            # packed α in ONE matmul (no narrow src/dst split in HBM —
            # f32[N, H] tensors tile to T(8,128), 16-32× padding waste;
            # in-kernel α was measured slower, see banded_gat_mean_fused_fwd)
            wa = (w.astype(jnp.float32) @ amat).astype(x.dtype)  # [F, 2H]
            rate, seed = 0.0, None
            if self.dropout > 0 and not deterministic:
                rate = self.dropout
                seed = _dropout_seed(self.make_rng("dropout"))
            if deterministic:
                alphas = jnp.dot(x, wa, preferred_element_type=jnp.float32)
                out2d = banded_gat_mean_fused(
                    graph.band.bias_self, w, alphas, x,
                    H, self.negative_slope, rate, seed,
                )
            else:
                # training: the α matmul moves inside the vjp boundary so
                # the backward can fold dα in-kernel on the large-shape
                # project path (see banded_gat_mean_fused_wa)
                from ..kernels.banded import banded_gat_mean_fused_wa

                out2d = banded_gat_mean_fused_wa(
                    graph.band.bias_self, w, wa, x,
                    H, self.negative_slope, rate, seed,
                )
            bias = self.param("bias", nn.initializers.zeros, (C,))
            return out2d + bias.astype(out2d.dtype)

        z2d = lin(x)
        att_src = self.param(
            "att_src", nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (1, H, C),
        )
        att_dst = self.param(
            "att_dst", nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (1, H, C),
        )
        # α_h = Σ_c z[:,h,c]·att[h,c], evaluated as ONE MXU matmul against a
        # block-diagonal [H·C, 2H] matrix — XLA lowers the equivalent
        # jnp.sum(z·att, -1) to a strided cross-lane reduce (~36 µs/layer on
        # the BFS mesh vs ~4 µs for the matmul form)
        eye = jnp.eye(H, dtype=jnp.float32)
        amat = jnp.concatenate(
            [(eye[:, None, :] * att_src[0][:, :, None]).reshape(H * C, H),
             (eye[:, None, :] * att_dst[0][:, :, None]).reshape(H * C, H)],
            axis=1,
        )
        alphas = jnp.dot(z2d, amat.astype(z2d.dtype),
                         preferred_element_type=jnp.float32)  # [N, 2H]
        z = z2d.reshape(-1, H, C)

        def leaky(v):
            return jax.nn.leaky_relu(v, self.negative_slope)

        drop_active = self.dropout > 0 and not deterministic
        use_pallas = (
            self.backend == "pallas"
            and graph.band is not None
            and graph.band.bias_self is not None
            # attention dropout runs in-kernel: Mosaic PRNG on TPU, a
            # counter-based hash in interpret mode (kernels.banded._hash_bits)
            # so the flagship pallas+dropout config is CPU-testable too
        )
        out2d = None  # set when the head-mean epilogue is fused in-kernel
        if use_pallas:
            from ..kernels.banded import (
                banded_gat_mean_packed,
                banded_gat_packed,
            )

            rate, seed = 0.0, None
            if drop_active:
                rate = self.dropout
                seed = _dropout_seed(self.make_rng("dropout"))
            # PACKED α straight into the kernel — the src/dst split of a
            # narrow f32[N, H] array is 16-32× its logical bytes under
            # T(8,128) tiling (see kernels.banded._gat_kernel)
            kernel_fn = (banded_gat_packed if self.concat
                         else banded_gat_mean_packed)
            out = kernel_fn(
                graph.band.bias_self,
                z2d,
                alphas,
                H,
                self.negative_slope,
                rate,
                seed,
            )
            if self.concat:
                out = out.reshape(-1, H, C)
            else:
                out2d = out
        elif self.backend == "segment":
            alpha_src, alpha_dst = alphas[:, :H], alphas[:, H:]
            # self-loops appended virtually: include (i, i) logits via concat
            e_logit = leaky(alpha_src[graph.senders] + alpha_dst[graph.receivers])
            self_logit = leaky(alpha_src + alpha_dst)  # [N, H]
            # stable softmax over {edges into i} ∪ {self}
            seg_max = sops.segment_max_to_nodes(
                e_logit, graph.receivers, graph.n_pad, graph.edge_mask
            )
            m = jnp.maximum(seg_max, self_logit)
            e_exp = jnp.exp(e_logit - m[graph.receivers])
            e_exp = jnp.where(graph.edge_mask[:, None], e_exp, 0.0)
            s_exp = jnp.exp(self_logit - m)
            denom = (
                sops.segment_sum_to_nodes(e_exp, graph.receivers, graph.n_pad) + s_exp
            )
            denom = jnp.maximum(denom, 1e-16)
            attn_e = e_exp / denom[graph.receivers]
            attn_s = s_exp / denom
            if self.dropout > 0 and not deterministic:
                rng = self.make_rng("dropout")
                keep = jax.random.bernoulli(
                    rng, 1 - self.dropout, (graph.e_pad + graph.n_pad, H)
                )
                attn_e = attn_e * keep[: graph.e_pad] / (1 - self.dropout)
                attn_s = attn_s * keep[graph.e_pad :] / (1 - self.dropout)
            msg = z[graph.senders] * attn_e[:, :, None]
            out = sops.segment_sum_to_nodes(
                msg, graph.receivers, graph.n_pad, graph.edge_mask
            )
            out = out + z * attn_s[:, :, None]
        else:
            alpha_src, alpha_dst = alphas[:, :H], alphas[:, H:]
            logits = leaky(
                alpha_src[graph.nbr_idx] + alpha_dst[:, None, :]
            )  # [N, D, H]
            self_logit = leaky(alpha_src + alpha_dst)
            if self.dropout > 0 and not deterministic:
                # attention dropout applied inside aggregate via masking attn
                attn_full = _attn_with_self(logits, graph.nbr_mask, self_logit)
                rng = self.make_rng("dropout")
                keep = jax.random.bernoulli(rng, 1 - self.dropout, attn_full.shape)
                attn_full = attn_full * keep / (1 - self.dropout)
                out = _weighted_gather(z, graph.nbr_idx, attn_full)
            else:
                out = dops.attention_aggregate(
                    z, logits, graph.nbr_idx, graph.nbr_mask,
                    self_logit=self_logit, self_value=z,
                )

        if self.concat:
            out = out.reshape(-1, H * C)
            bias = self.param("bias", nn.initializers.zeros, (H * C,))
        else:
            out = out2d if out2d is not None else out.mean(axis=1)
            bias = self.param("bias", nn.initializers.zeros, (C,))
        return out + bias.astype(out.dtype)


def _dropout_seed(rng: jax.Array) -> jax.Array:
    """Derive a [1] int32 seed for the in-kernel attention-dropout PRNG."""
    return jax.random.randint(rng, (1,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)


def _attn_with_self(logits, nbr_mask, self_logit):
    n = logits.shape[0]
    full = jnp.concatenate([logits, self_logit[:, None, :]], axis=1)
    mask = jnp.concatenate([nbr_mask, jnp.ones((n, 1), dtype=bool)], axis=1)
    return dops.masked_softmax(full, mask, axis=1)


def _weighted_gather(values, nbr_idx, attn_full):
    nbr_vals = jnp.take(values, nbr_idx, axis=0)  # [N, D, H, C]
    nbr_vals = jnp.concatenate([nbr_vals, values[:, None]], axis=1)
    return jnp.einsum("ndh,ndhc->nhc", attn_full, nbr_vals)


class GINConv(nn.Module):
    """Graph isomorphism conv: MLP((1+eps)x + Σ_nbr x); reference MLP is H→H→H."""

    features: int
    train_eps: bool = False
    backend: Backend = "dense"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, graph: Graph) -> jax.Array:
        if (self.backend == "pallas" and graph.band is not None
                and graph.band.adj is not None):
            from ..kernels.banded import banded_spmm
            agg = banded_spmm(graph.band.adj, x)
        elif self.backend == "segment":
            agg = sops.aggregate_sum(
                x, graph.senders, graph.receivers, graph.n_pad,
                edge_mask=graph.edge_mask,
            )
        else:
            agg = dops.masked_sum(x, graph.nbr_idx, graph.nbr_mask)
        if self.train_eps:
            eps = self.param("eps", nn.initializers.zeros, ())
        else:
            eps = 0.0
        h = (1.0 + eps) * x + agg
        h = _lecun_linear(self.features, name="mlp_0", dtype=self.dtype)(h)
        h = nn.relu(h)
        h = _lecun_linear(self.features, name="mlp_1", dtype=self.dtype)(h)
        return h


class TransformerConv(nn.Module):
    """Graph transformer conv (Shi et al.): dot-product attention over neighbors."""

    features: int
    heads: int = 4
    concat: bool = False
    dropout: float = 0.0
    edge_dim: int | None = None
    root_weight: bool = True
    backend: Backend = "dense"
    dtype: Any = None
    # opt-in fused-projection eval kernel (q/k/v projected in-kernel; see the
    # NOTE below for why it is off by default)
    fuse_eval: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        graph: Graph,
        deterministic: bool = True,
    ) -> jax.Array:
        H, C = self.heads, self.features
        lin_q = _lecun_linear(H * C, name="lin_query", dtype=self.dtype)
        lin_k = _lecun_linear(H * C, name="lin_key", dtype=self.dtype)
        lin_v = _lecun_linear(H * C, name="lin_value", dtype=self.dtype)
        q = lin_q(x).reshape(-1, H, C)
        k = lin_k(x).reshape(-1, H, C)
        v = lin_v(x).reshape(-1, H, C)
        scale = 1.0 / jnp.sqrt(jnp.asarray(C, x.dtype))

        edge_kv = None
        lin_edge = None
        if self.edge_dim is not None:
            lin_edge = _lecun_linear(H * C, use_bias=False, name="lin_edge",
                                     dtype=self.dtype)

        drop_active = self.dropout > 0 and not deterministic
        band_ok = (
            self.backend == "pallas"
            and graph.band is not None
            and graph.band.bias_noself is not None
            # edge conditioning needs the banded edge tensor (generic) or
            # the factorized geometric planes
            and (self.edge_dim is None or graph.band.edge is not None
                 or graph.band.geo is not None)
        )
        if lin_edge is not None and not band_ok:
            edge_kv = lin_edge(graph.edge_feat).reshape(-1, H, C)

        rate, seed = 0.0, None
        if band_ok and drop_active:
            rate = self.dropout
            seed = _dropout_seed(self.make_rng("dropout"))

        out2d = None  # set when the head-mean epilogue is fused in-kernel
        if band_ok and self.edge_dim is not None:
            from ..kernels.banded import (
                banded_transformer_edge,
                banded_transformer_edge_mean,
                banded_transformer_geo,
                banded_transformer_geo_mean,
            )

            d_e = self.edge_dim
            # recover W_e [D_e, H*C] from the shared Dense (lin_edge(I) = W_e)
            # so parameter naming stays identical across backends
            w_e = lin_edge(jnp.eye(d_e, dtype=x.dtype)).reshape(d_e, H, C)
            # qw[n, h·D+d] = Σ_c q[n,h,c]·w_e[d,h,c] as ONE MXU matmul
            # against a block-diagonal [H·C, H·D_e] matrix — the einsum form
            # lowers to strided batched contractions (same trick as the GAT
            # α matmul, models/convs.py GATConv)
            eye_h = jnp.eye(H, dtype=jnp.float32)
            w_blk = (
                eye_h[:, None, :, None]
                * jnp.transpose(w_e, (1, 2, 0))[:, :, None, :]
            ).reshape(H * C, H * d_e)
            qw = jnp.dot(q.reshape(-1, H * C), w_blk.astype(q.dtype),
                         preferred_element_type=jnp.float32).astype(q.dtype)
            if graph.band.geo is not None:
                # NOTE: the fused-projection eval path
                # (banded_transformer_geo_mean_fused, parity-tested) measured
                # SLOWER than unfused even after the round-3 pipelining (one
                # fat [span·sub, F]@[F, HC] matmul per q/k/v matrix, windows
                # as slices): 1.62 vs 1.46 ms fwd, same-session A/B
                # (artifacts/tr_fuse_ab.json).  Three serialized projections
                # at the head of each grid step stall the window pipeline in
                # a way GAT's single W does not.  Stays opt-in via
                # ModelConfig.fuse_eval; measured negative — don't revisit
                # without a second input stream to overlap the projections.
                if self.fuse_eval and deterministic and not self.concat:
                    # fused-projection inference path (see GATConv): q/k/v
                    # project inside the kernel, never touching HBM.  The
                    # q/k/v computed above are dead code here and DCE'd by
                    # XLA (they share the same Dense params).
                    from ..kernels.banded import (
                        banded_transformer_geo_mean_fused,
                    )

                    eye_f = jnp.eye(x.shape[1], dtype=x.dtype)
                    zero_f = jnp.zeros((1, x.shape[1]), x.dtype)
                    ws, bs = [], []
                    for lin_m in (lin_q, lin_k, lin_v):
                        b_row = lin_m(zero_f)
                        ws.append(lin_m(eye_f) - b_row)
                        bs.append(b_row.reshape(-1))
                    wblk = (
                        jnp.eye(H, dtype=jnp.float32)[:, None, :, None]
                        * jnp.transpose(w_e, (1, 2, 0)).astype(
                            jnp.float32)[:, :, None, :]
                    ).reshape(H * C, H * d_e).astype(x.dtype)
                    out, s = banded_transformer_geo_mean_fused(
                        graph.band.bias_noself, graph.band.geo,
                        graph.band.pos, x,
                        ws[0], ws[1], ws[2], bs[0], bs[1], bs[2], wblk, H,
                    )
                elif not self.concat and _banded.BWD_FOLD_PROJECT:
                    # geo head-mean path with the projections inside the
                    # vjp boundary: forward identical to the unfused path,
                    # backward folds the dk/dv window partials straight
                    # into dWk/dWv/db/dx in VMEM (fold_project_bwd) — the
                    # [N, H·C] dk/dv arrays never exist in HBM.  The q/k/v
                    # computed above share the same Dense params and are
                    # DCE'd by XLA (cf. the fuse_eval branch).
                    from ..kernels.banded import (
                        banded_transformer_geo_mean_projgrad,
                    )

                    eye_f = jnp.eye(x.shape[1], dtype=x.dtype)
                    zero_f = jnp.zeros((1, x.shape[1]), x.dtype)
                    ws, bs = [], []
                    for lin_m in (lin_q, lin_k, lin_v):
                        b_row = lin_m(zero_f)
                        ws.append(lin_m(eye_f) - b_row)
                        bs.append(b_row.reshape(-1))
                    # materialize the extracted W matrices: without the
                    # barrier XLA fuses the eye-matmul extraction into the
                    # q/k/v projection consumers and recomputes W per
                    # output tile (measured 3×116 µs vs 3×35 µs)
                    ws = jax.lax.optimization_barrier(ws)
                    bs = jax.lax.optimization_barrier(bs)
                    out, s = banded_transformer_geo_mean_projgrad(
                        graph.band.bias_noself, graph.band.geo,
                        graph.band.pos, x,
                        ws[0], ws[1], ws[2], bs[0], bs[1], bs[2],
                        w_blk.astype(x.dtype), H, rate, seed,
                    )
                else:
                    # factorized geometric path: 2 banded planes + positions
                    # instead of 4 planes (see kernels.banded)
                    kernel_fn = (banded_transformer_geo if self.concat
                                 else banded_transformer_geo_mean)
                    out, s = kernel_fn(
                        graph.band.bias_noself,
                        graph.band.geo,
                        graph.band.pos,
                        q.reshape(-1, H * C),
                        k.reshape(-1, H * C),
                        v.reshape(-1, H * C),
                        qw,
                        H,
                        rate,
                        seed,
                    )
            else:
                kernel_fn = (banded_transformer_edge if self.concat
                             else banded_transformer_edge_mean)
                out, s = kernel_fn(
                    graph.band.bias_noself,
                    graph.band.edge,
                    q.reshape(-1, H * C),
                    k.reshape(-1, H * C),
                    v.reshape(-1, H * C),
                    qw,
                    H,
                    rate,
                    seed,
                )
            if self.concat:
                out = out.reshape(-1, H, C) + jnp.einsum(
                    "nhd,dhc->nhc", s.reshape(-1, H, d_e), w_e.astype(s.dtype)
                ).astype(out.dtype).reshape(-1, H, C)
            else:
                # head mean of the value edge term: Σ_h p·e_ij collapses with
                # the W_e projection into one [N, H·D_e] @ [H·D_e, C] matmul
                w_flat = jnp.transpose(w_e, (1, 0, 2)).reshape(H * d_e, C)
                edge_term = jnp.dot(
                    s, w_flat.astype(s.dtype),
                    preferred_element_type=jnp.float32) * (1.0 / H)
                out2d = out + edge_term.astype(out.dtype)
        elif band_ok:
            from ..kernels.banded import (
                banded_transformer,
                banded_transformer_mean,
            )

            kernel_fn = (banded_transformer if self.concat
                         else banded_transformer_mean)
            out = kernel_fn(
                graph.band.bias_noself,
                q.reshape(-1, H * C),
                k.reshape(-1, H * C),
                v.reshape(-1, H * C),
                H,
                rate,
                seed,
            )
            if self.concat:
                out = out.reshape(-1, H, C)
            else:
                out2d = out
        elif self.backend == "segment":
            k_e = k[graph.senders]
            v_e = v[graph.senders]
            if edge_kv is not None:
                k_e = k_e + edge_kv
                v_e = v_e + edge_kv
            logits = jnp.sum(q[graph.receivers] * k_e, axis=-1) * scale  # [E, H]
            attn = sops.edge_softmax(
                logits, graph.receivers, graph.n_pad, graph.edge_mask
            )
            if self.dropout > 0 and not deterministic:
                rng = self.make_rng("dropout")
                keep = jax.random.bernoulli(rng, 1 - self.dropout, attn.shape)
                attn = attn * keep / (1 - self.dropout)
            out = sops.segment_sum_to_nodes(
                v_e * attn[:, :, None], graph.receivers, graph.n_pad, graph.edge_mask
            )
        else:
            k_n = jnp.take(k, graph.nbr_idx, axis=0)  # [N, D, H, C]
            v_n = jnp.take(v, graph.nbr_idx, axis=0)
            if edge_kv is not None:
                e_n = jnp.take(edge_kv, graph.nbr_edge, axis=0)  # [N, D, H, C]
                k_n = k_n + e_n
                v_n = v_n + e_n
            logits = jnp.einsum("nhc,ndhc->ndh", q, k_n) * scale  # [N, D, H]
            attn = dops.masked_softmax(logits, graph.nbr_mask, axis=1)
            if self.dropout > 0 and not deterministic:
                rng = self.make_rng("dropout")
                keep = jax.random.bernoulli(rng, 1 - self.dropout, attn.shape)
                attn = attn * keep / (1 - self.dropout)
            out = jnp.einsum("ndh,ndhc->nhc", attn, v_n)

        if self.concat:
            out = out.reshape(-1, H * C)
        else:
            out = out2d if out2d is not None else out.mean(axis=1)
        if self.root_weight:
            skip = _lecun_linear(
                H * C if self.concat else C, name="lin_skip", dtype=self.dtype
            )(x)
            out = out + skip
        return out


CONV_REGISTRY: dict[str, Callable] = {
    "GCN": GCNConv,
    "GAT": GATConv,
    "GIN": GINConv,
    "Transformer": TransformerConv,
}
