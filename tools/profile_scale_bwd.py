#!/usr/bin/env python
"""Decompose the 1M-cell GAT BACKWARD (round-3: the bwd is the lever).

The regenerated decomposition (artifacts/scale_train_decomp_r3.json) shows
fwd_eval 62 ms / fwd_train 82 ms but grad 351 ms even with dropout OFF —
the backward is ~3.3× the forward, while at the BFS shape the fused bwd
kernel measured roughly 1:1 with the forward.  This tool ablates the 1M
backward into:

  conv_fwd        — one fused GATConv forward (deterministic)
  conv_grad       — grad of one conv wrt (params, x), fuse_train, dropout 0
  conv_grad_store — same but fuse_train=False (z stored, no re-projection)
  kernel_fwd      — raw banded_gat_mean_fused forward
  kernel_grad     — grad of the raw kernel (isolates bwd kernel + partial
                    fold from the projection matmuls)
  glue_grad       — FlowGNN(num_layers=0) grad: input proj + MLP head
  bnblock_grad    — grad through residual+MaskedBatchNorm+ReLU at [N, 128]

All chained-marginal (utils.bench methodology: carry-perturbed inputs, all
gradient leaves consumed, host-fetch fence).  Writes
artifacts/scale_bwd_decomp.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def chain_time(body, state0, *operands, reps=8, base=2, trials=3):
    @jax.jit
    def chain(s0, k, *ops):
        return jax.lax.fori_loop(0, k, lambda i, c: body(i, c, *ops), s0)

    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))

    def best(k):
        kk = jnp.asarray(k, jnp.int32)
        fence(chain(state0, kk, *operands))
        b = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            fence(chain(state0, kk, *operands))
            b = min(b, time.perf_counter() - t0)
        return b

    return max((best(reps) - best(base)) / (reps - base), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--out", default="artifacts/scale_bwd_decomp.json")
    ap.add_argument("--part", default="all",
                    choices=["all", "conv", "convgrad", "rest", "model"],
                    help="Run a subset (the full sweep outlives a 10-min "
                         "timeout window on the tunneled chip); results "
                         "merge into --out across invocations")
    args = ap.parse_args()

    from gnn_bfs_rans_tpu.graph.band import LAYER_COMPONENTS
    from gnn_bfs_rans_tpu.models.convs import GATConv
    from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig
    from gnn_bfs_rans_tpu.models.norm import MaskedBatchNorm
    from gnn_bfs_rans_tpu.utils.cache import enable_compilation_cache
    from gnn_bfs_rans_tpu.utils.synthetic import build_grid_graph

    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)

    ny = max(args.nodes // args.nx, 1)
    graph = build_grid_graph(
        args.nx, ny, with_band=True,
        band_components=LAYER_COMPONENTS.get("GAT"),
    ).to_device()
    print(f"nodes={graph.n_nodes} edges={graph.n_edges} n_pad={graph.n_pad}",
          flush=True)

    F = args.hidden
    heads = 4
    rng = np.random.default_rng(0)
    x0 = jax.device_put(
        jnp.asarray(rng.normal(size=(graph.n_pad, F)) * 0.1, jnp.bfloat16))
    results: dict[str, float | None] = {}

    def consume(grads, carry):
        return carry + optax.global_norm(
            [g.astype(jnp.float32) for g in jax.tree_util.tree_leaves(grads)]
        ) * 1e-30

    # ---- conv-level -------------------------------------------------------
    conv_variants = ()
    if args.part in ("all", "conv"):
        conv_variants = (("conv", True), ("conv_store", False))
    elif args.part == "convgrad":
        conv_variants = (("conv", True),)
    for name, fuse in conv_variants:
        conv = GATConv(features=F, heads=heads, concat=False, dropout=0.0,
                       backend="pallas", dtype=jnp.bfloat16, fuse_train=fuse)
        params = conv.init(jax.random.PRNGKey(0), x0, graph)

        def fwd_body(i, carry, p, x, g, _conv=conv):
            x = x + carry.astype(x.dtype) * 1e-30
            out = _conv.apply(p, x, g, True)
            return carry + jnp.sum(out).astype(carry.dtype) * 1e-30

        if fuse and args.part != "convgrad":
            t = chain_time(fwd_body, jnp.zeros(()), params, x0, graph)
            results["conv_fwd"] = t
            print(f"conv_fwd        {t*1e3:8.2f} ms", flush=True)

        def loss_fn(p, x, g, _conv=conv):
            return jnp.sum(_conv.apply(p, x, g, True).astype(jnp.float32))

        def grad_body(i, carry, p, x, g, _loss=loss_fn):
            x = x + carry.astype(x.dtype) * 1e-30
            grads = jax.grad(_loss, argnums=(0, 1))(p, x, g)
            return consume(grads, carry)

        t = chain_time(grad_body, jnp.zeros(()), params, x0, graph)
        results[f"{name}_grad"] = t
        print(f"{name + '_grad':16s}{t*1e3:8.2f} ms", flush=True)

    if args.part in ("conv", "convgrad"):
        _write(args.out, graph, F, heads, results)
        return

    if args.part == "model":
        # Full-model grad at L ∈ {1, 2, 4}: the slope is the per-layer cost
        # *inside the real model* (activation pressure, scheduling) vs the
        # isolated conv_grad number; the intercept is the fixed glue.
        from gnn_bfs_rans_tpu.train.loop import TrainConfig, init_state
        from gnn_bfs_rans_tpu.train.normalization import weighted_fieldwise_mse

        tcfg = TrainConfig()
        targets = jax.device_put(jnp.zeros((1, graph.n_pad, 7), jnp.float32))
        for L in (1, 2, 4):
            mcfg = ModelConfig(
                hidden_dim=F, num_layers=L, layer_type="GAT",
                backend="pallas", dropout=0.0, compute_dtype="bfloat16",
                remat=True,
            )
            model = FlowGNN(mcfg)
            state = init_state(model, graph, tcfg, jax.random.PRNGKey(0))

            def loss_fn(params, bs, g, tgt, _model=model):
                out, mutated = _model.apply(
                    {"params": params, "batch_stats": bs}, g,
                    train=True, mutable=["batch_stats"],
                )
                loss = jnp.mean(jax.vmap(
                    lambda tt: weighted_fieldwise_mse(
                        out, tt, g.node_mask,
                        pressure_ref_weight=tcfg.pressure_ref_weight)
                )(tgt))
                return loss, mutated["batch_stats"]

            def mgrad_body(i, carry, s, g, tgt, _loss_fn=loss_fn):
                params = dict(s.params)
                ip = dict(params["input_proj"])
                ip["kernel"] = ip["kernel"] + carry.astype(
                    ip["kernel"].dtype) * 1e-30
                params["input_proj"] = ip
                (loss, _), grads = jax.value_and_grad(
                    _loss_fn, has_aux=True)(params, s.batch_stats, g, tgt)
                return consume(grads, carry) + loss * 0

            t = chain_time(mgrad_body, jnp.zeros(()), state, graph, targets)
            results[f"model_grad_L{L}"] = t
            print(f"model_grad_L{L}   {t*1e3:8.2f} ms", flush=True)
        _write(args.out, graph, F, heads, results)
        return

    # ---- raw kernel -------------------------------------------------------
    from gnn_bfs_rans_tpu.kernels.banded import banded_gat_mean_fused

    w0 = jax.device_put(
        jnp.asarray(rng.normal(size=(F, heads * F)) * 0.05, jnp.bfloat16))
    # packed alphas [N, 2H] (round-4 interface)
    a0 = jax.device_put(
        jnp.asarray(rng.normal(size=(graph.n_pad, 2 * heads)) * 0.1,
                    jnp.float32))
    bias_self = graph.band.bias_self

    def kfwd_body(i, carry, w, x, al, bs):
        x = x + carry.astype(x.dtype) * 1e-30
        out = banded_gat_mean_fused(bs, w, al, x, heads, 0.2, 0.0, None)
        return carry + jnp.sum(out).astype(carry.dtype) * 1e-30

    t = chain_time(kfwd_body, jnp.zeros(()), w0, x0, a0, bias_self)
    results["kernel_fwd"] = t
    print(f"kernel_fwd      {t*1e3:8.2f} ms", flush=True)

    def kloss(w, x, al, bs):
        out = banded_gat_mean_fused(bs, w, al, x, heads, 0.2, 0.0, None)
        return jnp.sum(out.astype(jnp.float32))

    def kgrad_body(i, carry, w, x, al, bs):
        x = x + carry.astype(x.dtype) * 1e-30
        grads = jax.grad(kloss, argnums=(0, 1, 2))(w, x, al, bs)
        return consume(grads, carry)

    t = chain_time(kgrad_body, jnp.zeros(()), w0, x0, a0, bias_self)
    results["kernel_grad"] = t
    print(f"kernel_grad     {t*1e3:8.2f} ms", flush=True)

    # ---- glue: 0-conv model ----------------------------------------------
    mcfg = ModelConfig(hidden_dim=F, num_layers=0, layer_type="GAT",
                       backend="pallas", dropout=0.0,
                       compute_dtype="bfloat16")
    model = FlowGNN(mcfg)
    variables = model.init(jax.random.PRNGKey(0), graph, train=False)

    def gloss(p, g):
        return jnp.sum(model.apply({"params": p}, g, train=False))

    import dataclasses as _dc

    def glue_body(i, carry, p, g):
        g = _dc.replace(
            g, node_feat=g.node_feat + carry.astype(g.node_feat.dtype) * 1e-30)
        grads = jax.grad(gloss)(p, g)
        return consume(grads, carry)

    t = chain_time(glue_body, jnp.zeros(()), variables["params"], graph)
    results["glue_grad"] = t
    print(f"glue_grad       {t*1e3:8.2f} ms", flush=True)

    # ---- residual + BN + ReLU block --------------------------------------
    bn = MaskedBatchNorm(F)
    bn_vars = bn.init(jax.random.PRNGKey(0), x0, graph.node_mask,
                      use_running_average=False)

    def bnloss(p, x, mask):
        out, _ = bn.apply(
            {"params": p, "batch_stats": bn_vars["batch_stats"]},
            x + x, mask, use_running_average=False, mutable=["batch_stats"],
        )
        return jnp.sum(jax.nn.relu(out).astype(jnp.float32))

    def bn_body(i, carry, p, x, mask):
        x = x + carry.astype(x.dtype) * 1e-30
        grads = jax.grad(bnloss, argnums=(0, 1))(p, x, mask)
        return consume(grads, carry)

    t = chain_time(bn_body, jnp.zeros(()), bn_vars["params"], x0,
                   graph.node_mask)
    results["bnblock_grad"] = t
    print(f"bnblock_grad    {t*1e3:8.2f} ms", flush=True)

    _write(args.out, graph, F, heads, results)


def _write(path, graph, F, heads, results):
    merged = {}
    if os.path.exists(path):
        try:
            merged = json.load(open(path)).get("timings_s", {})
        except (ValueError, OSError):
            pass
    merged.update(results)
    out = {
        "n_nodes": graph.n_nodes, "n_edges": graph.n_edges,
        "hidden_dim": F, "heads": heads, "layer_type": "GAT",
        "backend": "pallas", "compute_dtype": "bfloat16",
        "platform": jax.devices()[0].platform,
        "timings_s": merged,
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
