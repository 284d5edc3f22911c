#!/usr/bin/env python
"""Decompose the 1M-cell GAT train step (ROADMAP round-3 item 3).

The scale train step (fwd + loss + bwd + Adam, conv remat) measured 385 ms
at 1M cells / H=128 / bf16 (artifacts/scale_1m_train.json) while the eval
forward alone extrapolates to ~65 ms — this tool ablates where the other
~320 ms go:

  fwd_eval        — model.apply train=False (no dropout, BN running stats)
  fwd_train       — model.apply train=True, mutable batch_stats (adds the
                    dropout masks + BN moment reductions, no backward)
  grad            — value_and_grad of the train-mode loss (no optimizer)
  step            — the full train step (grad + clip + Adam + param update)
  variants        — remat on/off, dropout 0.1/0.0

All timings chained-marginal (utils.bench methodology).  Writes
artifacts/scale_train_decomp.json.

Usage: python tools/profile_scale_train.py [--nodes 1000000] [--nx 64]
"""
from __future__ import annotations

import argparse
import dataclasses
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
    """Marginal seconds/iteration of ``body(i, carry, *operands)`` chained.

    ``operands`` are real jit arguments (NOT closure constants — a closed-over
    1.5 GB band tensor becomes an HLO literal, which the tunneled
    remote-compile endpoint rejects at 413).
    """

    @jax.jit
    def chain(s0, k, *ops):
        return jax.lax.fori_loop(0, k, lambda i, c: body(i, c, *ops), s0)

    def fence(out):
        # device_get of one scalar: on this tunneled runtime
        # jax.block_until_ready can return before compute finishes (it
        # measured the 65 ms 1M-cell forward at 3.8 µs in round 2) — only a
        # host FETCH actually fences (utils.bench methodology).
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
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--out", default="artifacts/scale_train_decomp.json")
    args = ap.parse_args()

    from gnn_bfs_rans_tpu.graph.band import LAYER_COMPONENTS
    from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig
    from gnn_bfs_rans_tpu.train.loop import TrainConfig, init_state, make_train_step
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

    tcfg = TrainConfig()
    targets = jax.device_put(jnp.zeros((1, graph.n_pad, 7), jnp.float32))
    lr = jnp.asarray(3e-4, jnp.float32)
    rng = jax.random.key(1, impl="rbg")
    results: dict[str, float] = {}

    def model_for(remat: bool, dropout: float) -> tuple[FlowGNN, object]:
        mcfg = ModelConfig(
            hidden_dim=args.hidden, num_layers=args.layers, layer_type="GAT",
            backend="pallas", dropout=dropout, compute_dtype="bfloat16",
            remat=remat,
        )
        model = FlowGNN(mcfg)
        state = init_state(model, graph, tcfg, jax.random.PRNGKey(0))
        return model, state

    # ---- forwards (remat irrelevant for eval; dropout 0.1 config) --------
    model, state = model_for(remat=True, dropout=0.1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def fwd_eval_body(i, carry, vs, g):
        # feed the carry back into the input so the loop body is NOT
        # loop-invariant (XLA hoists an invariant body out of fori_loop,
        # which measures ~0 regardless of the real cost)
        g = dataclasses.replace(
            g, node_feat=g.node_feat + carry.astype(g.node_feat.dtype) * 1e-30)
        out = model.apply(vs, g, train=False)
        # consume the FULL output — slicing a single element lets XLA prune
        # the forward via slice pushdown / DCE
        return carry + jnp.sum(out).astype(carry.dtype) * 1e-30

    t = chain_time(fwd_eval_body, jnp.zeros(()), variables, graph)
    results["fwd_eval"] = t
    print(f"fwd_eval      {t*1e3:8.2f} ms", flush=True)

    def fwd_train_body(i, carry, vs, g):
        out, mutated = model.apply(
            vs, g, train=True,
            rngs={"dropout": jax.random.fold_in(rng, i)},
            mutable=["batch_stats"],
        )
        # consume the full output AND the mutated BN moments, else XLA can
        # dead-code-eliminate both the forward and the moment reductions
        bs_sum = sum(jnp.sum(leaf).astype(carry.dtype)
                     for leaf in jax.tree_util.tree_leaves(mutated["batch_stats"]))
        return carry + (jnp.sum(out).astype(carry.dtype) + bs_sum) * 1e-30

    t = chain_time(fwd_train_body, jnp.zeros(()), variables, graph)
    results["fwd_train"] = t
    print(f"fwd_train     {t*1e3:8.2f} ms", flush=True)

    # ---- grad + full step for each variant -------------------------------
    from gnn_bfs_rans_tpu.train.normalization import weighted_fieldwise_mse

    for name, remat, dropout in (
        ("remat_drop", True, 0.1),
        ("remat_nodrop", True, 0.0),
        ("noremat_drop", False, 0.1),
    ):
        model, state = model_for(remat=remat, dropout=dropout)

        def loss_fn(params, bs, key, g, tgt, _model=model):
            out, mutated = _model.apply(
                {"params": params, "batch_stats": bs}, g,
                train=True, rngs={"dropout": key}, mutable=["batch_stats"],
            )
            loss = jnp.mean(jax.vmap(
                lambda tt: weighted_fieldwise_mse(
                    out, tt, g.node_mask,
                    pressure_ref_weight=tcfg.pressure_ref_weight)
            )(tgt))
            return loss, mutated["batch_stats"]

        def grad_body(i, carry, s, g, tgt, _loss_fn=loss_fn):
            # perturb ONE parameter leaf by the carry: without this the body
            # is loop-invariant (state never updates in a grad-only chain;
            # at dropout 0 even the PRNG key is dead) and XLA can hoist or
            # share the whole grad computation across iterations
            params = dict(s.params)
            ip = dict(params["input_proj"])
            ip["kernel"] = ip["kernel"] + carry.astype(ip["kernel"].dtype) * 1e-30
            params["input_proj"] = ip
            (loss, _), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
                params, s.batch_stats, jax.random.fold_in(rng, i), g, tgt)
            # consume EVERY gradient leaf — reading a single leaf lets XLA
            # dead-code-eliminate the other parameter-gradient matmuls
            gnorm = optax.global_norm(grads)
            return carry + loss * 0 + gnorm * 1e-30

        try:
            t = chain_time(grad_body, jnp.zeros(()), state, graph, targets)
            results[f"grad_{name}"] = t
            print(f"grad_{name:13s}{t*1e3:8.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001 — OOM variants are expected
            results[f"grad_{name}"] = None
            # keep the artifact schema stable: record the skipped step too
            results[f"step_{name}"] = None
            print(f"grad_{name}: FAILED ({type(e).__name__})", flush=True)
            continue

        raw_step = make_train_step(model, tcfg, jit=False)

        def step_body(i, s, g, tgt, _raw=raw_step):
            s2, _ = _raw(s, g, tgt, lr, jax.random.fold_in(rng, i))
            return s2

        try:
            t = chain_time(step_body, state, graph, targets)
            results[f"step_{name}"] = t
            print(f"step_{name:13s}{t*1e3:8.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            results[f"step_{name}"] = None
            print(f"step_{name}: FAILED ({type(e).__name__})", flush=True)

    out = {
        "n_nodes": graph.n_nodes, "n_edges": graph.n_edges,
        "hidden_dim": args.hidden, "num_layers": args.layers,
        "layer_type": "GAT", "backend": "pallas",
        "compute_dtype": "bfloat16",
        "platform": jax.devices()[0].platform,
        "timings_s": results,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
