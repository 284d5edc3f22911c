#!/usr/bin/env python
"""Decompose the flagship train step's device time (chained-marginal).

Variants at the bench configuration (GAT 4x256, pallas, bf16, dropout 0.1):

  full        — the real train step (fwd + loss + bwd + clip + Adam)
  grad_only   — value_and_grad, optimizer skipped
  loss_fwd    — train-mode forward + loss, no backward
  grad_nodrop — value_and_grad with dropout 0.0
  grad_nobn   — value_and_grad with norm_type='none'
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain_state(step_fn, s0, *args, reps=32, base=2, trials=5):
    @jax.jit
    def chain(s, k):
        def body(i, ss):
            return step_fn(i, ss, *args)
        return jax.lax.fori_loop(0, k, body, s)

    def best(k):
        kk = jnp.asarray(k, jnp.int32)
        out = chain(s0, kk)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
        b = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            out = chain(s0, kk)
            np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
            b = min(b, time.perf_counter() - t0)
        return b

    return max((best(reps) - best(base)) / (reps - base), 1e-9)


def main():
    from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig
    from gnn_bfs_rans_tpu.train import TrainConfig, load_dataset
    from gnn_bfs_rans_tpu.train.loop import (
        init_state, make_optimizer, make_train_step,
    )
    from gnn_bfs_rans_tpu.train.normalization import weighted_fieldwise_mse
    from gnn_bfs_rans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)

    from gnn_bfs_rans_tpu.graph.band import LAYER_COMPONENTS

    dataset = load_dataset("/root/reference/OpenFOAM-data", with_band=True,
                           band_components=LAYER_COMPONENTS.get("GAT"))
    graph = dataset.graph.to_device()
    targets = jnp.asarray(dataset.targets)
    tcfg = TrainConfig()
    # match the trainer's PRNG impl (rbg on TPU): a threefry key here makes
    # every dropout-mask bernoulli pay the long u32 ALU chains the trainer
    # does NOT pay — with threefry this profile over-attributes ~1.8 ms/step
    # to "dropout" (measured 2026-08-19; rbg: ~0.3 ms, all in-kernel PRNG)
    impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
    rng0 = jax.random.key(1, impl=impl)
    lr = jnp.asarray(3e-4, jnp.float32)

    def build(dropout=0.1, norm="batch"):
        mcfg = ModelConfig(hidden_dim=256, num_layers=4, layer_type="GAT",
                           backend="pallas", compute_dtype="bfloat16",
                           dropout=dropout, norm_type=norm)
        model = FlowGNN(mcfg)
        state = init_state(model, graph, tcfg, jax.random.PRNGKey(0))
        return model, state

    model, state = build()
    raw_step = make_train_step(model, tcfg, jit=False)

    def full(i, s):
        s2, _ = raw_step(s, graph, targets, lr, jax.random.fold_in(rng0, i))
        return s2

    def make_loss_fn(model, state):
        def loss_fn(params, rng):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                graph, train=True, rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            loss = jnp.mean(jax.vmap(
                lambda t: weighted_fieldwise_mse(
                    out, t, graph.node_mask,
                    pressure_ref_weight=tcfg.pressure_ref_weight)
            )(targets))
            return loss, mutated["batch_stats"]
        return loss_fn

    loss_fn = make_loss_fn(model, state)

    def grad_only(i, p):
        rng = jax.random.fold_in(rng0, i)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, rng)
        # fold grads back into the carry so nothing is dead code
        return jax.tree.map(lambda a, g: a + 1e-30 * loss * g, p, grads)

    def loss_fwd(i, p):
        rng = jax.random.fold_in(rng0, i)
        loss, _ = loss_fn(p, rng)
        return jax.tree.map(lambda a: a + 1e-30 * loss, p)

    results = {}
    results["full"] = chain_state(full, state)
    print(f"full       : {results['full']*1e3:7.2f} ms", flush=True)
    results["grad_only"] = chain_state(grad_only, state.params)
    print(f"grad_only  : {results['grad_only']*1e3:7.2f} ms", flush=True)
    results["loss_fwd"] = chain_state(loss_fwd, state.params)
    print(f"loss_fwd   : {results['loss_fwd']*1e3:7.2f} ms", flush=True)

    model_nd, state_nd = build(dropout=0.0)
    lf = make_loss_fn(model_nd, state_nd)

    def grad_nodrop(i, p):
        rng = jax.random.fold_in(rng0, i)
        (loss, _), grads = jax.value_and_grad(lf, has_aux=True)(p, rng)
        return jax.tree.map(lambda a, g: a + 1e-30 * loss * g, p, grads)

    results["grad_nodrop"] = chain_state(grad_nodrop, state_nd.params)
    print(f"grad_nodrop: {results['grad_nodrop']*1e3:7.2f} ms", flush=True)

    model_nb, state_nb = build(norm="none")
    lfb = make_loss_fn(model_nb, state_nb)

    def grad_nobn(i, p):
        rng = jax.random.fold_in(rng0, i)
        (loss, _), grads = jax.value_and_grad(lfb, has_aux=True)(p, rng)
        return jax.tree.map(lambda a, g: a + 1e-30 * loss * g, p, grads)

    results["grad_nobn"] = chain_state(grad_nobn, state_nb.params)
    print(f"grad_nobn  : {results['grad_nobn']*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
