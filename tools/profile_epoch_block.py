#!/usr/bin/env python
"""Wall-clock epochs/sec: host-driven loop vs device-resident epoch blocks.

Measures the loop mechanics at the flagship configuration (GAT 4x256 pallas
bf16, dropout 0.1, BFS case, 3 snapshots, batch 1): per epoch the host mode
dispatches 3 train steps + 1 eval step (what Trainer does); blocked mode
dispatches one make_epoch_block executable per K epochs and fetches the
stacked per-epoch outputs.  Host↔device round trips through the TPU tunnel
dominate the host mode (~4 RTTs/epoch vs 1/K RTTs/epoch blocked).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("backend:", jax.default_backend(), flush=True)
    from gnn_bfs_rans_tpu.graph.band import LAYER_COMPONENTS
    from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig
    from gnn_bfs_rans_tpu.train import TrainConfig, load_dataset
    from gnn_bfs_rans_tpu.train.loop import (
        init_epoch_block_carry,
        init_state,
        make_epoch_block,
        make_eval_step,
        make_train_step,
    )
    from gnn_bfs_rans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ds = load_dataset("/root/reference/OpenFOAM-data", with_band=True,
                      band_components=LAYER_COMPONENTS.get("GAT"))
    graph = ds.graph.to_device()
    targets = jnp.asarray(ds.targets)
    n = targets.shape[0]
    mcfg = ModelConfig(hidden_dim=256, num_layers=4, layer_type="GAT",
                       backend="pallas", compute_dtype="bfloat16", dropout=0.1)
    tcfg = TrainConfig()
    model = FlowGNN(mcfg)
    impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"

    EPOCHS = 30
    results = {}

    # ---- host mode: per-step dispatch, as Trainer's per-epoch loop does
    state = init_state(model, graph, tcfg, jax.random.PRNGKey(0))
    train_step = make_train_step(model, tcfg)
    eval_step = make_eval_step(model, tcfg)
    rng = jax.random.key(0, impl=impl)
    nprng = np.random.default_rng(0)
    lr = jnp.asarray(3e-4, jnp.float32)

    def host_epoch(state, rng):
        losses = []
        for i in nprng.permutation(n):
            rng, sk = jax.random.split(rng)
            state, loss = train_step(state, graph, targets[i:i+1], lr, sk)
            losses.append(float(loss))
        val, errs, _ = eval_step(state, graph, targets)
        float(val)
        return state, rng

    state, rng = host_epoch(state, rng)  # warm (compile)
    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        state, rng = host_epoch(state, rng)
    results["host"] = (time.perf_counter() - t0) / EPOCHS
    print(f"host per-epoch loop : {results['host']*1e3:7.1f} ms/epoch",
          flush=True)

    # ---- blocked mode
    for block in (10, 30):
        state = init_state(model, graph, tcfg, jax.random.PRNGKey(0))
        block_fn = make_epoch_block(model, tcfg, n)
        carry = init_epoch_block_carry(state, 3e-4, jax.random.key(1, impl=impl))
        carry, outs = block_fn(carry, graph, targets,
                               jnp.asarray(0, jnp.int32), n_epochs=block)
        np.asarray(outs["train_loss"])  # warm (compile) + fetch
        reps = max(EPOCHS // block, 1)
        t0 = time.perf_counter()
        e0 = block
        for r in range(reps):
            carry, outs = block_fn(carry, graph, targets,
                                   jnp.asarray(e0, jnp.int32), n_epochs=block)
            np.asarray(outs["train_loss"])
            np.asarray(outs["val_loss"])
            e0 += block
        per = (time.perf_counter() - t0) / (reps * block)
        results[f"block{block}"] = per
        print(f"epoch_block={block:3d}    : {per*1e3:7.1f} ms/epoch "
              f"({results['host']/per:4.1f}x host)", flush=True)


if __name__ == "__main__":
    main()
