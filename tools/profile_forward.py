#!/usr/bin/env python
"""Per-piece device-time ablation of the flagship GAT forward on the BFS mesh.

Decomposes the 4-layer pallas-backend forward into its cost centers, each
timed with the chained-marginal methodology (utils/bench.py):

  full        — FlowGNN forward (pallas, bf16), the bench.py configuration
  no_layers   — num_layers=0: input projection + output MLP only
  kernel      — one banded_gat attention kernel at real shapes (HC=1024)
  proj        — one per-layer linear projection x[N,256] @ W[256,1024]
  epilogue    — one residual + eval-mode BN affine + relu at [N, 256]

`4*(kernel+proj+epilogue) + no_layers` should roughly reconstruct `full`;
the gap is XLA glue (alpha reductions, head-mean, dtype casts).

Usage: python tools/profile_forward.py [--case /root/reference/OpenFOAM-data]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain_array(fn, x0, reps=64, base=4, trials=6):
    """Marginal seconds per fn() call, chained on an array carry."""

    @jax.jit
    def f(x, k):
        def body(_, xx):
            out = fn(xx)
            return xx + jax.tree.leaves(out)[0].ravel()[0].astype(xx.dtype) * 1e-30
        return jax.lax.fori_loop(0, k, body, x0)

    def best(k):
        kk = jnp.asarray(k, jnp.int32)
        np.asarray(jax.device_get(f(x0, kk).ravel()[0]))
        b = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(f(x0, kk).ravel()[0]))
            b = min(b, time.perf_counter() - t0)
        return b

    return max((best(reps) - best(base)) / (reps - base), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="/root/reference/OpenFOAM-data")
    args = ap.parse_args()

    from gnn_bfs_rans_tpu.foam import FoamCase
    from gnn_bfs_rans_tpu.graph import build_graph
    from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig
    from gnn_bfs_rans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)

    mesh = FoamCase(args.case).load_mesh()
    g = build_graph(mesh, with_band=True)
    n = g.n_pad
    H, C = 4, 256
    HC = H * C
    print(f"n_pad={n} tiles={n // 128} HC={HC}", flush=True)

    cfg = ModelConfig(num_layers=4, layer_type="GAT", backend="pallas",
                      compute_dtype="bfloat16", dropout=0.0)
    rng = np.random.default_rng(0)

    # full model and the 0-layer model (shared input/output stages)
    results = {}
    for name, c in (("full", cfg),
                    ("no_layers", dataclasses.replace(cfg, num_layers=0))):
        m = FlowGNN(c)
        p = m.init(jax.random.PRNGKey(0), g)
        t = chain_array(
            lambda feat, m=m, p=p: m.apply(
                p, dataclasses.replace(g, node_feat=feat), train=False),
            g.node_feat)
        results[name] = t
        print(f"{name:10s}: {t * 1e6:8.1f} us", flush=True)

    # attention kernel alone at real shapes
    from gnn_bfs_rans_tpu.kernels.banded import banded_gat
    mask = g.band.bias_self
    z0 = jnp.asarray(rng.normal(size=(n, HC)), jnp.bfloat16)
    a0 = jnp.asarray(rng.normal(size=(n, H)), jnp.bfloat16)
    t = chain_array(lambda zz: banded_gat(mask, zz, a0, a0, H, 0.2), z0)
    results["kernel"] = t
    print(f"{'kernel':10s}: {t * 1e6:8.1f} us", flush=True)

    # per-layer linear projection + alpha reductions
    w = jnp.asarray(rng.normal(size=(C, HC)) * 0.01, jnp.bfloat16)
    att = jnp.asarray(rng.normal(size=(2, H, C)) * 0.01, jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=(n, C)), jnp.bfloat16)

    def proj(xx):
        zz = (xx @ w).reshape(n, H, C)
        a_s = jnp.sum(zz * att[0], axis=-1)
        a_d = jnp.sum(zz * att[1], axis=-1)
        return zz.reshape(n, HC) + a_s.sum() * 0 + a_d.sum() * 0

    results["proj"] = chain_array(proj, x0)
    print(f"{'proj':10s}: {results['proj'] * 1e6:8.1f} us", flush=True)

    # head-mean + residual + BN(eval affine) + relu epilogue
    scale = jnp.ones((C,), jnp.float32)
    shift = jnp.zeros((C,), jnp.float32)

    def epilogue(xx):
        o = z0.reshape(n, H, C).mean(axis=1).astype(jnp.bfloat16)
        y = xx + o
        y = (y.astype(jnp.float32) * scale + shift).astype(jnp.bfloat16)
        return jax.nn.relu(y)

    results["epilogue"] = chain_array(epilogue, x0)
    print(f"{'epilogue':10s}: {results['epilogue'] * 1e6:8.1f} us", flush=True)

    recon = 4 * (results["kernel"] + results["proj"] + results["epilogue"]) \
        + results["no_layers"]
    print(f"\nreconstruction 4*(kernel+proj+epilogue)+no_layers = "
          f"{recon * 1e6:.1f} us vs full = {results['full'] * 1e6:.1f} us")


if __name__ == "__main__":
    main()
