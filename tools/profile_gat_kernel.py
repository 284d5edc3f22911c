#!/usr/bin/env python
"""Locate the GAT forward kernel's bottleneck: VPU softmax plane vs MXU/HBM.

The head-stacked softmax plane is [H·T, W·T] — independent of C; the value
matmuls and the z stream scale with C.  Sweeping C at fixed H (and H at
fixed H·C) separates the two:

  time ~flat in C      → VPU-bound on the softmax plane
  time ~linear in C    → MXU / feature-stream bound
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain(fn, x0, reps=64, base=4, trials=5):
    @jax.jit
    def run(x, k):
        return jax.lax.fori_loop(0, k, fn, x)

    def best(k):
        kk = jnp.asarray(k, jnp.int32)
        out = run(x0, kk)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
        b = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            out = run(x0, kk)
            np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
            b = min(b, time.perf_counter() - t0)
        return b

    return max((best(reps) - best(base)) / (reps - base), 1e-9)


def main():
    print("backend:", jax.default_backend(), flush=True)
    from gnn_bfs_rans_tpu.graph.band import LAYER_COMPONENTS
    from gnn_bfs_rans_tpu.kernels.banded import banded_gat_mean
    from gnn_bfs_rans_tpu.train import load_dataset

    ds = load_dataset("/root/reference/OpenFOAM-data", with_band=True,
                      band_components=LAYER_COMPONENTS.get("GAT"))
    g = ds.graph.to_device()
    n = g.n_pad
    bias = g.band.bias_self
    key = jax.random.PRNGKey(0)

    def bench(H, C):
        z = jax.random.normal(key, (n, H * C), jnp.bfloat16) * 0.1
        a_s = jax.random.normal(key, (n, H), jnp.float32)
        a_d = jax.random.normal(key, (n, H), jnp.float32)

        def f(i, z):
            out = banded_gat_mean(bias, z, a_s, a_d, H, 0.2, 0.0, None)
            return z + jnp.tile(out, (1, H)).astype(z.dtype) * 1e-30

        t = chain(f, z)
        print(f"H={H} C={C:4d} (HC={H*C:5d}): {t*1e6:7.1f} us", flush=True)
        return t

    # sweep C at fixed H=4: softmax plane constant, value work scales
    for C in (32, 64, 128, 256, 512):
        bench(4, C)
    # sweep H at fixed HC=1024: plane scales with H, value work constant
    for H in (1, 2, 8):
        bench(H, 1024 // H)


if __name__ == "__main__":
    main()
