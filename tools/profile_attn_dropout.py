#!/usr/bin/env python
"""Isolate the in-kernel attention-dropout cost: banded GAT fwd/bwd at the
flagship shape with rate=0 vs rate=0.1 (chained-marginal device timing)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain(fn, x0, reps=32, base=2, trials=5):
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
    H, C = 4, 256
    n = g.n_pad
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (n, H * C), jnp.bfloat16) * 0.1
    a_s = jax.random.normal(jax.random.fold_in(key, 1), (n, H), jnp.float32)
    a_d = jax.random.normal(jax.random.fold_in(key, 2), (n, H), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)
    bias = g.band.bias_self

    # simpler: carry z [n, H*C]; out = tile(kernel_out, H)*eps + z keeps shape
    def make_fwd(rate, sd):
        def f(i, z):
            out = banded_gat_mean(bias, z, a_s, a_d, H, 0.2, rate, sd)
            return z + jnp.tile(out, (1, H)).astype(z.dtype) * 1e-30
        return f

    def make_bwd(rate, sd):
        def loss(z):
            return banded_gat_mean(bias, z, a_s, a_d, H, 0.2, rate, sd).astype(
                jnp.float32).sum()

        def f(i, z):
            dz = jax.grad(loss)(z)
            return z + dz * 1e-30
        return f

    for name, fn in [
        ("fwd rate=0  ", make_fwd(0.0, None)),
        ("fwd rate=0.1", make_fwd(0.1, seed)),
        ("f+b rate=0  ", make_bwd(0.0, None)),
        ("f+b rate=0.1", make_bwd(0.1, seed)),
    ]:
        t = chain(fn, z)
        print(f"{name}: {t*1e6:8.1f} us  (x4 layers = {4*t*1e3:.2f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
