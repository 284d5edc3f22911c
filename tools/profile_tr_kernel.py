#!/usr/bin/env python
"""Decompose the edge-conditioned Graph-Transformer kernel cost (fwd, f+b)
at the flagship shape — plain vs geo-factorized vs generic-edge variants.
Chained-marginal device timing."""
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
    from gnn_bfs_rans_tpu.kernels.banded import (
        banded_transformer_geo_mean,
        banded_transformer_mean,
    )
    from gnn_bfs_rans_tpu.train import load_dataset
    from gnn_bfs_rans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ds = load_dataset("/root/reference/OpenFOAM-data", with_band=True,
                      band_components=LAYER_COMPONENTS.get("Transformer"))
    g = ds.graph.to_device()
    H, C = 4, 256
    n = g.n_pad
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (n, H * C), jnp.bfloat16) * 0.1
    qw = jax.random.normal(jax.random.fold_in(key, 3), (n, H * 4),
                           jnp.bfloat16) * 0.1

    def plain_fwd(i, x):
        out = banded_transformer_mean(g.band.bias_noself, x, x, x, H, 0.0,
                                      None)
        return x + jnp.tile(out, (1, H)).astype(x.dtype) * 1e-30

    def geo_fwd(i, x):
        out, s = banded_transformer_geo_mean(
            g.band.bias_noself, g.band.geo, g.band.pos, x, x, x, qw, H,
            0.0, None)
        return x + jnp.tile(out, (1, H)).astype(x.dtype) * 1e-30

    def make_bwd(kind):
        if kind == "plain":
            def loss(x):
                return jnp.sum(banded_transformer_mean(
                    g.band.bias_noself, x, x, x, H, 0.0, None
                ).astype(jnp.float32) ** 2)
        else:
            def loss(x):
                out, s = banded_transformer_geo_mean(
                    g.band.bias_noself, g.band.geo, g.band.pos, x, x, x,
                    qw, H, 0.0, None)
                return (jnp.sum(out.astype(jnp.float32) ** 2)
                        + jnp.sum(s.astype(jnp.float32) ** 2))

        def f(i, x):
            return x + jax.grad(loss)(x) * 1e-30
        return f

    for name, fn in [
        ("plain fwd", plain_fwd),
        ("geo   fwd", geo_fwd),
        ("plain f+b", make_bwd("plain")),
        ("geo   f+b", make_bwd("geo")),
    ]:
        t = chain(fn, q)
        print(f"{name}: {t*1e6:8.1f} us/layer  (x4 = {4*t*1e3:5.2f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
