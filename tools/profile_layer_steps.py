#!/usr/bin/env python
"""Incremental build-up of one pallas GAT layer to localize XLA glue cost."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain_array(fn, x0, reps=64, base=4, trials=6):
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
    from gnn_bfs_rans_tpu.foam import FoamCase
    from gnn_bfs_rans_tpu.graph import build_graph
    from gnn_bfs_rans_tpu.kernels.banded import banded_gat
    from gnn_bfs_rans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)

    mesh = FoamCase("/root/reference/OpenFOAM-data").load_mesh()
    g = build_graph(mesh, with_band=True)
    n = g.n_pad
    H, C = 4, 256
    HC = H * C
    mask = g.band.bias_self
    node_mask = g.node_mask

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(C, HC)) * 0.05, jnp.bfloat16)
    att = jnp.asarray(rng.normal(size=(2, H, C)) * 0.05, jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    gamma = jnp.ones((C,), jnp.float32)
    beta = jnp.zeros((C,), jnp.float32)
    mean = jnp.zeros((C,), jnp.float32)
    var = jnp.ones((C,), jnp.float32)
    x0 = jnp.asarray(rng.normal(size=(n, C)), jnp.bfloat16)

    def proj_alpha(xx):
        z = (xx @ w).reshape(n, H, C)
        a_s = jnp.sum(z * att[0], axis=-1).astype(jnp.bfloat16)
        a_d = jnp.sum(z * att[1], axis=-1).astype(jnp.bfloat16)
        return z.reshape(n, HC), a_s, a_d

    def upto_kernel(xx):
        z, a_s, a_d = proj_alpha(xx)
        return banded_gat(mask, z, a_s, a_d, H, 0.2)

    def upto_mean(xx):
        out = upto_kernel(xx)
        return out.reshape(n, H, C).mean(axis=1) + bias

    def upto_residual(xx):
        return xx + upto_mean(xx).astype(jnp.bfloat16)

    def upto_bn(xx):
        y = upto_residual(xx).astype(jnp.float32)
        inv = jax.lax.rsqrt(var + 1e-5)
        y = (y - mean) * (gamma * inv) + beta
        y = jnp.where(node_mask[:, None], y, 0.0)
        return jax.nn.relu(y).astype(jnp.bfloat16)

    # alpha via precomputed w_alpha (fused-kernel candidate): x @ (W @ att)
    w_alpha = (w.astype(jnp.float32).reshape(C, H, C)
               * att[0][None]).sum(-1).astype(jnp.bfloat16)  # [C, H]
    w_alpha_d = (w.astype(jnp.float32).reshape(C, H, C)
                 * att[1][None]).sum(-1).astype(jnp.bfloat16)

    def alpha_direct(xx):
        z = xx @ w
        a_s = xx @ w_alpha
        a_d = xx @ w_alpha_d
        return z, a_s, a_d

    def upto_kernel_direct(xx):
        z, a_s, a_d = alpha_direct(xx)
        return banded_gat(mask, z, a_s, a_d, H, 0.2)

    for name, fn in [
        ("proj_alpha    ", lambda xx: proj_alpha(xx)[0]),
        ("alpha_direct  ", lambda xx: alpha_direct(xx)[0]),
        ("upto_kernel   ", upto_kernel),
        ("upto_kern_dir ", upto_kernel_direct),
        ("upto_mean     ", upto_mean),
        ("upto_residual ", upto_residual),
        ("upto_bn       ", upto_bn),
    ]:
        t = chain_array(fn, x0)
        print(f"{name}: {t * 1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()
