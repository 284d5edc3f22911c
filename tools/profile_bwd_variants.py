#!/usr/bin/env python
"""A/B the round-5 backward recompute-thinning variants on device.

Measures the fused GAT backward kernel (flagship shape: BFS mesh, H=4,
C=64 per head -> HC=256... actually flagship GAT 6x256: HC=1024, head mean)
under each variant combination via chained-marginal timing:

  base      : round-4 kernel (plane max/sum recompute, VPU rs, sublane das)
  stats     : forward-saved (m, inv) reused
  delta     : rs via MXU output recompute
  mxu_das   : d alpha_src column sums via one MXU contraction
  all       : everything on

Writes artifacts/bwd_variants_ab.json.
"""
from __future__ import annotations

import json
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
    from gnn_bfs_rans_tpu.kernels.banded import banded_gat_fwd
    from gnn_bfs_rans_tpu.kernels.banded_bwd import banded_gat_bwd
    from gnn_bfs_rans_tpu.train import load_dataset

    ds = load_dataset("/root/reference/OpenFOAM-data", with_band=True,
                      band_components=LAYER_COMPONENTS.get("GAT"))
    g = ds.graph.to_device()
    n = g.n_pad
    bias = g.band.bias_self
    H, C = 4, 256
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    z = (jax.random.normal(key, (n, H * C), jnp.float32) * 0.1).astype(dt)
    alphas = jax.random.normal(key, (n, 2 * H), jnp.float32)
    gout = (jax.random.normal(key, (n, C), jnp.float32) * 0.1).astype(dt)
    seed = jnp.zeros((1,), jnp.int32)
    rate = 0.1

    _, stats = banded_gat_fwd(bias, z, alphas, H, 0.2, rate, seed,
                              mean_heads=True, emit_stats=True)
    stats = jax.block_until_ready(stats)

    from gnn_bfs_rans_tpu.utils.trace import trace_steps

    def measure_bwd(use_stats, delta, das):
        """Device-lane µs of one bwd call: kernel op + everything else."""
        @jax.jit
        def step(s):
            return banded_gat_bwd(
                bias, z, alphas, gout, H, 0.2, dropout_rate=rate,
                seed=s, mean_expand=True,
                stats=stats if use_stats else None,
                delta_rs=delta, mxu_das=das)
        jax.block_until_ready(step(seed))
        res = trace_steps(lambda i: step(seed + i), n_steps=32)
        ops = res["ops_us_per_step"]
        kern = sum(v for k, v in ops.items() if "gat_bwd" in k.lower()
                   or "custom-call" in k.lower())
        total = res["device_total_s_per_step"] * 1e6
        return {"total_us": total, "kernel_us": kern,
                "top": dict(list(ops.items())[:4])}

    results = {}
    for name, (s, d, m) in {
        "base": (False, False, False),
        "stats": (True, False, False),
        "delta": (False, True, False),
        "mxu_das": (False, False, True),
        "delta+mxu_das": (False, True, True),
        "stats+mxu_das": (True, False, True),
        "all": (True, True, True),
    }.items():
        r = measure_bwd(s, d, m)
        results[name] = r
        print(f"{name:14s}: total {r['total_us']:7.1f} us  "
              f"kernel {r['kernel_us']:7.1f} us", flush=True)

    # forward with/without stats emission (cost of the extra write)
    def measure_fwd(emit):
        @jax.jit
        def step(s):
            return banded_gat_fwd(bias, z, alphas, H, 0.2, rate, s,
                                  mean_heads=True, emit_stats=emit)
        jax.block_until_ready(step(seed))
        res = trace_steps(lambda i: step(seed + i), n_steps=32)
        return {"total_us": res["device_total_s_per_step"] * 1e6}

    for name, emit in (("fwd_base", False), ("fwd_stats", True)):
        r = measure_fwd(emit)
        results[name] = r
        print(f"{name:14s}: total {r['total_us']:7.1f} us", flush=True)

    out = {"shape": {"n": int(n), "H": H, "C": C, "dtype": "bfloat16",
                     "dropout": rate, "mean_expand": True},
           "method": "per-op device trace (utils.trace), 32 dispatches",
           "device_us": results}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "bwd_variants_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
