#!/usr/bin/env python
"""Micro-profile node-dropout cost patterns on TPU (chained-marginal).

The train-step decomposition (tools/profile_train.py) shows dropout at
~1.8 ms/step even with rbg keys.  This isolates candidate causes at the
flagship shape (6 dropout sites of [12544, 256] + 4 in-kernel attention
dropouts):

  many_keys  — 6 separate fold_in + bernoulli calls (what flax Dropout does)
  one_call   — single bernoulli of [6, N, H], sliced per site
  bits_only  — raw random_bits for the same total volume
  apply_only — precomputed masks, apply+scale only
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N, H, S = 12544, 256, 6
RATE = 0.1


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
    x = jnp.ones((N, H), jnp.bfloat16)
    key = jax.random.key(0, impl="rbg")

    def many_keys(i, x):
        k = jax.random.fold_in(key, i)
        out = x
        for s in range(S):
            ks = jax.random.fold_in(k, s)
            keep = jax.random.bernoulli(ks, 1 - RATE, (N, H))
            out = jnp.where(keep, out / (1 - RATE), 0)
        return out

    def one_call(i, x):
        k = jax.random.fold_in(key, i)
        keep = jax.random.bernoulli(k, 1 - RATE, (S, N, H))
        out = x
        for s in range(S):
            out = jnp.where(keep[s], out / (1 - RATE), 0)
        return out

    def bits_only(i, x):
        k = jax.random.fold_in(key, i)
        bits = jax.random.bits(k, (S, N, H), jnp.uint8)
        return x + bits.astype(jnp.bfloat16)[0] * 1e-30

    masks = jax.random.bernoulli(key, 1 - RATE, (S, N, H))

    def apply_only(i, x):
        out = x
        for s in range(S):
            out = jnp.where(masks[s], out / (1 - RATE), 0)
        return out

    for name, fn in [("many_keys", many_keys), ("one_call", one_call),
                     ("bits_only", bits_only), ("apply_only", apply_only)]:
        t = chain(fn, x)
        print(f"{name:11s}: {t*1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()
