#!/usr/bin/env python
"""On-device validation of the Mosaic attention kernels (real TPU compile).

References are evaluated under jax.default_matmul_precision("highest"):
the kernels use exact multi-pass MXU matmuls for f32 primals (see
kernels.banded._prec), while a default-precision jnp reference would
itself carry ~5e-3 single-pass-bf16 rounding.

The pytest suite runs the Pallas kernels in interpret mode on CPU
(tests/conftest.py forces the CPU backend for the virtual-device sharding
tests), so the Mosaic lowering itself — and the TPU-only in-kernel dropout
PRNG — is exercised here instead:

  * GAT + Transformer forward vs the jnp references
  * GAT + Transformer backward (fused Pallas kernels) vs jax.grad of refs
  * dropout determinism: same seed → same output, replayed in backward
  * fwd/bwd dropout-mask consistency via a linearity identity

Run: python tools/tpu_validate.py   (needs the TPU attached)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gnn_bfs_rans_tpu.graph.band import build_band
from gnn_bfs_rans_tpu.graph.structs import build_padded_graph
from gnn_bfs_rans_tpu.kernels.banded import (
    banded_gat,
    banded_gat_mean,
    banded_transformer,
)
from gnn_bfs_rans_tpu.kernels.reference import (
    banded_gat_ref,
    banded_transformer_ref,
)


def band_graph(n=512, tile=128, seed=0):
    rng = np.random.default_rng(seed)
    width = tile
    pairs = set()
    for i in range(n - 1):
        pairs.add((i, i + 1))
        pairs.add((i + 1, i))
    for i in range(n):
        for j in range(max(0, i - width + 1), min(n, i + width)):
            if i != j and rng.random() < 0.05:
                pairs.add((j, i))
                pairs.add((i, j))
    pairs = {(s, d) for s, d in pairs if abs(s - d) < width}
    src = np.array([p[0] for p in sorted(pairs)], dtype=np.int32)
    dst = np.array([p[1] for p in sorted(pairs)], dtype=np.int32)
    node_feat = rng.normal(size=(n, 3)).astype(np.float32)
    edge_feat = rng.normal(size=(len(src), 4)).astype(np.float32)
    g = build_padded_graph(src, dst, edge_feat, node_feat,
                           node_align=tile, edge_align=32)
    band = build_band(
        np.asarray(g.senders)[: g.n_edges],
        np.asarray(g.receivers)[: g.n_edges],
        g.n_pad,
        np.asarray(g.node_mask),
        np.asarray(g.in_degree),
        tile=tile,
    )
    assert band is not None
    return g, band


def main():
    print("backend:", jax.default_backend())
    assert jax.default_backend() == "tpu", "attach a TPU for Mosaic validation"
    g, band = band_graph()
    n = g.n_pad
    H, C = 4, 64
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(n, H * C)), jnp.float32)
    a_s = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
    a_d = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)

    assert band.bias_self.dtype == jnp.int8, band.bias_self.dtype

    out_k = banded_gat(band.bias_self, z, a_s, a_d, H, 0.2)
    with jax.default_matmul_precision("highest"):
        out_r = banded_gat_ref(band.bias_self, z, a_s, a_d, H, 0.2)
    err = float(jnp.max(jnp.abs(out_k - out_r)))
    print(f"GAT fwd   max|kernel-ref| = {err:.2e}")
    assert err < 1e-4

    out_m = banded_gat_mean(band.bias_self, z, a_s, a_d, H, 0.2)
    err = float(jnp.max(jnp.abs(
        out_m - out_r.reshape(-1, H, C).mean(axis=1))))
    print(f"GAT mean  max|kernel-ref| = {err:.2e}")
    assert err < 1e-4

    def loss_k(z_, s_, d_):
        return jnp.sum(banded_gat(band.bias_self, z_, s_, d_, H, 0.2) ** 2)

    def loss_r(z_, s_, d_):
        return jnp.sum(banded_gat_ref(band.bias_self, z_, s_, d_, H, 0.2) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(z, a_s, a_d)
    with jax.default_matmul_precision("highest"):
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(z, a_s, a_d)
    for name, a, b in zip(("dz", "das", "dad"), gk, gr):
        e = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-12))
        print(f"GAT bwd   rel max err {name} = {e:.2e}")
        assert e < 1e-4, name

    q = jnp.asarray(rng.normal(size=(n, H * C)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(n, H * C)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n, H * C)), jnp.float32)
    out_k = banded_transformer(band.bias_noself, q, k, v, H)
    with jax.default_matmul_precision("highest"):
        out_r = banded_transformer_ref(band.bias_noself, q, k, v, H)
    err = float(jnp.max(jnp.abs(out_k - out_r)))
    print(f"TR fwd    max|kernel-ref| = {err:.2e}")
    assert err < 1e-3

    def loss_tk(q_, k_, v_):
        return jnp.sum(banded_transformer(band.bias_noself, q_, k_, v_, H) ** 2)

    def loss_tr(q_, k_, v_):
        return jnp.sum(
            banded_transformer_ref(band.bias_noself, q_, k_, v_, H) ** 2)

    gk = jax.grad(loss_tk, argnums=(0, 1, 2))(q, k, v)
    with jax.default_matmul_precision("highest"):
        gr = jax.grad(loss_tr, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gk, gr):
        e = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-12))
        print(f"TR bwd    rel max err {name} = {e:.2e}")
        assert e < 1e-3, name

    # dropout determinism + replay (Mosaic PRNG — TPU only)
    s1 = jnp.asarray([7], jnp.int32)
    s2 = jnp.asarray([8], jnp.int32)
    o1 = banded_gat(band.bias_self, z, a_s, a_d, H, 0.2, 0.3, s1)
    o2 = banded_gat(band.bias_self, z, a_s, a_d, H, 0.2, 0.3, s1)
    o3 = banded_gat(band.bias_self, z, a_s, a_d, H, 0.2, 0.3, s2)
    assert bool(jnp.all(o1 == o2))
    assert not bool(jnp.all(o1 == o3))
    print("dropout determinism ok")

    g1 = jax.grad(lambda z_: jnp.sum(
        banded_gat(band.bias_self, z_, a_s, a_d, H, 0.2, 0.3, s1) ** 2))(z)
    g2 = jax.grad(lambda z_: jnp.sum(
        banded_gat(band.bias_self, z_, a_s, a_d, H, 0.2, 0.3, s1) ** 2))(z)
    assert bool(jnp.all(g1 == g2))
    print("dropout grad determinism ok")

    # fwd/bwd mask CONSISTENCY: for f(z)=sum(out), out is linear in z given
    # the (seeded) attention weights, so grad^T z == f(z) exactly when the
    # backward replays the identical dropout mask.
    f = lambda z_: jnp.sum(
        banded_gat(band.bias_self, z_, a_s, a_d, H, 0.2, 0.3, s1))
    gz = jax.grad(f)(z)
    lhs = float(jnp.vdot(gz, z))
    rhs = float(f(z))
    print(f"linearity check: grad·z = {lhs:.6f}  f(z) = {rhs:.6f}")
    assert abs(lhs - rhs) < 1e-2 * max(1.0, abs(rhs))
    print("ALL OK")


if __name__ == "__main__":
    main()
