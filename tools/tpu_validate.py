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

  * GAT + Transformer (plain / edge-conditioned / geo-factorized) forward
    vs the jnp references
  * the fused Pallas backward kernels vs jax.grad of the references
  * dropout determinism: same seed → same output, replayed in backward
  * fwd/bwd dropout-mask consistency via a linearity identity

Every check is recorded and written as a JSON artifact (default
``artifacts/tpu_validate.json``; pass ``--out artifacts/tpu_validate_rN.json``
per round) so kernel-accuracy claims are reproducible evidence, not commit
messages.

Run: python tools/tpu_validate.py [--out PATH]   (needs the TPU attached)
"""
from __future__ import annotations

import json
import os
import sys
import time

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
    banded_transformer_edge,
    banded_transformer_geo,
    banded_transformer_geo_mean,
)
from gnn_bfs_rans_tpu.kernels.reference import (
    banded_gat_ref,
    banded_transformer_edge_ref,
    banded_transformer_ref,
)

RESULTS: list[dict] = []


def record(kernel: str, check: str, err: float, tol: float) -> None:
    ok = err < tol
    RESULTS.append({"kernel": kernel, "check": check, "max_err": err,
                    "tol": tol, "pass": ok})
    mark = "ok " if ok else "FAIL"
    print(f"{mark} {kernel:24s} {check:28s} {err:.2e} (tol {tol:.0e})")
    assert ok, f"{kernel}/{check}: {err} >= {tol}"


def record_bool(kernel: str, check: str, ok: bool) -> None:
    RESULTS.append({"kernel": kernel, "check": check, "pass": bool(ok)})
    print(f"{'ok ' if ok else 'FAIL'} {kernel:24s} {check}")
    assert ok, f"{kernel}/{check}"


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
        edge_feat=edge_feat,
    )
    assert band is not None
    return g, band


def rel_err(a, b) -> float:
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-12))


def validate_gat(band, z, a_s, a_d, H, C):
    out_k = banded_gat(band.bias_self, z, a_s, a_d, H, 0.2)
    with jax.default_matmul_precision("highest"):
        out_r = banded_gat_ref(band.bias_self, z, a_s, a_d, H, 0.2)
    record("gat", "fwd_max_abs", float(jnp.max(jnp.abs(out_k - out_r))), 1e-4)

    out_m = banded_gat_mean(band.bias_self, z, a_s, a_d, H, 0.2)
    record("gat_mean", "fwd_max_abs",
           float(jnp.max(jnp.abs(out_m - out_r.reshape(-1, H, C).mean(1)))),
           1e-4)

    def loss_k(z_, s_, d_):
        return jnp.sum(banded_gat(band.bias_self, z_, s_, d_, H, 0.2) ** 2)

    def loss_r(z_, s_, d_):
        return jnp.sum(banded_gat_ref(band.bias_self, z_, s_, d_, H, 0.2) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(z, a_s, a_d)
    with jax.default_matmul_precision("highest"):
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(z, a_s, a_d)
    for name, a, b in zip(("dz", "das", "dad"), gk, gr):
        record("gat", f"bwd_rel_{name}", rel_err(a, b), 1e-4)


def validate_transformer(band, q, k, v, H):
    out_k = banded_transformer(band.bias_noself, q, k, v, H)
    with jax.default_matmul_precision("highest"):
        out_r = banded_transformer_ref(band.bias_noself, q, k, v, H)
    record("transformer", "fwd_max_abs",
           float(jnp.max(jnp.abs(out_k - out_r))), 1e-3)

    def loss_tk(q_, k_, v_):
        return jnp.sum(banded_transformer(band.bias_noself, q_, k_, v_, H) ** 2)

    def loss_tr(q_, k_, v_):
        return jnp.sum(
            banded_transformer_ref(band.bias_noself, q_, k_, v_, H) ** 2)

    gk = jax.grad(loss_tk, argnums=(0, 1, 2))(q, k, v)
    with jax.default_matmul_precision("highest"):
        gr = jax.grad(loss_tr, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gk, gr):
        record("transformer", f"bwd_rel_{name}", rel_err(a, b), 1e-3)


def validate_edge_and_geo(band, q, k, v, qw, H):
    """Generic edge-conditioned kernel vs reference, then the factorized
    geometric kernel vs the generic one on a geometric grid."""
    out_k, s_k = banded_transformer_edge(
        band.bias_noself, band.edge, q, k, v, qw, H)
    with jax.default_matmul_precision("highest"):
        out_r, s_r = banded_transformer_edge_ref(
            band.bias_noself, band.edge, q, k, v, qw, H)
    record("transformer_edge", "fwd_max_abs",
           float(jnp.max(jnp.abs(out_k - out_r))), 1e-3)
    record("transformer_edge", "fwd_s_max_abs",
           float(jnp.max(jnp.abs(s_k - s_r))), 1e-3)

    def loss(fn, *b):
        def inner(q_, k_, v_, w_):
            out, s = fn(*b, q_, k_, v_, w_, H)
            return jnp.sum(out ** 2) + jnp.sum(jnp.sin(s))
        return inner

    gk = jax.grad(loss(banded_transformer_edge, band.bias_noself, band.edge),
                  argnums=(0, 1, 2, 3))(q, k, v, qw)
    with jax.default_matmul_precision("highest"):
        gr = jax.grad(
            loss(banded_transformer_edge_ref, band.bias_noself, band.edge),
            argnums=(0, 1, 2, 3))(q, k, v, qw)
    for name, a, b in zip(("dq", "dk", "dv", "dqw"), gk, gr):
        record("transformer_edge", f"bwd_rel_{name}", rel_err(a, b), 1e-3)


def validate_geo(H=4, C=64):
    from gnn_bfs_rans_tpu.utils.synthetic import build_grid_graph

    g = build_grid_graph(96, 12, with_band=False, tile=128)
    s = np.asarray(g.senders)[: g.n_edges]
    r = np.asarray(g.receivers)[: g.n_edges]
    ef = np.asarray(g.edge_feat)[: g.n_edges]
    args = (s, r, g.n_pad, np.asarray(g.node_mask), np.asarray(g.in_degree))
    b_edge = build_band(*args, tile=128, components=("bias_noself", "edge"),
                        edge_feat=ef)
    b_geo = build_band(*args, tile=128, components=("bias_noself", "geo"),
                       edge_feat=ef, node_pos=np.asarray(g.node_feat))
    assert b_geo.geo is not None
    rng = np.random.default_rng(5)
    q, k, v = (jnp.asarray(rng.normal(size=(g.n_pad, H * C)), jnp.float32)
               for _ in range(3))
    qw = jnp.asarray(rng.normal(size=(g.n_pad, H * 4)), jnp.float32)
    pos = jnp.asarray(b_geo.pos)

    out_e, s_e = banded_transformer_edge(
        b_edge.bias_noself, b_edge.edge, q, k, v, qw, H)
    out_g, s_g = banded_transformer_geo(
        b_geo.bias_noself, b_geo.geo, pos, q, k, v, qw, H)
    record("transformer_geo", "fwd_vs_generic",
           float(jnp.max(jnp.abs(out_g - out_e))), 1e-3)
    record("transformer_geo", "fwd_s_vs_generic",
           float(jnp.max(jnp.abs(s_g - s_e))), 1e-3)

    om_g, _ = banded_transformer_geo_mean(
        b_geo.bias_noself, b_geo.geo, pos, q, k, v, qw, H)
    record("transformer_geo_mean", "fwd_vs_generic",
           float(jnp.max(jnp.abs(
               om_g - out_e.reshape(-1, H, C).mean(1)))), 1e-3)

    def loss(fn, *b):
        def inner(q_, k_, v_, w_):
            out, s = fn(*b, q_, k_, v_, w_, H)
            return jnp.sum(out ** 2) + jnp.sum(jnp.sin(s))
        return inner

    ge = jax.grad(loss(banded_transformer_edge, b_edge.bias_noself,
                       b_edge.edge), argnums=(0, 1, 2, 3))(q, k, v, qw)
    gg = jax.grad(loss(banded_transformer_geo, b_geo.bias_noself, b_geo.geo,
                       pos), argnums=(0, 1, 2, 3))(q, k, v, qw)
    for name, a, b in zip(("dq", "dk", "dv", "dqw"), ge, gg):
        record("transformer_geo", f"bwd_rel_{name}", rel_err(b, a), 1e-3)


def validate_dropout(band, z, a_s, a_d, H):
    s1 = jnp.asarray([7], jnp.int32)
    s2 = jnp.asarray([8], jnp.int32)
    o1 = banded_gat(band.bias_self, z, a_s, a_d, H, 0.2, 0.3, s1)
    o2 = banded_gat(band.bias_self, z, a_s, a_d, H, 0.2, 0.3, s1)
    o3 = banded_gat(band.bias_self, z, a_s, a_d, H, 0.2, 0.3, s2)
    record_bool("gat_dropout", "same_seed_same_output",
                bool(jnp.all(o1 == o2)))
    record_bool("gat_dropout", "diff_seed_diff_output",
                not bool(jnp.all(o1 == o3)))

    g1 = jax.grad(lambda z_: jnp.sum(
        banded_gat(band.bias_self, z_, a_s, a_d, H, 0.2, 0.3, s1) ** 2))(z)
    g2 = jax.grad(lambda z_: jnp.sum(
        banded_gat(band.bias_self, z_, a_s, a_d, H, 0.2, 0.3, s1) ** 2))(z)
    record_bool("gat_dropout", "grad_determinism", bool(jnp.all(g1 == g2)))

    # fwd/bwd mask CONSISTENCY: for f(z)=sum(out), out is linear in z given
    # the (seeded) attention weights, so grad^T z == f(z) exactly when the
    # backward replays the identical dropout mask.
    f = lambda z_: jnp.sum(
        banded_gat(band.bias_self, z_, a_s, a_d, H, 0.2, 0.3, s1))
    gz = jax.grad(f)(z)
    lhs, rhs = float(jnp.vdot(gz, z)), float(f(z))
    record("gat_dropout", "linearity_fwd_bwd_mask",
           abs(lhs - rhs) / max(1.0, abs(rhs)), 1e-2)


def validate_spmm():
    """Banded SpMM on BOTH dtype paths — incl. the bf16-coeff × f32-x mix.

    Regression guard for the round-4 "Bad lhs type" Mosaic failure: the 0/1
    adjacency is stored bf16 while the f32 accuracy path feeds f32 features
    into a HIGHEST-precision dot; the kernel must upcast the coefficients
    in VMEM (GIN --compute_dtype float32 crashed at init before the fix).
    """
    from gnn_bfs_rans_tpu.kernels.banded import banded_spmm

    g, band = band_graph()
    n = g.n_pad
    rng = np.random.default_rng(9)
    # dense reference from the band structure
    coeff = np.asarray(band.gcn, np.float32)
    n_tiles, window, tile, _ = coeff.shape
    k0 = (window - 1) // 2
    dense = np.zeros((n, n), np.float32)
    for t in range(n_tiles):
        for k in range(window):
            src = t + k - k0
            if 0 <= src < n_tiles:
                dense[t*tile:(t+1)*tile, src*tile:(src+1)*tile] = coeff[t, k]
    for dt, tag in ((jnp.float32, "f32_x"), (jnp.bfloat16, "bf16_x")):
        x = jnp.asarray(rng.normal(size=(n, 128)), dt)
        ref = dense @ np.asarray(x, np.float32)
        # f32 coeffs (gcn) vs x
        got = banded_spmm(jnp.asarray(band.gcn), x)
        record(f"spmm_gcn_{tag}", "fwd_vs_dense",
               float(np.abs(np.asarray(got, np.float32) - ref).max()
                     / max(np.abs(ref).max(), 1)),
               1e-5 if dt == jnp.float32 else 2e-2)
        # bf16 coeffs (adj-style cast) vs x — the mixed-dtype path
        got2 = banded_spmm(jnp.asarray(band.gcn).astype(jnp.bfloat16), x)
        record(f"spmm_bf16coeff_{tag}", "fwd_vs_dense",
               float(np.abs(np.asarray(got2, np.float32) - ref).max()
                     / max(np.abs(ref).max(), 1)), 2e-2)


def validate_epilogue():
    """Fused residual+BN+ReLU+dropout epilogue (kernels.epilogue) on device.

    Pins real-TPU parity incl. bf16 — the CPU interpret path executes bf16
    arithmetic in f32 without intermediate rounding, so the pytest suite's
    bf16 tolerances are wide; the on-device numbers here are the honest
    ones (see tests/test_epilogue.py).
    """
    from gnn_bfs_rans_tpu.kernels.epilogue import (
        fused_epilogue, reference_epilogue,
    )

    N_VALID, N_PAD, C = 1000, 1024, 128
    rng = np.random.default_rng(5)
    for dt, tag, tol in ((jnp.float32, "f32", 2e-5),
                         (jnp.bfloat16, "bf16", 3e-2)):
        x = jnp.asarray(rng.normal(size=(N_PAD, C)), dt)
        xn = jnp.asarray(rng.normal(size=(N_PAD, C)), dt)
        scale = jnp.asarray(1 + 0.1 * rng.normal(size=C), jnp.float32)
        bias = jnp.asarray(0.1 * rng.normal(size=C), jnp.float32)
        mask = jnp.asarray(np.arange(N_PAD) < N_VALID)
        y, m, v = jax.jit(
            lambda *a: fused_epilogue(*a, N_VALID, 0.0, 1e-5)
        )(x, xn, scale, bias, jnp.zeros((1,), jnp.int32))
        yr, mr, vr = reference_epilogue(x, xn, scale, bias, mask, 0.0, 1e-5)
        record(f"epilogue_{tag}", "fwd_vs_reference",
               float(jnp.abs(y.astype(jnp.float32)
                             - yr.astype(jnp.float32)).max()), tol)
        record(f"epilogue_{tag}", "var_vs_reference",
               float(jnp.abs(v - vr).max()), 1e-3 if tag == "f32" else 2e-2)

        def loss_f(x, xn, s, b):
            y, _, _ = fused_epilogue(x, xn, s, b,
                                     jnp.zeros((1,), jnp.int32),
                                     N_VALID, 0.0, 1e-5)
            return jnp.sum(jnp.tanh(y.astype(jnp.float32)))

        def loss_r(x, xn, s, b):
            y, _, _ = reference_epilogue(x, xn, s, b, mask, 0.0, 1e-5)
            return jnp.sum(jnp.tanh(y.astype(jnp.float32)))

        gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2, 3)))(x, xn, scale, bias)
        gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2, 3)))(x, xn, scale, bias)
        for a, b, nm in zip(gf, gr, ("dx", "dxn", "dscale", "dbias")):
            d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
            if tag == "f32":
                record(f"epilogue_{tag}", f"bwd_{nm}", float(d.max()), 5e-4)
            elif nm in ("dscale", "dbias"):
                # per-channel row-sums: every ReLU boundary flip (see below)
                # shifts a sum by O(1) absolute, so compare relative to the
                # gradient magnitude
                rel = d / (jnp.abs(b.astype(jnp.float32)) + 1.0)
                record(f"epilogue_{tag}", f"bwd_{nm}_rel",
                       float(rel.max()), 8e-2)
            else:
                # bf16: elements with y_pre ≈ 0 legitimately flip their ReLU
                # mask between the kernel and the reference (1-ulp rounding
                # of the pre-activation decides a 0-vs-O(1) gradient), so the
                # max-abs metric is ill-posed; check the 99.9th percentile
                # and that boundary flips stay rare (<0.2% of elements)
                record(f"epilogue_{tag}", f"bwd_{nm}_p999",
                       float(jnp.quantile(d, 0.999)), 5e-2)
                record(f"epilogue_{tag}", f"bwd_{nm}_flip_frac",
                       float(jnp.mean((d > 0.1).astype(jnp.float32))), 2e-3)

    # dropout: keep-rate + forward/backward mask replay (Mosaic PRNG)
    x = jnp.asarray(rng.normal(size=(N_PAD, C)), jnp.float32)
    xn = jnp.asarray(rng.normal(size=(N_PAD, C)), jnp.float32)
    scale = jnp.ones(C, jnp.float32); bias = jnp.zeros(C, jnp.float32)
    seed = jnp.asarray([42], jnp.int32)
    y0, _, _ = jax.jit(lambda *a: fused_epilogue(*a, N_VALID, 0.0, 1e-5))(
        x, xn, scale, bias, seed)
    y1, _, _ = jax.jit(lambda *a: fused_epilogue(*a, N_VALID, 0.3, 1e-5))(
        x, xn, scale, bias, seed)
    live = np.asarray(y0) > 0
    frac = float(((np.asarray(y1) == 0) & live).sum() / max(live.sum(), 1))
    record("epilogue_dropout", "keep_rate", abs(frac - 0.3), 0.02)
    dx = jax.jit(jax.grad(lambda x: jnp.sum(fused_epilogue(
        x, xn, scale, bias, seed, N_VALID, 0.3, 1e-5)[0])))(x)
    pad_y = np.asarray(y1)[N_VALID:]
    pad_dx = np.asarray(dx)[N_VALID:]
    bad = float(np.abs(pad_dx[pad_y == 0]).max()) if (pad_y == 0).any() else 0.0
    record("epilogue_dropout", "bwd_mask_replay", bad, 1e-12)


def main():
    out_path = "artifacts/tpu_validate.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
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

    validate_gat(band, z, a_s, a_d, H, C)

    q = jnp.asarray(rng.normal(size=(n, H * C)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(n, H * C)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n, H * C)), jnp.float32)
    validate_transformer(band, q, k, v, H)

    qw = jnp.asarray(rng.normal(size=(n, H * 4)), jnp.float32)
    validate_edge_and_geo(band, q, k, v, qw, H)
    validate_geo()
    validate_dropout(band, z, a_s, a_d, H)
    validate_spmm()
    validate_epilogue()

    artifact = {
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "device": str(jax.devices()[0]),
        "platform": jax.default_backend(),
        "all_pass": all(r["pass"] for r in RESULTS),
        "checks": RESULTS,
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"ALL OK — artifact written to {out_path}")


if __name__ == "__main__":
    main()
