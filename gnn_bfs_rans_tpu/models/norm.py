"""Masked batch normalization with torch-compatible semantics.

The reference normalizes node features with PyG ``BatchNorm`` (a thin wrapper
over ``torch.nn.BatchNorm1d``; ``gnn_model.py:87,188``).  Our graphs are
padded to static shapes, so statistics must be computed over *real* nodes
only — flax's ``nn.BatchNorm`` has no mask support, hence this module.

Torch semantics preserved for checkpoint parity (BASELINE.md "prediction
parity"): biased variance for normalization, unbiased variance written into
the running estimate, ``momentum=0.1``, ``eps=1e-5``; eval mode uses running
stats (which is what the reference's "validation" exercises, SURVEY.md §2
quirk 6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    # when set, masked sums/counts are psum'd over this mesh axis — exact
    # distributed ("sync") BN for node-sharded forwards (parallel.partition)
    axis_name: str | None = None

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: jax.Array, use_running_average: bool = True
    ) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # statistics always accumulate in float32 (bf16 sums over 10k+
            # nodes lose precision), but x itself is never upcast — the
            # normalization is applied as a per-feature affine in x.dtype
            xf = x.astype(jnp.float32)
            m = mask.astype(jnp.float32)[:, None]
            count = jnp.maximum(jnp.sum(m), 1.0)
            total = jnp.sum(xf * m, axis=0)
            if self.axis_name is not None:
                count = jax.lax.psum(count, self.axis_name)
                total = jax.lax.psum(total, self.axis_name)
            mean = total / count
            sq = jnp.sum(((xf - mean) ** 2) * m, axis=0)
            if self.axis_name is not None:
                sq = jax.lax.psum(sq, self.axis_name)
            var = sq / count  # biased
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )

        # Normalize as (x − m̃)·a + b̃ entirely in x.dtype — no f32 copy of
        # [N, H] per layer (the f32 round trip cost ~46 µs/layer of the bf16
        # flagship forward).  Subtracting the mean FIRST (rather than folding
        # it into the bias as x·a + (b − m·a)) keeps bf16 rounding error
        # proportional to the small centered value, not to |x·a|: for
        # channels with |mean| ≫ std the folded form cancels two large
        # bf16-rounded products (a few-percent drift).  m̃ is the mean as
        # representable in x.dtype; its own rounding error is corrected
        # exactly in the f32-computed bias term b̃ = b + (m̃ − m)·a.
        inv = jax.lax.rsqrt(var + self.eps)
        eff_scale = scale * inv
        mean_lo = mean.astype(x.dtype)
        eff_bias = bias + (mean_lo.astype(jnp.float32) - mean) * eff_scale
        return (x - mean_lo) * eff_scale.astype(x.dtype) + eff_bias.astype(
            x.dtype
        )


class FusedEpilogueBN(nn.Module):
    """Residual + BatchNorm + ReLU + dropout as ONE fused op (training path).

    Drop-in replacement for the per-layer epilogue block in
    ``models.flow_gnn`` (reference semantics ``gnn_model.py:184-192``),
    dispatching to :func:`kernels.epilogue.fused_epilogue` — a Pallas
    kernel with a custom VJP that stores only the residual sum instead of
    dropout/ReLU masks and f32 normalization intermediates (VERDICT r3
    item 2).  Parameter/variable names match ``MaskedBatchNorm`` exactly
    (``scale``/``bias`` + ``batch_stats.{mean,var}``), so checkpoints are
    interchangeable with the unfused path; instantiate with the same
    ``name="bn_<i>"``.

    Eval mode and initialization use the unfused affine (running stats, no
    dropout) — the fused kernel covers exactly the hot training step.
    """

    features: int
    rate: float = 0.0
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_new: jax.Array,
        n_valid: int,
        train: bool,
    ) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features)
        )

        if not train or self.is_initializing():
            # eval / init: running-stats affine + relu, dropout off — the
            # exact MaskedBatchNorm eval composition
            xr = x + x_new
            mean, var = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(var + self.eps)
            eff_scale = scale * inv
            mean_lo = mean.astype(xr.dtype)
            eff_bias = bias + (mean_lo.astype(jnp.float32) - mean) * eff_scale
            y = (xr - mean_lo) * eff_scale.astype(xr.dtype) + eff_bias.astype(
                xr.dtype
            )
            return jax.nn.relu(y)

        from ..kernels.epilogue import fused_epilogue

        seed = None
        if self.rate > 0:
            from .convs import _dropout_seed

            seed = _dropout_seed(self.make_rng("dropout"))
        y, mean, var = fused_epilogue(
            x, x_new, scale, bias, seed, n_valid, float(self.rate),
            float(self.eps),
        )
        count = jnp.float32(n_valid)
        unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
        ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
        ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        return y
