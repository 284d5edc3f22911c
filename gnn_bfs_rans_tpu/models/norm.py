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
            m = mask.astype(x.dtype)[:, None]
            count = jnp.maximum(jnp.sum(m), 1.0)
            total = jnp.sum(x * m, axis=0)
            if self.axis_name is not None:
                count = jax.lax.psum(count, self.axis_name)
                total = jax.lax.psum(total, self.axis_name)
            mean = total / count
            sq = jnp.sum(((x - mean) ** 2) * m, axis=0)
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

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale + bias
