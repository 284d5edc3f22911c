"""Differentiable jnp reference implementations of the banded kernels.

Used (a) as allclose ground truth in kernel tests and (b) as the VJP bodies
for the Pallas forward kernels (the band masks are graph constants, so the
backward of the fused attention kernels is just the VJP of this math).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _windows(x: jax.Array, tile: int) -> jax.Array:
    """[N, F] → [n_tiles, 3T, F] overlapping windows (zero-padded ends)."""
    n_tiles = x.shape[0] // tile
    xp = jnp.pad(x, ((tile, tile), (0, 0)))
    xr = xp.reshape(n_tiles + 2, tile, x.shape[1])
    return jnp.concatenate(
        [xr[:-2], xr[1:-1], xr[2:]], axis=1
    )  # [n_tiles, 3T, F]


def _bias_rows(bias: jax.Array) -> jax.Array:
    """[n_tiles, 3, T, T] → [n_tiles, T, 3T] (row-major window columns)."""
    return jnp.swapaxes(bias, 1, 2).reshape(
        bias.shape[0], bias.shape[2], 3 * bias.shape[3]
    )


def banded_spmm_ref(band_coeff: jax.Array, x: jax.Array) -> jax.Array:
    n_tiles, _, tile, _ = band_coeff.shape
    win = _windows(x, tile)                               # [n, 3T, H]
    a = _bias_rows(band_coeff)                            # [n, T, 3T] (coeffs)
    return jnp.einsum("ntw,nwh->nth", a, win).reshape(x.shape)


def banded_gat_ref(
    bias_self: jax.Array,
    z: jax.Array,
    alpha_src: jax.Array,
    alpha_dst: jax.Array,
    heads: int,
    negative_slope: float = 0.2,
) -> jax.Array:
    n_tiles, _, tile, _ = bias_self.shape
    n, hc = z.shape
    c = hc // heads
    win_z = _windows(z, tile).reshape(n_tiles, 3 * tile, heads, c)
    win_a = _windows(alpha_src, tile)                     # [n, 3T, H]
    a_d = alpha_dst.reshape(n_tiles, tile, heads)
    logits = a_d[:, :, None, :] + win_a[:, None, :, :]    # [n, T, 3T, H]
    logits = jnp.where(logits >= 0, logits, negative_slope * logits)
    logits = logits + _bias_rows(bias_self)[..., None]
    m = jnp.max(logits, axis=2, keepdims=True)
    e = jnp.exp(logits - m)
    denom = jnp.maximum(jnp.sum(e, axis=2, keepdims=True), 1e-16)
    p = e / denom                                          # [n, T, 3T, H]
    out = jnp.einsum("ntwh,nwhc->nthc", p, win_z)
    return out.reshape(n, hc)


def banded_transformer_ref(
    bias_noself: jax.Array,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
) -> jax.Array:
    n_tiles, _, tile, _ = bias_noself.shape
    n, hc = q.shape
    c = hc // heads
    qh = q.reshape(n_tiles, tile, heads, c)
    win_k = _windows(k, tile).reshape(n_tiles, 3 * tile, heads, c)
    win_v = _windows(v, tile).reshape(n_tiles, 3 * tile, heads, c)
    logits = jnp.einsum("nthc,nwhc->ntwh", qh, win_k) / (c ** 0.5)
    logits = logits + _bias_rows(bias_noself)[..., None]
    m = jnp.maximum(jnp.max(logits, axis=2, keepdims=True), -1e30)
    e = jnp.exp(logits - m)
    e = jnp.where(logits <= -1e29, 0.0, e)
    denom = jnp.maximum(jnp.sum(e, axis=2, keepdims=True), 1e-16)
    p = e / denom
    out = jnp.einsum("ntwh,nwhc->nthc", p, win_v)
    return out.reshape(n, hc)
