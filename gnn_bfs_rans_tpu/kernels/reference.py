"""Differentiable jnp reference implementations of the banded kernels.

Used (a) as allclose ground truth in kernel tests and (b) as the VJP bodies
for the Pallas forward kernels (the band masks are graph constants, so the
backward of the fused attention kernels is just the VJP of this math).

Two band layouts (see :class:`gnn_bfs_rans_tpu.graph.band.Band`): SpMM
coefficients are full-tile window blocks ``[n_tiles, W, T, T]``; attention
masks/planes are pre-concatenated half-tile windows ``[.., T, Wcols]`` whose
window starts ``(Wcols − T)/2`` rows before the receiver tile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _windows(x: jax.Array, tile: int, width: int) -> jax.Array:
    """[N, F] → [n_tiles, Wcols, F] half-tile overlapping windows.

    Receiver tile ``t``'s window covers rows ``[t·T − pad, t·T − pad + Wcols)``
    of ``x`` where ``pad = (Wcols − T) / 2`` (zero-padded ends).
    """
    sub = tile // 2
    pad = (width - tile) // 2
    n_tiles = x.shape[0] // tile
    w_sub = width // sub
    xp = jnp.pad(x, ((pad, pad), (0, 0)))
    xr = xp.reshape(-1, sub, x.shape[1])        # [(N+2·pad)/sub, sub, F]
    r = tile // sub
    parts = [xr[k:k + n_tiles * r:r] for k in range(w_sub)]
    return jnp.concatenate(parts, axis=1)       # [n_tiles, Wcols, F]


def _full_windows(x: jax.Array, tile: int, window: int) -> jax.Array:
    """[N, F] → [n_tiles, W·T, F] full-tile windows (SpMM layout)."""
    k0 = window // 2
    n_tiles = x.shape[0] // tile
    xp = jnp.pad(x, ((k0 * tile, k0 * tile), (0, 0)))
    xr = xp.reshape(n_tiles + 2 * k0, tile, x.shape[1])
    parts = [xr[k:k + n_tiles] for k in range(window)]
    return jnp.concatenate(parts, axis=1)


def _bias_rows(bias: jax.Array) -> jax.Array:
    """[n_tiles, W, T, T] → [n_tiles, T, W·T] (row-major window columns)."""
    return jnp.swapaxes(bias, 1, 2).reshape(
        bias.shape[0], bias.shape[2], bias.shape[1] * bias.shape[3]
    )


def _additive_bias(mask: jax.Array) -> jax.Array:
    """int8 0/1 attention mask [n, T, Wcols] → additive 0/−1e30 bias."""
    return (mask.astype(jnp.float32) - 1.0) * 1e30


def banded_spmm_ref(band_coeff: jax.Array, x: jax.Array) -> jax.Array:
    n_tiles, window, tile, _ = band_coeff.shape
    win = _full_windows(x, tile, window)                  # [n, WT, H]
    a = _bias_rows(band_coeff)                            # [n, T, WT] (coeffs)
    return jnp.einsum("ntw,nwh->nth", a, win).reshape(x.shape)


def banded_gat_ref(
    bias_self: jax.Array,
    z: jax.Array,
    alpha_src: jax.Array,
    alpha_dst: jax.Array,
    heads: int,
    negative_slope: float = 0.2,
) -> jax.Array:
    n_tiles, tile, width = bias_self.shape
    n, hc = z.shape
    c = hc // heads
    win_z = _windows(z, tile, width).reshape(n_tiles, width, heads, c)
    win_a = _windows(alpha_src, tile, width)              # [n, Wc, H]
    a_d = alpha_dst.reshape(n_tiles, tile, heads)
    logits = a_d[:, :, None, :] + win_a[:, None, :, :]    # [n, T, Wc, H]
    logits = jnp.where(logits >= 0, logits, negative_slope * logits)
    logits = logits + _additive_bias(bias_self)[..., None]
    m = jnp.max(logits, axis=2, keepdims=True)
    e = jnp.exp(logits - m)
    denom = jnp.maximum(jnp.sum(e, axis=2, keepdims=True), 1e-16)
    p = e / denom                                          # [n, T, Wc, H]
    out = jnp.einsum("ntwh,nwhc->nthc", p, win_z)
    return out.reshape(n, hc)


def _transformer_attn(bias_noself, q, k, heads, extra_logit=None):
    """Shared attention-weight computation → p [n, T, Wcols, H]."""
    n_tiles, tile, width = bias_noself.shape
    n, hc = q.shape
    c = hc // heads
    qh = q.reshape(n_tiles, tile, heads, c)
    win_k = _windows(k, tile, width).reshape(n_tiles, width, heads, c)
    logits = jnp.einsum("nthc,nwhc->ntwh", qh, win_k) / (c ** 0.5)
    if extra_logit is not None:
        logits = logits + extra_logit
    logits = logits + _additive_bias(bias_noself)[..., None]
    m = jnp.maximum(jnp.max(logits, axis=2, keepdims=True), -1e30)
    e = jnp.exp(logits - m)
    e = jnp.where(logits <= -1e29, 0.0, e)
    denom = jnp.maximum(jnp.sum(e, axis=2, keepdims=True), 1e-16)
    return e / denom


def banded_transformer_ref(
    bias_noself: jax.Array,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
) -> jax.Array:
    n_tiles, tile, width = bias_noself.shape
    n, hc = q.shape
    c = hc // heads
    p = _transformer_attn(bias_noself, q, k, heads)
    win_v = _windows(v, tile, width).reshape(n_tiles, width, heads, c)
    out = jnp.einsum("ntwh,nwhc->nthc", p, win_v)
    return out.reshape(n, hc)


def banded_transformer_edge_ref(
    bias_noself: jax.Array,
    edge_band: jax.Array,   # [n_tiles, D_e, T, Wcols]
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    qw: jax.Array,          # [N, H*D_e]
    heads: int,
):
    """Edge-conditioned variant → (out [N, H*C], s [N, H*D_e]).

    Matches ``banded.banded_transformer_edge``: the logit gains
    ``scale · Σ_d qw_d · feat_d`` and ``s`` is the attention-weighted raw
    edge-feature sum (projected by W_e outside the kernel).
    """
    n_tiles, tile, width = bias_noself.shape
    n, hc = q.shape
    c = hc // heads
    d_e = edge_band.shape[1]
    # feat rows: [n, T, Wcols, D_e]
    feat = jnp.transpose(edge_band, (0, 2, 3, 1)).astype(jnp.float32)
    qwh = qw.reshape(n_tiles, tile, heads, d_e).astype(jnp.float32)
    extra = jnp.einsum("nthd,ntwd->ntwh", qwh, feat) / (c ** 0.5)
    p = _transformer_attn(bias_noself, q, k, heads, extra_logit=extra)
    win_v = _windows(v, tile, width).reshape(n_tiles, width, heads, c)
    out = jnp.einsum("ntwh,nwhc->nthc", p, win_v).reshape(n, hc)
    s = jnp.einsum("ntwh,ntwd->nthd", p, feat).reshape(n, heads * d_e)
    return out, s
