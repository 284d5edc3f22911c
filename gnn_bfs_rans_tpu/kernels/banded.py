"""Pallas TPU kernels: banded SpMM aggregation and fused banded attention.

These are the hot-op kernels of the framework (BASELINE.json north star:
"message passing becomes Pallas kernels").  After RCM reordering (bandwidth
≪ TILE), the entire neighbor structure of a tile of 128 destination nodes
lives in the 3 surrounding node tiles, so

* **banded SpMM** (GCN/GIN aggregation):
  ``out[t] = Σ_k A[t,k] @ x[t−1+k]`` — three dense 128×128 MXU matmuls per
  tile, no gather/scatter;
* **banded attention** (GAT / Graph-Transformer): per tile, per head —
  dense [T, 3T] logits (additive for GAT, scaled-dot-product via MXU for
  Transformer) + additive −1e30 sparsity mask, numerically-stable softmax in
  VMEM, then [T,3T] @ [3T,C] weighted sum.  A flash-attention-style fused
  kernel: per-edge logits/weights never touch HBM.

The three x-window tiles are expressed as three *blocked* input specs over a
zero-padded x (one tile of padding top and bottom), so Pallas pipelines the
HBM→VMEM streaming automatically — no manual DMA needed.

Backward passes route through ``jax.custom_vjp`` with the mathematically
identical dense-formulation VJP (the band matrices are constants of the
graph), so the kernels are usable under ``jax.grad`` too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_windows(x: jax.Array, tile: int) -> jax.Array:
    """Zero-pad one tile of rows on each side so window tiles never clamp."""
    return jnp.pad(x, ((tile, tile), (0, 0)))


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------------- SpMM
def _spmm_kernel(a_ref, xl_ref, xm_ref, xr_ref, o_ref):
    a = a_ref[0]
    acc = jnp.dot(a[0], xl_ref[:], preferred_element_type=jnp.float32)
    acc += jnp.dot(a[1], xm_ref[:], preferred_element_type=jnp.float32)
    acc += jnp.dot(a[2], xr_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def banded_spmm_fwd(band_coeff: jax.Array, x: jax.Array) -> jax.Array:
    """out = BandMatrix(band_coeff) @ x.

    band_coeff: [n_tiles, 3, T, T]; x: [n_tiles*T, H] → out same shape as x.
    """
    n_tiles, _, tile, _ = band_coeff.shape
    h = x.shape[1]
    xp = _pad_windows(x, tile)
    return pl.pallas_call(
        _spmm_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 3, tile, tile), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, h), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, h), lambda i: (i + 2, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * 3 * tile * tile * h,
            bytes_accessed=band_coeff.size * 4 + 4 * x.size * 4,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(band_coeff, xp, xp, xp)


@jax.custom_vjp
def banded_spmm(band_coeff: jax.Array, x: jax.Array) -> jax.Array:
    return banded_spmm_fwd(band_coeff, x)


def _spmm_vjp_fwd(band_coeff, x):
    return banded_spmm_fwd(band_coeff, x), band_coeff


def _spmm_vjp_bwd(band_coeff, g):
    # d/dx (A @ x) ᵀ-applied: Aᵀ @ g.  Our band matrices (GCN/GIN adjacency)
    # are symmetric, but transpose the band structure anyway for generality:
    # block (t, k) of Aᵀ = block (t−1+k, 2−k)ᵀ of A.
    at = _transpose_band(band_coeff)
    return None, banded_spmm_fwd(at, g)


def _transpose_band(band: jax.Array) -> jax.Array:
    n_tiles = band.shape[0]
    # target[t, k] = source[t-1+k, 2-k]^T ; out-of-range source tiles are zero
    padded = jnp.pad(band, ((1, 1), (0, 0), (0, 0), (0, 0)))
    idx = jnp.arange(n_tiles)
    blocks = []
    for k in range(3):
        src = padded[idx + k, 2 - k]            # [n_tiles, T, T]
        blocks.append(jnp.swapaxes(src, -1, -2))
    return jnp.stack(blocks, axis=1)


banded_spmm.defvjp(_spmm_vjp_fwd, _spmm_vjp_bwd)


# ---------------------------------------------------------- GAT attention
def _gat_kernel(bias_ref, asrc_l, asrc_m, asrc_r, adst_ref,
                zl_ref, zm_ref, zr_ref, o_ref, *, heads, negative_slope):
    tile = adst_ref.shape[0]
    c = zl_ref.shape[1] // heads
    bias = bias_ref[0]  # [3, T, T]
    outs = []
    for h in range(heads):
        # additive logits: a_dst[i] + a_src[j], per window block
        a_d = adst_ref[:, h][:, None]                       # [T, 1]
        logits = []
        for k, asrc in enumerate((asrc_l, asrc_m, asrc_r)):
            a_s = asrc[:, h][None, :]                       # [1, T]
            l = a_d + a_s
            l = jnp.where(l >= 0, l, negative_slope * l)    # LeakyReLU
            logits.append(l + bias[k])
        full = jnp.concatenate(logits, axis=1)              # [T, 3T]
        m = jnp.max(full, axis=1, keepdims=True)
        e = jnp.exp(full - m)
        denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
        p = e / denom
        acc = jnp.dot(p[:, :tile], zl_ref[:, h * c:(h + 1) * c],
                      preferred_element_type=jnp.float32)
        acc += jnp.dot(p[:, tile:2 * tile], zm_ref[:, h * c:(h + 1) * c],
                       preferred_element_type=jnp.float32)
        acc += jnp.dot(p[:, 2 * tile:], zr_ref[:, h * c:(h + 1) * c],
                       preferred_element_type=jnp.float32)
        outs.append(acc)
    o_ref[:] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def banded_gat_fwd(
    bias_self: jax.Array,
    z: jax.Array,          # [N, H*C] per-head values (flattened)
    alpha_src: jax.Array,  # [N, H]
    alpha_dst: jax.Array,  # [N, H]
    heads: int,
    negative_slope: float = 0.2,
) -> jax.Array:
    """Fused GAT attention-aggregate over the band; returns [N, H*C]."""
    n_tiles, _, tile, _ = bias_self.shape
    hc = z.shape[1]
    zp = _pad_windows(z, tile)
    ap = _pad_windows(alpha_src, tile)
    kernel = functools.partial(
        _gat_kernel, heads=heads, negative_slope=negative_slope
    )
    h = alpha_src.shape[1]
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 3, tile, tile), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, h), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, h), lambda i: (i + 2, 0), memory_space=pltpu.VMEM),
            # alpha_dst is unpadded: block i addresses the tile directly
            pl.BlockSpec((tile, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, hc), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, hc), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, hc), lambda i: (i + 2, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, hc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(z.shape, z.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * heads * tile * 3 * tile * (hc // heads),
            bytes_accessed=bias_self.size * 4 + 4 * z.size * 4,
            transcendentals=n_tiles * heads * tile * 3 * tile,
        ),
        interpret=_use_interpret(),
    )(bias_self, ap, ap, ap, alpha_dst, zp, zp, zp)


# ------------------------------------------------- Transformer attention
def _transformer_kernel(bias_ref, q_ref, kl_ref, km_ref, kr_ref,
                        vl_ref, vm_ref, vr_ref, o_ref, *, heads, scale):
    tile = q_ref.shape[0]
    c = q_ref.shape[1] // heads
    bias = bias_ref[0]
    outs = []
    for h in range(heads):
        q = q_ref[:, h * c:(h + 1) * c]
        logits = []
        for k, kref in enumerate((kl_ref, km_ref, kr_ref)):
            kk = kref[:, h * c:(h + 1) * c]
            l = jnp.dot(q, kk.T, preferred_element_type=jnp.float32) * scale
            logits.append(l + bias[k])
        full = jnp.concatenate(logits, axis=1)
        m = jnp.max(full, axis=1, keepdims=True)
        # guard all-masked rows (padding): shift by a finite max
        m = jnp.maximum(m, -1e30)
        e = jnp.exp(full - m)
        e = jnp.where(full <= -1e29, 0.0, e)
        denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
        p = e / denom
        acc = jnp.dot(p[:, :tile], vl_ref[:, h * c:(h + 1) * c],
                      preferred_element_type=jnp.float32)
        acc += jnp.dot(p[:, tile:2 * tile], vm_ref[:, h * c:(h + 1) * c],
                       preferred_element_type=jnp.float32)
        acc += jnp.dot(p[:, 2 * tile:], vr_ref[:, h * c:(h + 1) * c],
                       preferred_element_type=jnp.float32)
        outs.append(acc)
    o_ref[:] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def banded_transformer_fwd(
    bias_noself: jax.Array,
    q: jax.Array,   # [N, H*C]
    k: jax.Array,   # [N, H*C]
    v: jax.Array,   # [N, H*C]
    heads: int,
) -> jax.Array:
    """Fused scaled-dot-product neighbor attention over the band → [N, H*C]."""
    n_tiles, _, tile, _ = bias_noself.shape
    hc = q.shape[1]
    c = hc // heads
    kp = _pad_windows(k, tile)
    vp = _pad_windows(v, tile)
    kernel = functools.partial(
        _transformer_kernel, heads=heads, scale=1.0 / (c ** 0.5)
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 3, tile, tile), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, hc), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, hc), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, hc), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, hc), lambda i: (i + 2, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, hc), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, hc), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, hc), lambda i: (i + 2, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, hc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_tiles * heads * tile * 3 * tile * c,
            bytes_accessed=bias_noself.size * 4 + 6 * q.size * 4,
            transcendentals=n_tiles * heads * tile * 3 * tile,
        ),
        interpret=_use_interpret(),
    )(bias_noself, q, kp, kp, kp, vp, vp, vp)


# ----------------------------------- rolling-window GAT (single z read)
def _gat_roll_kernel(bias_ref, asrc_l, asrc_m, asrc_r, adst_ref, z_hbm,
                     o_ref, ring, sem, *, heads, negative_slope):
    """GAT attention with a persistent VMEM ring over z window tiles.

    TPU grid steps run sequentially on the core, so scratch persists: step i
    DMAs only the one new window tile (i+2 in padded coords) instead of
    streaming all three — 3× less HBM traffic on the [N, H*C] values, which
    dominates the fused kernel's bandwidth.
    """
    i = pl.program_id(0)
    tile = adst_ref.shape[0]

    def dma(padded_tile, slot):
        return pltpu.make_async_copy(
            z_hbm.at[pl.ds(padded_tile * tile, tile), :],
            ring.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        for k in range(3):
            dma(k, k).start()
        for k in range(3):
            dma(k, k).wait()

    @pl.when(i > 0)
    def _():
        slot = (i + 2) % 3
        dma(i + 2, slot).start()
        dma(i + 2, slot).wait()

    bias = bias_ref[0]
    c = ring.shape[2] // heads
    outs = []
    for h in range(heads):
        a_d = adst_ref[:, h][:, None]
        logits = []
        for k, asrc in enumerate((asrc_l, asrc_m, asrc_r)):
            a_s = asrc[:, h][None, :]
            l = a_d + a_s
            l = jnp.where(l >= 0, l, negative_slope * l)
            logits.append(l + bias[k])
        full = jnp.concatenate(logits, axis=1)
        m = jnp.max(full, axis=1, keepdims=True)
        e = jnp.exp(full - m)
        denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
        p = (e / denom).astype(ring.dtype)
        acc = None
        for k in range(3):
            slot = (i + k) % 3
            part = jnp.dot(
                p[:, k * tile:(k + 1) * tile],
                ring[slot][:, h * c:(h + 1) * c],
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        outs.append(acc)
    o_ref[:] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def banded_gat_fwd_rolling(
    bias_self: jax.Array,
    z: jax.Array,
    alpha_src: jax.Array,
    alpha_dst: jax.Array,
    heads: int,
    negative_slope: float = 0.2,
) -> jax.Array:
    n_tiles, _, tile, _ = bias_self.shape
    hc = z.shape[1]
    h = alpha_src.shape[1]
    zp = _pad_windows(z, tile)
    ap = _pad_windows(alpha_src, tile)
    kernel = functools.partial(
        _gat_roll_kernel, heads=heads, negative_slope=negative_slope
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 3, tile, tile), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, h), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, h), lambda i: (i + 2, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # zp stays in HBM
        ],
        out_specs=pl.BlockSpec((tile, hc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(z.shape, z.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, tile, hc), z.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * heads * tile * 3 * tile * (hc // heads),
            bytes_accessed=bias_self.size * bias_self.dtype.itemsize
            + 2 * z.size * z.dtype.itemsize,
            transcendentals=n_tiles * heads * tile * 3 * tile,
        ),
        interpret=_use_interpret(),
    )(bias_self, ap, ap, ap, alpha_dst, zp)


# ----------------------------------------------- differentiable wrappers
# The Pallas kernels are forward implementations; gradients route through
# jax.custom_vjp with the mathematically identical jnp reference (the band
# masks are constants of the static graph, so only the feature inputs carry
# cotangents).

def _gat_dispatch(bias_self, z, alpha_src, alpha_dst, heads, negative_slope):
    # The streaming variant reads the z window three times, but Mosaic's
    # automatic block pipelining overlaps those fetches with compute; measured
    # on v5e it beats the rolling-ring variant (banded_gat_fwd_rolling), whose
    # manual DMA serializes against the matmuls.  Keep streaming as default.
    return banded_gat_fwd(bias_self, z, alpha_src, alpha_dst, heads,
                          negative_slope)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def banded_gat(bias_self, z, alpha_src, alpha_dst, heads, negative_slope=0.2):
    return _gat_dispatch(bias_self, z, alpha_src, alpha_dst, heads,
                         negative_slope)


def _gat_vjp_fwd(bias_self, z, alpha_src, alpha_dst, heads, negative_slope):
    out = _gat_dispatch(bias_self, z, alpha_src, alpha_dst, heads,
                        negative_slope)
    return out, (bias_self, z, alpha_src, alpha_dst)


def _gat_vjp_bwd(heads, negative_slope, res, g):
    from .reference import banded_gat_ref

    bias_self, z, alpha_src, alpha_dst = res
    _, vjp = jax.vjp(
        lambda z_, s_, d_: banded_gat_ref(
            bias_self, z_, s_, d_, heads, negative_slope
        ),
        z, alpha_src, alpha_dst,
    )
    dz, ds, dd = vjp(g)
    return jnp.zeros_like(bias_self), dz, ds, dd


banded_gat.defvjp(_gat_vjp_fwd, _gat_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def banded_transformer(bias_noself, q, k, v, heads):
    return banded_transformer_fwd(bias_noself, q, k, v, heads)


def _tr_vjp_fwd(bias_noself, q, k, v, heads):
    out = banded_transformer_fwd(bias_noself, q, k, v, heads)
    return out, (bias_noself, q, k, v)


def _tr_vjp_bwd(heads, res, g):
    from .reference import banded_transformer_ref

    bias_noself, q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: banded_transformer_ref(bias_noself, q_, k_, v_, heads),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return jnp.zeros_like(bias_noself), dq, dk, dv


banded_transformer.defvjp(_tr_vjp_fwd, _tr_vjp_bwd)
