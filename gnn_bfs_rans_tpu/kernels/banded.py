"""Pallas TPU kernels: banded SpMM aggregation and fused banded attention.

These are the hot-op kernels of the framework (BASELINE.json north star:
"message passing becomes Pallas kernels").  After RCM reordering the graph is
band-limited: every sender of a tile of ``T`` consecutive destination nodes
lives in a window of ``W = 2·k0+1`` consecutive node tiles (W=3 for the BFS
mesh, bandwidth 58 ≪ 128; W=5 covers 3-D hex meshes with bandwidth ≤ 2·T —
see ``graph.band``), so

* **banded SpMM** (GCN/GIN aggregation):
  ``out[t] = Σ_k A[t,k] @ x[t−k0+k]`` — W dense 128×128 MXU matmuls per
  tile, no gather/scatter;
* **banded attention** (GAT / Graph-Transformer): per tile, per head —
  dense [T, Wcols] logits (additive for GAT, scaled-dot-product via MXU for
  Transformer) + additive −1e30 sparsity mask, numerically-stable softmax in
  VMEM, then [T, Wcols] @ [Wcols, C] weighted sum.  A flash-attention-style
  fused kernel: per-edge logits/weights never touch HBM.  The attention
  window is **half-tile granular** (Wcols = T + 2·ceil(pad/(T/2))·(T/2),
  pre-concatenated [n_tiles, T, Wcols] masks — see graph.band.Band): the
  [H·T, Wcols] softmax plane is the kernels' measured VPU bottleneck, and
  half-tile pads cut it 33% on bandwidth ≤ T/2 meshes like the BFS case.
  The Transformer variant optionally conditions logits and values on banded
  edge features (``graph.band.edge``) — the edge projection is factored so
  only D_e≈4 extra [T, Wcols] planes stream (see ``banded_transformer``).

Kernels process **G receiver tiles per grid step** (``_choose_group``): the
sliding sender window is expressed as G+W−1 *blocked* input specs over the
unpadded feature array with clamped index maps (``_clamped_window_specs``),
so Pallas pipelines the HBM→VMEM streaming automatically — no manual DMA,
no padded copy, and the window overlap is amortized ~W/((G+W−1)/G)× across
the group.

Backward passes route through ``jax.custom_vjp`` into the **fused Pallas
backward kernels** of :mod:`.banded_bwd` (flash-style: attention recomputed
in VMEM, sender-side gradients emitted as per-window partials and folded by
a cheap XLA shift-add), so the kernels are fast under ``jax.grad`` too.  The
band matrices are constants of the static graph and receive zero cotangents.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# Round-5 backward recompute-thinning toggles (see banded_bwd._gat_bwd_kernel;
# per-op device-trace A/B in artifacts/bwd_variants_ab.json, flagship shape,
# bf16 + dropout 0.1 + mean_expand).  Only the MXU column-sum offload pays:
# kernel 253.5 → 223.8 µs.  Reusing forward-saved (m, inv) measured +40 µs
# (the narrow stats stream + masked lane-extracts cost more than the two
# plane reductions they remove) and the flash-style delta-rs trick +37 µs
# (the extra per-head MXU output recompute serializes with the VPU chain
# instead of overlapping) — both kept as documented negative results.
BWD_USE_STATS = False   # NEGATIVE: fwd-saved (m, inv) — +40 µs, see above
BWD_DELTA_RS = False    # NEGATIVE: MXU delta-rs — +37 µs, see above
BWD_MXU_DAS = True      # dα_src column sums as one MXU contraction: −30 µs
BWD_FOLD_PROJECT = True  # fuse dz fold + projection backward (fuse_train)
TR_BWD_STACKED = True   # head-stacked transformer backward (geo/plain)
# carry-based direct-dz emission + in-kernel projection: the attention
# backward finalizes each sender sub-block one grid step late (small VMEM
# carry) and applies dx = dz·Wᵀ / dW += xᵀ·dz in VMEM — neither the window
# partials nor dz ever exist in HBM (supersedes BWD_FOLD_PROJECT when on).
# Pays only in the HBM-bound regime: at the 12k-cell flagship the combined
# kernel is latency-bound and measured +0.1 ms vs separate kernels, so the
# path engages above a size threshold (partials ≈ 2× dz of HBM round trip).
BWD_INKERNEL_PROJECT = True
INKERNEL_PROJECT_MIN_BYTES = 64 * 2 ** 20   # dz bytes; 1M-cell ≈ 1 GB ≫
# fuse_train forward saves its in-VMEM z as a residual instead of the
# backward re-projecting it (A/B'd on device)
FWD_EMIT_Z = True


def _prec(dtype):
    """Matmul precision by primal dtype: f32 inputs get exact (multi-pass)
    MXU matmuls — f32 is the accuracy/parity path; bf16 keeps the fast
    single-pass default.  Without this the default bf16-precision pass makes
    f32 kernel outputs drift ~5e-3 from a HIGHEST-precision evaluation."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _mm_cast(x, primal_dtype):
    """Cast an f32 softmax intermediate (probabilities / logit grads) to
    bf16 for the wide MXU matmuls when the primal path is bf16 — f32 MXU
    passes run ~4× slower, and the ≲0.4% cast noise on p∈[0,1] weights is
    below the bf16 training-noise floor already accepted for the stored
    window partials.  f32 primals (the parity path) are untouched."""
    return x.astype(primal_dtype) if primal_dtype == jnp.bfloat16 else x


def _clamped_window_specs(window: int, tile: int, feat: int, n_tiles: int,
                          group: int = 1, sub: int | None = None):
    """Sliding-window specs over the UNPADDED array, indices clamped.

    ``window`` counts blocks of ``sub`` rows (default ``sub = tile``: the
    classic full-tile window, span G+W−1).  Grid step ``i`` covers receiver
    tiles ``i·G … i·G+G−1``; window block k addresses sender block
    ``i·G·r + k − k0`` (r = tile/sub blocks per receiver tile) clamped into
    range.  Out-of-range blocks load a duplicate in-range block whose
    contributions the band mask (or a zero coefficient block) kills — this
    removes the pad copy of the feature array (an extra full read+write of
    HBM per call).
    """
    sub = tile if sub is None else sub
    r = tile // sub
    k0 = (window - r) // 2
    last = n_tiles * r - 1
    return [
        pl.BlockSpec(
            (sub, feat),
            lambda i, k=k: (jnp.clip(i * group * r + k - k0, 0, last), 0),
            memory_space=pltpu.VMEM,
        )
        for k in range(group * r + window - r)
    ]


# VMEM working-set budget for choosing the receiver-tile group size.  TPU
# scoped-vmem limit is 16 MiB (v5e); the estimate below undercounts Mosaic's
# f32 softmax scratch, so budget conservatively.
_GROUP_VMEM_BUDGET = 13 * 2 ** 20

# Process-wide cap on the receiver-tile group, lowered at runtime by
# kernels.fallback.GroupFallback when a Mosaic compile fails (the VMEM
# estimate is hand-tuned; this is the recovery valve).
_MAX_GROUP_CAP = 16


def set_max_group_cap(cap: int) -> None:
    """Lower (or reset) the process-wide group cap — see kernels.fallback."""
    global _MAX_GROUP_CAP
    _MAX_GROUP_CAP = int(cap)


def current_max_group_cap() -> int:
    return _MAX_GROUP_CAP


def _choose_group(n_tiles: int, window: int, tile: int, feat_bytes: int,
                  extra_out_bytes_per_tile: int = 0,
                  extra_in_bytes_per_tile: int = 0,
                  max_group: int = 16,
                  scratch_bytes_per_tile: int = 0,
                  sub: int | None = None) -> int:
    """Largest receiver-tile group G (∈ 16,8,4,2,1) that divides ``n_tiles``
    and keeps the double-buffered VMEM estimate under budget.

    Grouping amortizes the window overlap: per output tile the kernel
    streams ``(G+W−1)/G`` input tiles instead of ``W`` — on the BFS-mesh GAT
    forward (HC=1024) G=16 measures ~2.1× over G=1.

    ``feat_bytes`` = per-node bytes of the streamed feature rows (all window
    operands combined); ``extra_out_bytes_per_tile`` = per-receiver-node
    bytes of additional outputs (e.g. window partials in the backward);
    ``scratch_bytes_per_tile`` = per-receiver-tile in-kernel working set that
    Mosaic cannot stream (e.g. the f32 hi/lo operand decompositions of
    exact-precision matmuls — attention kernels pass this for f32 primals,
    whose HIGHEST-precision passes otherwise blow the 16 MiB scoped limit).

    The scratch estimate is hand-tuned and most uncertain exactly on those
    f32 HIGHEST paths, and a wrong pick fails at Mosaic compile time with no
    runtime fallback — so when scratch is in play, cap the group at 8 for an
    extra safety margin (f32 is the parity path, not the perf path).
    """
    if scratch_bytes_per_tile > 0:
        max_group = min(max_group, 8)
    max_group = min(max_group, _MAX_GROUP_CAP)
    sub = tile if sub is None else sub
    r = tile // sub
    for g in (16, 8, 4, 2, 1):
        if g > max_group or n_tiles % g:
            continue
        span = g * r + window - r               # window blocks of `sub` rows
        est = 2 * (
            span * sub * feat_bytes             # windowed feature streams
            + g * window * tile * sub           # int8 mask / coeff block
            + g * tile * feat_bytes             # main output
            + g * tile * extra_out_bytes_per_tile
            + g * tile * extra_in_bytes_per_tile
        ) + g * scratch_bytes_per_tile
        if est <= _GROUP_VMEM_BUDGET:
            return g
    return 1


# --------------------------------------------------------------------- SpMM
def _spmm_kernel(a_ref, *refs, window, group):
    span = group + window - 1
    xs, o_ref = refs[:span], refs[span]
    tile = xs[0].shape[0]
    prec = _prec(xs[0].dtype)
    # Mosaic rejects mixed-dtype operands on the HIGHEST-precision (f32
    # multi-pass) path ("Bad lhs type"): a bf16 coefficient tensor (the 0/1
    # ``adj`` — exact in bf16) against f32 features must upcast in VMEM.
    # The bf16 feature path keeps the raw coeff dtype (single-pass MXU
    # accepts the mix and the bf16 stream is the point of storing adj small).
    up = (jnp.float32 if xs[0].dtype == jnp.float32
          and a_ref.dtype != jnp.float32 else None)
    for g in range(group):
        a = a_ref[g] if up is None else a_ref[g].astype(up)
        acc = jnp.dot(a[0], xs[g][:], preferred_element_type=jnp.float32,
                      precision=prec)
        for k in range(1, window):
            acc += jnp.dot(a[k], xs[g + k][:],
                           preferred_element_type=jnp.float32, precision=prec)
        o_ref[g * tile:(g + 1) * tile] = acc.astype(o_ref.dtype)


def banded_spmm_fwd(band_coeff: jax.Array, x: jax.Array) -> jax.Array:
    """out = BandMatrix(band_coeff) @ x.

    band_coeff: [n_tiles, W, T, T]; x: [n_tiles*T, H] → out same shape as x.
    Out-of-range window blocks of boundary tiles are all-zero coefficient
    blocks, so the clamped window duplicates contribute nothing.
    """
    n_tiles, window, tile, _ = band_coeff.shape
    h = x.shape[1]
    cb = band_coeff.dtype.itemsize
    group = _choose_group(
        n_tiles, window, tile,
        feat_bytes=h * x.dtype.itemsize,
        extra_in_bytes_per_tile=window * tile * (cb - 1),  # coeff blocks > 1B
    )
    span = group + window - 1
    return pl.pallas_call(
        functools.partial(_spmm_kernel, window=window, group=group),
        grid=(n_tiles // group,),
        in_specs=[
            pl.BlockSpec((group, window, tile, tile), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *_clamped_window_specs(window, tile, h, n_tiles, group),
        ],
        out_specs=pl.BlockSpec((group * tile, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * window * tile * tile * h,
            bytes_accessed=band_coeff.size * cb + 2 * x.size * 4,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(band_coeff, *([x] * span))


@jax.custom_vjp
def banded_spmm(band_coeff: jax.Array, x: jax.Array) -> jax.Array:
    return banded_spmm_fwd(band_coeff, x)


def _spmm_vjp_fwd(band_coeff, x):
    return banded_spmm_fwd(band_coeff, x), band_coeff


def _spmm_vjp_bwd(band_coeff, g):
    # d/dx (A @ x) ᵀ-applied: Aᵀ @ g.  Our band matrices (GCN/GIN adjacency)
    # are symmetric, but transpose the band structure anyway for generality:
    # block (t, k) of Aᵀ = block (t−k0+k, W−1−k)ᵀ of A.
    at = _transpose_band(band_coeff)
    return None, banded_spmm_fwd(at, g)


def _transpose_band(band: jax.Array) -> jax.Array:
    n_tiles, window = band.shape[:2]
    k0 = window // 2
    # target[t, k] = source[t−k0+k, W−1−k]^T ; out-of-range source tiles → 0
    padded = jnp.pad(band, ((k0, k0), (0, 0), (0, 0), (0, 0)))
    idx = jnp.arange(n_tiles)
    blocks = []
    for k in range(window):
        src = padded[idx + k, window - 1 - k]   # [n_tiles, T, T]
        blocks.append(jnp.swapaxes(src, -1, -2))
    return jnp.stack(blocks, axis=1)


banded_spmm.defvjp(_spmm_vjp_fwd, _spmm_vjp_bwd)


def _dropout_thresh(rate: float):
    return jnp.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1))


def _hash_bits(shape, seed_val, draw: int):
    """Counter-based uint32 hash (xorshift-multiply finalizer) over the
    element index — the interpret-mode stand-in for the Mosaic PRNG, so the
    in-kernel dropout path (determinism, keep rate, backward mask replay) is
    testable on CPU.  A *different* stream than the TPU PRNG by design; both
    satisfy the same contract: bits are a pure function of (seed, draw
    index, element index), replayed identically by the backward kernels.
    """
    flat = jnp.zeros(shape, jnp.uint32)
    stride = 1
    for d in reversed(range(len(shape))):
        flat = flat + jax.lax.broadcasted_iota(
            jnp.uint32, shape, d) * jnp.uint32(stride)
        stride *= shape[d]
    x = flat ^ (jnp.asarray(seed_val).astype(jnp.uint32)
                * jnp.uint32(0x9E3779B9))
    x = x + jnp.uint32(draw) * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _prng_seed(seed_val):
    """Seed the Mosaic PRNG (no-op in interpret mode — the interpret stream
    is derived per-draw from the seed value by :func:`_hash_bits`)."""
    if not _use_interpret():
        pltpu.prng_seed(seed_val)


def _dropout_bits(shape, seed_val, draw: int = 0):
    """uint32 random bits for an attention-dropout mask.

    Compiled: one Mosaic PRNG draw (state advanced by preceding draws since
    the :func:`_prng_seed` call — callers draw in a fixed order the backward
    replays).  Interpret: stateless hash of (seed, draw, element index).
    """
    if _use_interpret():
        return _hash_bits(shape, seed_val, draw)
    return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)


def _attn_dropout(p, rate: float, inv_keep: float, seed_val, draw: int = 0):
    """Drop attention entries in-kernel; one draw per call — the backward
    kernels regenerate the identical mask by replaying the same
    seed/draw-call order."""
    bits = _dropout_bits(p.shape, seed_val, draw)
    return jnp.where(bits >= _dropout_thresh(rate), p * inv_keep, 0.0)


# ---------------------------------------------------------- GAT attention
def _gat_kernel(*refs, window, heads, negative_slope, group, sub,
                dropout_rate=0.0, mean_heads=False, fuse_proj=False,
                emit_stats=False, emit_z=False):
    """Grouped, head-stacked fused GAT step: G receiver tiles per grid step.

    Per receiver tile the softmax runs head-stacked — one [H·T, Wcols] chain
    (leaky-relu, max, exp, sum: the VPU-bound part) instead of H narrow
    per-head passes — followed by H MXU matmuls.  The window is half-tile
    granular (``window`` blocks of ``sub`` rows, Wcols = window·sub — see
    graph.band.Band): on bandwidth ≤ T/2 meshes the softmax plane is 256
    instead of 384 columns wide, a 33% cut of the kernel's measured VPU
    bottleneck.  Grouping G tiles per step amortizes the sliding-window
    overlap, and the int8 mask (dominant HBM stream at small HC) is
    materialized to the additive 0/−1e30 bias in VMEM.

    With dropout the PRNG is re-seeded **per receiver tile** (seed + global
    tile index) so the stream is independent of the group size — the
    backward kernel replays it bit-exactly even if it picks a different G.
    """
    i0 = 0
    if dropout_rate > 0:
        seed_ref = refs[0]
        i0 = 1
    mask_ref = refs[i0]                                     # [G, T, Wcols]
    tile = mask_ref.shape[1]
    r = tile // sub
    span = group * r + window - r
    w_ref = None
    if fuse_proj:
        w_ref = refs[i0 + 1]                                # [F, HC]
        i0 += 1
    # PACKED alphas ([:, :H]=src, [:, H:]=dst): span × [sub, 2H] windowed
    # blocks for the sender side + one direct [G·T, 2H] block for the
    # receiver side.  One packed array instead of split src/dst halves:
    # f32[N, H] tensors tile to T(8,128) (lanes padded H→128, 16-32×), so
    # the XLA split this interface avoids was ~3.1 ms/layer at 1M cells
    # (round-4 trace, fusion.452-455).  src slices at lane offset 0 (free);
    # dst pays one lane-offset slice per group iteration.
    aps = refs[i0 + 1:i0 + 1 + span]
    apd_ref = refs[i0 + 1 + span]                           # [G·T, 2H]
    i0 += span + 1
    # span × [sub, HC] value blocks — or [sub, F] node-feature blocks when
    # the projection is fused (z_j computed in VMEM below)
    zs = refs[i0 + 1:i0 + 1 + span]
    o_ref = refs[i0 + 1 + span]                             # [G·T, HC]
    # per-row softmax stats, packed [G·T, 2H] f32 (m | inv) like the alphas
    # — saved for the backward's recompute-thinning (see _gat_bwd_kernel)
    i1 = i0 + 2 + span
    stats_ref = None
    if emit_stats:
        stats_ref = refs[i1]
        i1 += 1
    # fuse_proj residual: the in-VMEM projected z of the step's OWNED
    # sender sub-blocks, written once — the backward then reads it instead
    # of re-projecting (one [N, HC] write vs a per-layer matmul fusion)
    z_ref = refs[i1] if emit_z else None
    if dropout_rate > 0:
        inv_keep = 1.0 / (1.0 - dropout_rate)
    if fuse_proj:
        # project each sender block ONCE per grid step (blocks are shared
        # across the group's windows): z_k = x_k @ W, MXU work that overlaps
        # the VPU softmax planes — the z array never exists in HBM
        dt = w_ref.dtype
        zs = [
            jnp.dot(zs[k][:], w_ref[:],
                    preferred_element_type=jnp.float32).astype(dt)
            for k in range(span)
        ]
        c = w_ref.shape[1] // heads
        if emit_z:
            r0 = tile // sub
            k0z = (window - r0) // 2
            z_ref[...] = jnp.concatenate(
                [zs[k0z + m] for m in range(group * r0)], axis=0)
    else:
        zs = [z[:] for z in zs]
        c = zs[0].shape[1] // heads
    ap_blocks = [a[:].astype(jnp.float32) for a in aps]
    for g in range(group):
        bias_cat = (mask_ref[g].astype(jnp.float32) - 1.0) * 1e30  # [T, Wc]
        # packed α used via COLUMN extracts only (src at lane h, dst at lane
        # heads+h) — no lane-offset slices, which Mosaic lowers as shifted
        # copies in the hot loop
        adst2 = apd_ref[g * tile:(g + 1) * tile].astype(jnp.float32)
        ap_cat = jnp.concatenate(
            [ap_blocks[g * r + k] for k in range(window)],
            axis=0)                                         # [Wcols, 2H]
        zcat = jnp.concatenate(
            [zs[g * r + k] for k in range(window)], axis=0)  # [Wcols, HC]
        # additive logits a_dst[i] + a_src[j], heads stacked along rows
        full = jnp.concatenate(
            [adst2[:, heads + h][:, None] + ap_cat[:, h][None, :]
             for h in range(heads)],
            axis=0,
        )                                                   # [H·T, WT]
        full = jnp.where(full >= 0, full, negative_slope * full)  # LeakyReLU
        full = full + jnp.concatenate([bias_cat] * heads, axis=0)
        # INVARIANT: every row must have ≥1 unmasked entry, or the softmax
        # runs over the −1e30 bias alone and aggregates the clamped duplicate
        # tiles.  build_band guarantees this: bias_self always sets the
        # diagonal self-loop, INCLUDING padding rows (cf. _transformer_kernel
        # which instead guards with m = max(m, −1e30) and e-zeroing).
        m = jnp.max(full, axis=1, keepdims=True)
        e = jnp.exp(full - m)
        denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
        # softmax normalization deferred into the matmul epilogue: scaling
        # the [T, C] outputs by 1/denom is H·W·T/C× fewer VPU divisions than
        # dividing the [H·T, W·T] probability plane (identical math — denom
        # is fixed before dropout, so the mask commutes with the scaling)
        inv = 1.0 / denom                                    # [H·T, 1]
        if emit_stats:
            stats_ref[g * tile:(g + 1) * tile] = jnp.concatenate(
                [m[h * tile:(h + 1) * tile] for h in range(heads)]
                + [inv[h * tile:(h + 1) * tile] for h in range(heads)],
                axis=1)
        if dropout_rate > 0:
            sv = seed_ref[0] + pl.program_id(0) * group + g
            _prng_seed(sv)
            e = _attn_dropout(e, dropout_rate, inv_keep, sv)
        prec = _prec(zs[0].dtype)
        e = _mm_cast(e, zs[0].dtype)
        if mean_heads:
            # concat=False epilogue fused in: Σ_h out_h / H → [T, C].  Doing
            # the head reduction here (accumulator add per MXU matmul) avoids
            # XLA's strided cross-lane reduce over the [N, H, C] reshape
            # (~195 µs/layer on the BFS mesh) and shrinks the output stream H×.
            acc = jnp.dot(e[:tile], zcat[:, :c],
                          preferred_element_type=jnp.float32,
                          precision=prec) * inv[:tile]
            for h in range(1, heads):
                acc += jnp.dot(e[h * tile:(h + 1) * tile],
                               zcat[:, h * c:(h + 1) * c],
                               preferred_element_type=jnp.float32,
                               precision=prec) * inv[h * tile:(h + 1) * tile]
            o_ref[g * tile:(g + 1) * tile] = (
                acc * (1.0 / heads)).astype(o_ref.dtype)
        else:
            outs = [
                jnp.dot(e[h * tile:(h + 1) * tile], zcat[:, h * c:(h + 1) * c],
                        preferred_element_type=jnp.float32, precision=prec)
                * inv[h * tile:(h + 1) * tile]
                for h in range(heads)
            ]
            o_ref[g * tile:(g + 1) * tile] = jnp.concatenate(
                outs, axis=1).astype(o_ref.dtype)


def _seed_inputs(dropout_rate: float, seed):
    """(extra leading inputs, extra leading specs) for in-kernel dropout."""
    if dropout_rate <= 0:
        return [], []
    if seed is None:
        raise ValueError("dropout_rate > 0 requires a seed array")
    return [seed], [pl.BlockSpec(memory_space=pltpu.SMEM)]


def banded_gat_fwd(
    bias_self: jax.Array,
    z: jax.Array,          # [N, H*C] per-head values (flattened)
    alphas: jax.Array,     # [N, 2H] PACKED ([:, :H]=src, [:, H:]=dst)
    heads: int,
    negative_slope: float = 0.2,
    dropout_rate: float = 0.0,
    seed: jax.Array | None = None,   # [1] int32 (required when rate > 0)
    mean_heads: bool = False,
    emit_stats: bool = False,
) -> jax.Array:
    """Fused GAT attention-aggregate over the band.

    Returns [N, H*C], or the head mean [N, C] when ``mean_heads`` (the
    reference's ``concat=False`` epilogue, fused — see kernel comment).
    ``alphas`` is packed src|dst: the kernel slices in VMEM, so the caller
    never splits the narrow array in HBM (see the packed-alpha note in
    ``_gat_kernel``).  With ``emit_stats`` returns ``(out, stats)`` where
    ``stats`` is the packed [N, 2H] f32 per-row softmax (m | inv) the
    fused backward reuses to skip its plane reductions.
    """
    n_tiles, tile, width = bias_self.shape
    sub = tile // 2
    w_sub = width // sub
    r = tile // sub
    hc = z.shape[1]
    h2 = alphas.shape[1]
    out_feat = hc // heads if mean_heads else hc
    group = _choose_group(
        n_tiles, w_sub, tile, sub=sub,
        feat_bytes=hc * z.dtype.itemsize + h2 * alphas.dtype.itemsize,
        extra_out_bytes_per_tile=(h2 * 4 if emit_stats else 0),
        scratch_bytes_per_tile=(
            2 * heads * tile * width * 4
            if z.dtype == jnp.float32 else 0),
    )
    span = group * r + w_sub - r
    kernel = functools.partial(
        _gat_kernel, window=w_sub, heads=heads,
        negative_slope=negative_slope, group=group, sub=sub,
        dropout_rate=dropout_rate, mean_heads=mean_heads,
        emit_stats=emit_stats,
    )
    seed_in, seed_specs = _seed_inputs(dropout_rate, seed)
    out_spec = pl.BlockSpec((group * tile, out_feat), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((z.shape[0], out_feat), z.dtype)
    if emit_stats:
        out_spec = (out_spec,
                    pl.BlockSpec((group * tile, h2), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((z.shape[0], h2), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(n_tiles // group,),
        in_specs=[
            *seed_specs,
            pl.BlockSpec((group, tile, width), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *_clamped_window_specs(w_sub, tile, h2, n_tiles, group, sub),
            # receiver-side packed alphas address the group tiles directly
            pl.BlockSpec((group * tile, h2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *_clamped_window_specs(w_sub, tile, hc, n_tiles, group, sub),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * heads * tile * width * (hc // heads),
            bytes_accessed=bias_self.size * bias_self.dtype.itemsize
            + (w_sub // r + 1) * z.size * 4,
            transcendentals=n_tiles * heads * tile * width,
        ),
        interpret=_use_interpret(),
    )(*seed_in, bias_self, *([alphas] * span), alphas, *([z] * span))


# ------------------------------------------------- Transformer attention
def _transformer_kernel(*refs, window, heads, scale, edge_dim, group, sub,
                        dropout_rate=0.0, mean_heads=False, geo=False,
                        fuse_proj=False):
    """Scaled-dot-product neighbor attention; optional edge conditioning.

    Grouped like ``_gat_kernel``: G receiver tiles per grid step share the
    sliding sender window (span G+W−1 k/v tiles).  With edge features the
    PyG TransformerConv semantics are
    ``logit = q·(k_j + e_ij)·scale`` and ``out = Σ p·(v_j + e_ij)`` where
    ``e_ij = W_e @ feat_ij``.  Both terms are factored so the kernel only
    streams the raw D_e-dim banded features:

    * logit edge term  ``q_i·e_ij = Σ_d (W_eᵀ q)_d[i] · feat_d[i,j]`` — the
      [T, H·D_e] tensor ``qw = q @ W_e`` is computed outside in XLA;
    * value edge term  ``Σ_j p_ij e_ij = (Σ_j p_ij feat_ij) @ W_e`` — the
      kernel emits ``s[i, h, d] = Σ_j p_ij feat_d[i,j]`` as a second output
      and XLA applies the tiny [D_e, C] matmul outside.

    With ``geo`` the D_e=4 features are known to be geometric
    ``[unit dir(3), dist]`` and factor one step further through the node
    positions: ``feat_d[i,j] = (pos_i[d] − pos_j[d])·invdist_ij`` for d<3.
    The kernel then streams only TWO banded planes (dist, 1/dist — half the
    generic path's HBM) plus [T, 4] position tiles, and reconstructs the
    direction terms with one [T,4]@[4,W·T] matmul per head:

        Σ_d qw_d·feat_d = (qself − qw@pos_winᵀ)⊙invd + qw_dist⊙dist,
        qself = Σ_d qw_d·pos_i[d]

    (the 4th position column is 0, so the full [T,4] qw row — whose last
    column is qw_dist — drops out of the matmul automatically).  The s
    output factors symmetrically: s_d = pos_i[d]·Σ_j p·invd − (p⊙invd)@pos.
    """
    i = 0
    if dropout_rate > 0:
        seed_ref = refs[i]; i += 1
    mask_ref = refs[i]; i += 1                   # [G, T, Wcols]
    tile = mask_ref.shape[1]
    r = tile // sub
    span = group * r + window - r
    k0 = (window - r) // 2
    k_all = v_all = None
    if fuse_proj:
        # no-grad path: q/k/v projected in VMEM from node features (see
        # banded_gat_mean_fused) — the [N, HC] q/k/v arrays never hit HBM.
        # PIPELINED variant (round-3): the span sender blocks concatenate
        # into ONE [span·sub, F] plane and each of k/v projects with a
        # single fat MXU matmul; per-group windows then become contiguous
        # SLICES of the projected plane (no per-group concatenates at all).
        # The round-2 variant ran span small [sub, F] matmuls per matrix
        # (~20 serialized per grid step) and measured slower than unfused.
        wq_ref, wk_ref, wv_ref = refs[i:i + 3]; i += 3   # [F, HC]
        bq_ref, bk_ref, bv_ref = refs[i:i + 3]; i += 3   # [1, HC]
        xq_ref = refs[i]; i += 1                         # [G·T, F] direct
        xs = refs[i:i + span]; i += span                 # span × [sub, F]
        dtp = wq_ref.dtype
        if geo:
            wblk_ref = refs[i]; i += 1                   # [HC, H*4]
        x_all = jnp.concatenate([xs[k][:] for k in range(span)], axis=0)
        k_all = (jnp.dot(x_all, wk_ref[:],
                         preferred_element_type=jnp.float32)
                 + bk_ref[0]).astype(dtp)                # [span·sub, HC]
        v_all = (jnp.dot(x_all, wv_ref[:],
                         preferred_element_type=jnp.float32)
                 + bv_ref[0]).astype(dtp)
        ks = vs = (k_all,)  # dtype carrier; windows slice k_all/v_all below
        q_ref = (jnp.dot(xq_ref[:], wq_ref[:],
                         preferred_element_type=jnp.float32)
                 + bq_ref[0]).astype(dtp)                # [G·T, HC]
        if geo:
            qw_ref = jnp.dot(_mm_cast(q_ref, dtp), wblk_ref[:],
                             preferred_element_type=jnp.float32)  # [G·T, H·4]
    else:
        q_ref = refs[i]; i += 1                  # [G·T, HC]
        ks = refs[i:i + span]; i += span         # span × [sub, HC]
        ks = [k_[:] for k_ in ks]
        vs = refs[i:i + span]; i += span
        vs = [v_[:] for v_ in vs]
    if geo:
        feat_ref = refs[i]; i += 1   # [G, 2, T, Wcols] (dist, 1/dist)
        if not fuse_proj:
            qw_ref = refs[i]; i += 1     # [G·T, H*4]
        poss = refs[i:i + span]; i += span       # span × [sub, 4]
        o_ref, s_ref = refs[i], refs[i + 1]
    elif edge_dim:
        feat_ref = refs[i]; i += 1   # [G, D_e, T, Wcols]
        qw_ref = refs[i]; i += 1     # [G·T, H*D_e]
        o_ref, s_ref = refs[i], refs[i + 1]
    else:
        o_ref = refs[i]
    if dropout_rate > 0:
        inv_keep = 1.0 / (1.0 - dropout_rate)
    c = q_ref.shape[1] // heads
    prec = _prec(ks[0].dtype)
    for g in range(group):
        # int8 0/1 mask → additive 0/−1e30 bias, once for all heads
        bias_cat = (mask_ref[g].astype(jnp.float32) - 1.0) * 1e30  # [T, Wc]
        # windowed k/v concatenated once per receiver tile: the per-head
        # logit and value matmuls then run at full [*, Wcols] contraction
        if fuse_proj:
            # contiguous slices of the once-projected plane (see above)
            kcat = k_all[g * r * sub:(g * r + window) * sub]
            vcat = v_all[g * r * sub:(g * r + window) * sub]
        else:
            kcat = jnp.concatenate(
                [ks[g * r + k] for k in range(window)], axis=0)  # [Wcols, HC]
            vcat = jnp.concatenate(
                [vs[g * r + k] for k in range(window)], axis=0)
        if geo:
            dist_cat = feat_ref[g, 0]                            # [T, Wcols]
            invd_cat = feat_ref[g, 1]
            pos_cat = jnp.concatenate(
                [poss[g * r + k][:].astype(jnp.float32)
                 for k in range(window)], axis=0)                # [Wcols, 4]
            pos_c = jnp.concatenate(
                [poss[g * r + k0 + j][:].astype(jnp.float32)
                 for j in range(r)], axis=0)                     # [T, 4]
        outs = []
        souts = []
        rows = slice(g * tile, (g + 1) * tile)
        if dropout_rate > 0:
            sv = seed_ref[0] + pl.program_id(0) * group + g
            _prng_seed(sv)
        for h in range(heads):
            q = q_ref[rows, h * c:(h + 1) * c]
            full = jnp.dot(q, kcat[:, h * c:(h + 1) * c].T,
                           preferred_element_type=jnp.float32,
                           precision=prec) * scale               # [T, Wcols]
            if edge_dim and not geo:
                for d in range(edge_dim):
                    qw_d = qw_ref[rows, h * edge_dim + d][:, None]  # [T, 1]
                    full += (qw_d * scale) * feat_ref[g, d]
            full = full + bias_cat
            if geo:
                qd = qw_ref[rows, h * 4:(h + 1) * 4].astype(
                    jnp.float32) * scale                         # [T, 4]
                qself = jnp.sum(qd * pos_c, axis=1, keepdims=True)
                qpos = jnp.dot(qd, pos_cat.T,
                               preferred_element_type=jnp.float32,
                               precision=prec)                   # [T, WT]
                full = full + (qself - qpos) * invd_cat \
                    + qd[:, 3:4] * dist_cat
            m = jnp.max(full, axis=1, keepdims=True)
            # guard all-masked rows (padding): shift by a finite max
            m = jnp.maximum(m, -1e30)
            e = jnp.exp(full - m)
            e = jnp.where(full <= -1e29, 0.0, e)
            denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
            # normalization deferred into the matmul epilogue (see _gat_kernel)
            inv = 1.0 / denom                                # [T, 1]
            if dropout_rate > 0:
                e = _attn_dropout(e, dropout_rate, inv_keep, sv, draw=h)
            acc = jnp.dot(_mm_cast(e, vs[0].dtype), vcat[:, h * c:(h + 1) * c],
                          preferred_element_type=jnp.float32, precision=prec)
            outs.append(acc * inv)
            if geo:
                ew = e * invd_cat
                t13 = jnp.dot(ew, pos_cat,
                              preferred_element_type=jnp.float32,
                              precision=prec)                    # [T, 4]
                t0 = jnp.sum(ew, axis=1, keepdims=True)
                s3 = jnp.sum(e * dist_cat, axis=1, keepdims=True)
                souts.append(jnp.concatenate(
                    [(pos_c * t0 - t13)[:, :3], s3], axis=1) * inv)
            elif edge_dim:
                ss = [
                    jnp.sum(e * feat_ref[g, d], axis=1, keepdims=True) * inv
                    for d in range(edge_dim)
                ]
                souts.append(jnp.concatenate(ss, axis=1))  # [T, D_e]
        if mean_heads:
            # fused concat=False epilogue: Σ_h out_h / H (see _gat_kernel)
            acc = outs[0]
            for h in range(1, heads):
                acc += outs[h]
            o_ref[rows] = (acc * (1.0 / heads)).astype(o_ref.dtype)
        else:
            o_ref[rows] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)
        if edge_dim:
            s_ref[rows] = jnp.concatenate(souts, axis=1).astype(s_ref.dtype)


def banded_transformer_fwd(
    bias_noself: jax.Array,
    q: jax.Array,   # [N, H*C]
    k: jax.Array,   # [N, H*C]
    v: jax.Array,   # [N, H*C]
    heads: int,
    edge_band: jax.Array | None = None,   # [n_tiles, W, D_e, T, T]
    qw: jax.Array | None = None,          # [N, H*D_e] = per-head q @ W_e^T
    dropout_rate: float = 0.0,
    seed: jax.Array | None = None,
    mean_heads: bool = False,
    geo_band: jax.Array | None = None,    # [n_tiles, W, 2, T, T] (dist, 1/d)
    pos: jax.Array | None = None,         # [N, 4] node coords (xyz, 0)
):
    """Fused scaled-dot-product neighbor attention over the band.

    Returns [N, H*C] ([N, C] head mean when ``mean_heads``); with edge
    conditioning returns a second array ``s`` [N, H*D_e] of
    attention-weighted edge features (see kernel doc).  ``geo_band``+``pos``
    select the factorized geometric path (identical math for
    ``[unit dir, dist]`` features at half the plane traffic).
    """
    n_tiles, tile, width = bias_noself.shape
    sub = tile // 2
    w_sub = width // sub
    r = tile // sub
    hc = q.shape[1]
    c = hc // heads
    out_feat = c if mean_heads else hc
    geo = geo_band is not None
    edge_dim = 4 if geo else (
        edge_band.shape[1] if edge_band is not None else 0)
    n_planes = 2 if geo else edge_dim
    group = _choose_group(
        n_tiles, w_sub, tile, sub=sub,
        feat_bytes=(2 * hc * q.dtype.itemsize       # windowed k and v streams
                    + (4 * 4 if geo else 0)),       # windowed [sub, 4] pos
        extra_in_bytes_per_tile=(
            hc * q.dtype.itemsize               # direct q tile
            + n_planes * width * 4              # f32 edge/geo planes
        ),
        extra_out_bytes_per_tile=heads * edge_dim * 4,
        # f32 scratch: the per-head logits plane decompositions PLUS the
        # per-receiver-tile kcat/vcat window concatenations ([width, HC]
        # each) — Mosaic allocates them per unrolled group iteration, and an
        # undercount fails at compile time with no fallback (ADVICE r1)
        scratch_bytes_per_tile=(
            (2 * heads * tile * width + 2 * width * hc) * 4
            if q.dtype == jnp.float32 else 0),
    )
    span = group * r + w_sub - r
    extra = []
    extra_specs = []
    if geo:
        extra = [geo_band, qw, *([pos] * span)]
        extra_specs = [
            pl.BlockSpec((group, 2, tile, width),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group * tile, heads * 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *_clamped_window_specs(w_sub, tile, 4, n_tiles, group, sub),
        ]
    elif edge_dim:
        extra = [edge_band, qw]
        extra_specs = [
            pl.BlockSpec((group, edge_dim, tile, width),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group * tile, heads * edge_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
    kernel = functools.partial(
        _transformer_kernel, window=w_sub, heads=heads,
        scale=1.0 / (c ** 0.5), edge_dim=edge_dim, group=group, sub=sub,
        dropout_rate=dropout_rate, mean_heads=mean_heads, geo=geo,
    )
    seed_in, seed_specs = _seed_inputs(dropout_rate, seed)
    out_shape = jax.ShapeDtypeStruct((q.shape[0], out_feat), q.dtype)
    out_spec = pl.BlockSpec((group * tile, out_feat), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    if edge_dim:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((q.shape[0], heads * edge_dim),
                                          jnp.float32))
        out_spec = (out_spec,
                    pl.BlockSpec((group * tile, heads * edge_dim),
                                 lambda i: (i, 0), memory_space=pltpu.VMEM))
    if geo:
        edge_bytes = geo_band.size * geo_band.dtype.itemsize
    elif edge_dim:
        edge_bytes = edge_band.size * edge_band.dtype.itemsize
    else:
        edge_bytes = 0
    return pl.pallas_call(
        kernel,
        grid=(n_tiles // group,),
        in_specs=[
            *seed_specs,
            pl.BlockSpec((group, tile, width), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * tile, hc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *_clamped_window_specs(w_sub, tile, hc, n_tiles, group, sub),
            *_clamped_window_specs(w_sub, tile, hc, n_tiles, group, sub),
            *extra_specs,
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * n_tiles * heads * tile * width * c,
            bytes_accessed=bias_noself.size * bias_noself.dtype.itemsize
            + 2 * (w_sub // r + 1) * q.size * 4 + edge_bytes,
            transcendentals=n_tiles * heads * tile * width,
        ),
        interpret=_use_interpret(),
    )(*seed_in, bias_noself, q, *([k] * span), *([v] * span), *extra)


def _zero_cot(x):
    """Zero cotangent for a band constant (float0 for the int8 masks)."""
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, jax.dtypes.float0)


# ----------------------------------------------- differentiable wrappers
# The Pallas kernels are forward implementations; gradients route through
# jax.custom_vjp with the mathematically identical jnp reference (the band
# masks are constants of the static graph, so only the feature inputs carry
# cotangents).

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def banded_gat_packed(bias_self, z, alphas, heads, negative_slope=0.2,
                      dropout_rate=0.0, seed=None):
    """Differentiable fused GAT with PACKED alphas [N, 2H] (src|dst)."""
    return banded_gat_fwd(bias_self, z, alphas, heads,
                          negative_slope, dropout_rate, seed)


def _gat_vjp_fwd(bias_self, z, alphas, heads, negative_slope,
                 dropout_rate, seed):
    if BWD_USE_STATS:
        out, stats = banded_gat_fwd(bias_self, z, alphas, heads,
                                    negative_slope, dropout_rate, seed,
                                    emit_stats=True)
    else:
        out = banded_gat_fwd(bias_self, z, alphas, heads,
                             negative_slope, dropout_rate, seed)
        stats = None
    return out, (bias_self, z, alphas, seed, stats)


def _gat_vjp_bwd(heads, negative_slope, dropout_rate, res, g):
    from .banded_bwd import banded_gat_bwd

    bias_self, z, alphas, seed, stats = res
    dz, da = banded_gat_bwd(
        bias_self, z, alphas, g, heads, negative_slope,
        dropout_rate=dropout_rate, seed=seed,
        stats=stats, delta_rs=BWD_DELTA_RS, mxu_das=BWD_MXU_DAS,
    )
    dseed = None if seed is None else np.zeros(seed.shape, jax.dtypes.float0)
    return _zero_cot(bias_self), dz, da, dseed


banded_gat_packed.defvjp(_gat_vjp_fwd, _gat_vjp_bwd)


def banded_gat(bias_self, z, alpha_src, alpha_dst, heads, negative_slope=0.2,
               dropout_rate=0.0, seed=None):
    """Split-alpha convenience wrapper over :func:`banded_gat_packed`.

    Kept for tests/tools; the model path calls the packed API directly so
    no narrow split/concat ever materializes in HBM.
    """
    alphas = jnp.concatenate([alpha_src, alpha_dst], axis=1)
    return banded_gat_packed(bias_self, z, alphas, heads, negative_slope,
                             dropout_rate, seed)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def banded_gat_mean_packed(bias_self, z, alphas, heads,
                           negative_slope=0.2, dropout_rate=0.0, seed=None):
    """``banded_gat_packed`` with the head mean fused → [N, C].

    The ``concat=False`` GAT epilogue (``gnn_model.py:77-80`` semantics:
    heads averaged).  Backward expands the [N, C] cotangent to the per-head
    layout (each head receives g/H) and reuses the fused GAT backward.
    """
    return banded_gat_fwd(bias_self, z, alphas, heads,
                          negative_slope, dropout_rate, seed, mean_heads=True)


def _gatm_vjp_fwd(bias_self, z, alphas, heads, negative_slope,
                  dropout_rate, seed):
    if BWD_USE_STATS:
        out, stats = banded_gat_fwd(bias_self, z, alphas, heads,
                                    negative_slope, dropout_rate, seed,
                                    mean_heads=True, emit_stats=True)
    else:
        out = banded_gat_fwd(bias_self, z, alphas, heads, negative_slope,
                             dropout_rate, seed, mean_heads=True)
        stats = None
    return out, (bias_self, z, alphas, seed, stats)


def _gatm_vjp_bwd(heads, negative_slope, dropout_rate, res, g):
    from .banded_bwd import banded_gat_bwd

    bias_self, z, alphas, seed, stats = res
    # the per-head g/H expansion happens inside the backward kernel
    # (mean_expand) — the tiled [N, H·C] cotangent never touches HBM
    dz, da = banded_gat_bwd(
        bias_self, z, alphas, g.astype(z.dtype), heads,
        negative_slope, dropout_rate=dropout_rate, seed=seed,
        mean_expand=True,
        stats=stats, delta_rs=BWD_DELTA_RS, mxu_das=BWD_MXU_DAS,
    )
    dseed = None if seed is None else np.zeros(seed.shape, jax.dtypes.float0)
    return _zero_cot(bias_self), dz, da, dseed


banded_gat_mean_packed.defvjp(_gatm_vjp_fwd, _gatm_vjp_bwd)


def banded_gat_mean(bias_self, z, alpha_src, alpha_dst, heads,
                    negative_slope=0.2, dropout_rate=0.0, seed=None):
    """Split-alpha convenience wrapper over :func:`banded_gat_mean_packed`."""
    alphas = jnp.concatenate([alpha_src, alpha_dst], axis=1)
    return banded_gat_mean_packed(bias_self, z, alphas, heads,
                                  negative_slope, dropout_rate, seed)


def banded_gat_mean_fused_fwd(bias_self, w, alphas, x, heads,
                              negative_slope=0.2, dropout_rate=0.0,
                              seed=None, emit_stats=False, emit_z=False):
    """``banded_gat_mean`` with the z-projection fused into the kernel.

    ``w`` is the GAT linear kernel [F, H·C]; sender blocks project to
    z = x·W inside VMEM (once per grid step, shared across the group), so
    the [N, H·C] z array never exists in HBM — removing its write+read
    round trip and the separate projection dispatch from the forward.
    ``alphas`` is the PACKED [N, 2H] attention array (= x·(W·amat), one
    matmul, never split in HBM).  Computing α in-kernel too was measured
    and REJECTED: the per-block narrow matmuls serialized into the DMA
    pipeline (+2 ms/layer at 1M cells, +10% flagship forward) — more than
    the narrow write they saved.  Supports in-kernel attention dropout
    (training path); gradients route through :func:`banded_gat_mean_fused`'s
    custom VJP, which RE-projects z in the backward instead of storing it.
    """
    n_tiles, tile, width = bias_self.shape
    sub = tile // 2
    w_sub = width // sub
    r = tile // sub
    f, hc = w.shape
    h2 = alphas.shape[1]
    group = _choose_group(
        n_tiles, w_sub, tile, sub=sub,
        feat_bytes=f * x.dtype.itemsize + h2 * alphas.dtype.itemsize,
        # per-grid-step projected z blocks live in VMEM: span × [sub, HC]
        extra_in_bytes_per_tile=2 * hc * x.dtype.itemsize + 2 * f * 2,
        extra_out_bytes_per_tile=(h2 * 4 if emit_stats else 0),
        scratch_bytes_per_tile=(
            2 * heads * tile * width * 4 + width * hc * 4
            if x.dtype == jnp.float32 else 0),
    )
    span = group * r + w_sub - r
    kernel = functools.partial(
        _gat_kernel, window=w_sub, heads=heads,
        negative_slope=negative_slope, group=group, sub=sub,
        dropout_rate=dropout_rate, mean_heads=True, fuse_proj=True,
        emit_stats=emit_stats, emit_z=emit_z,
    )
    seed_in, seed_specs = _seed_inputs(dropout_rate, seed)
    out_spec = [pl.BlockSpec((group * tile, hc // heads), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((x.shape[0], hc // heads), x.dtype)]
    if emit_stats:
        out_spec.append(pl.BlockSpec((group * tile, h2), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((x.shape[0], h2), jnp.float32))
    if emit_z:
        out_spec.append(pl.BlockSpec((group * tile, hc), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((x.shape[0], hc), x.dtype))
    if len(out_spec) == 1:
        out_spec, out_shape = out_spec[0], out_shape[0]
    else:
        out_spec, out_shape = tuple(out_spec), tuple(out_shape)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles // group,),
        in_specs=[
            *seed_specs,
            pl.BlockSpec((group, tile, width), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, hc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            *_clamped_window_specs(w_sub, tile, h2, n_tiles, group, sub),
            pl.BlockSpec((group * tile, h2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *_clamped_window_specs(w_sub, tile, f, n_tiles, group, sub),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * tile * (width * (hc // heads) * heads
                                        + 2 * f * hc),
            bytes_accessed=bias_self.size + x.size * x.dtype.itemsize * 2,
            transcendentals=n_tiles * heads * tile * width,
        ),
        interpret=_use_interpret(),
    )(*seed_in, bias_self, w, *([alphas] * span), alphas, *([x] * span))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def banded_gat_mean_fused(bias_self, w, alphas, x, heads,
                          negative_slope=0.2, dropout_rate=0.0, seed=None):
    """Differentiable fused-projection GAT (head-mean epilogue).

    Forward: :func:`banded_gat_mean_fused_fwd` (z projected in VMEM, packed
    α loaded — never split).
    Backward: z is RE-projected with the numerically identical matmul (f32
    accumulate, cast to the primal dtype) and fed to the packed-α fused GAT
    backward kernel; dx/dw are the two projection matmuls and dα returns
    packed.  Net effect vs the unfused path: the forward saves z's HBM
    write+read, the backward pays one extra [N, F] @ [F, H·C] projection
    (ROADMAP r2 item 3 — the measured A/B decides which path the flagship
    config uses).
    """
    return banded_gat_mean_fused_fwd(
        bias_self, w, alphas, x, heads, negative_slope, dropout_rate, seed,
    )


def _gatmf_vjp_fwd(bias_self, w, alphas, x, heads,
                   negative_slope, dropout_rate, seed):
    z = None
    if BWD_USE_STATS:
        out, stats = banded_gat_mean_fused_fwd(
            bias_self, w, alphas, x, heads, negative_slope, dropout_rate,
            seed, emit_stats=True,
        )
    elif FWD_EMIT_Z:
        # the kernel saves its in-VMEM z of the owned sub-blocks as a
        # residual: one extra [N, HC] write instead of the backward's
        # per-layer re-projection matmul fusion
        out, z = banded_gat_mean_fused_fwd(
            bias_self, w, alphas, x, heads, negative_slope, dropout_rate,
            seed, emit_z=True,
        )
        stats = None
    else:
        out = banded_gat_mean_fused_fwd(
            bias_self, w, alphas, x, heads, negative_slope, dropout_rate,
            seed,
        )
        stats = None
    return out, (bias_self, w, alphas, x, seed, stats, z)


def _gatmf_vjp_bwd(heads, negative_slope, dropout_rate, res, g):
    from .banded_bwd import banded_gat_bwd, fold_project_bwd

    bias_self, w, alphas, x, seed, stats, z = res
    if z is None:
        # re-project exactly as the in-kernel projection does (f32
        # accumulate → primal dtype) so the attention recompute in the
        # backward kernel sees bit-identical z
        z = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(w.dtype)
    tile = bias_self.shape[1]
    if (BWD_INKERNEL_PROJECT and w.shape[1] >= 128
            and z.size * z.dtype.itemsize >= INKERNEL_PROJECT_MIN_BYTES):
        # carry-based direct-dz + in-kernel projection: dz is finalized and
        # projected inside the backward kernel (see banded_gat_bwd)
        dx, dw, da = banded_gat_bwd(
            bias_self, z, alphas, g.astype(z.dtype), heads,
            negative_slope, dropout_rate=dropout_rate, seed=seed,
            mean_expand=True,
            stats=stats, delta_rs=BWD_DELTA_RS, mxu_das=BWD_MXU_DAS,
            project_x=x, project_w=w,
        )
        dseed = (None if seed is None
                 else np.zeros(seed.shape, jax.dtypes.float0))
        return (_zero_cot(bias_self), dw.astype(w.dtype), da,
                dx.astype(x.dtype), dseed)
    fuse_fold = BWD_FOLD_PROJECT and w.shape[1] >= 128
    dz, da = banded_gat_bwd(
        bias_self, z, alphas, g.astype(z.dtype), heads,
        negative_slope, dropout_rate=dropout_rate, seed=seed,
        mean_expand=True,
        stats=stats, delta_rs=BWD_DELTA_RS, mxu_das=BWD_MXU_DAS,
        raw_dz_partials=fuse_fold,
    )
    if fuse_fold:
        # dz window partials fold in VMEM and feed dx/dW directly — the
        # [N, H·C] dz array never exists in HBM (see fold_project_bwd)
        dx, dw = fold_project_bwd(dz, x, w, tile)
        dx = dx.astype(x.dtype)
        dw = dw.astype(w.dtype)
    else:
        dx = jnp.dot(dz, w.T,
                     preferred_element_type=jnp.float32).astype(x.dtype)
        dw = jnp.dot(x.T, dz,
                     preferred_element_type=jnp.float32).astype(w.dtype)
    dseed = None if seed is None else np.zeros(seed.shape, jax.dtypes.float0)
    return _zero_cot(bias_self), dw, da, dx, dseed


banded_gat_mean_fused.defvjp(_gatmf_vjp_fwd, _gatmf_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def banded_gat_mean_fused_wa(bias_self, w, wa, x, heads,
                             negative_slope=0.2, dropout_rate=0.0,
                             seed=None):
    """``banded_gat_mean_fused`` with the α matmul INSIDE the vjp boundary.

    ``wa = (W·amat)`` is the [F, 2H] packed α factor; α = x·wa is computed
    in XLA here so the op's cotangents are (dW, dWa, dx) — no [N, 2H]
    narrow cotangent crosses the boundary.  On the large-shape project
    path the backward folds the α gradients in-kernel (lane-major [8, ·]
    layouts), so the physically lane-padded dα streams (≈1.5 GB/layer at
    1M cells: das partials 1.02 GB + dad 0.5 GB) never exist in HBM.
    """
    alphas = jnp.dot(x, wa, preferred_element_type=jnp.float32)
    return banded_gat_mean_fused_fwd(
        bias_self, w, alphas, x, heads, negative_slope, dropout_rate, seed,
    )


def _gatmfwa_vjp_fwd(bias_self, w, wa, x, heads, negative_slope,
                     dropout_rate, seed):
    alphas = jnp.dot(x, wa, preferred_element_type=jnp.float32)
    z = None
    if FWD_EMIT_Z:
        out, z = banded_gat_mean_fused_fwd(
            bias_self, w, alphas, x, heads, negative_slope, dropout_rate,
            seed, emit_z=True,
        )
    else:
        out = banded_gat_mean_fused_fwd(
            bias_self, w, alphas, x, heads, negative_slope, dropout_rate,
            seed,
        )
    return out, (bias_self, w, wa, alphas, x, seed, z)


def _gatmfwa_vjp_bwd(heads, negative_slope, dropout_rate, res, g):
    from .banded_bwd import banded_gat_bwd, fold_project_bwd

    bias_self, w, wa, alphas, x, seed, z = res
    if z is None:
        z = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(w.dtype)
    tile = bias_self.shape[1]
    dseed = None if seed is None else np.zeros(seed.shape, jax.dtypes.float0)
    if (BWD_INKERNEL_PROJECT and w.shape[1] >= 128 and heads <= 8
            and z.size * z.dtype.itemsize >= INKERNEL_PROJECT_MIN_BYTES):
        # everything in-kernel: dz, dα and both projections
        dx, dw, dwa = banded_gat_bwd(
            bias_self, z, alphas, g.astype(z.dtype), heads,
            negative_slope, dropout_rate=dropout_rate, seed=seed,
            mean_expand=True, mxu_das=BWD_MXU_DAS,
            project_x=x, project_w=w, alpha_wa=wa,
        )
        return (_zero_cot(bias_self), dw.astype(w.dtype), dwa,
                dx.astype(x.dtype), dseed)
    # small-shape path: fused fold+projection for dz, XLA for the narrow α
    fuse_fold = BWD_FOLD_PROJECT and w.shape[1] >= 128
    dz, da = banded_gat_bwd(
        bias_self, z, alphas, g.astype(z.dtype), heads,
        negative_slope, dropout_rate=dropout_rate, seed=seed,
        mean_expand=True, mxu_das=BWD_MXU_DAS,
        raw_dz_partials=fuse_fold,
    )
    if fuse_fold:
        dx, dw = fold_project_bwd(dz, x, w, tile)
        dx = dx.astype(x.dtype)
        dw = dw.astype(w.dtype)
    else:
        dx = jnp.dot(dz, w.T,
                     preferred_element_type=jnp.float32).astype(x.dtype)
        dw = jnp.dot(x.T, dz,
                     preferred_element_type=jnp.float32).astype(w.dtype)
    dwa = jnp.dot(x.T, da,
                  preferred_element_type=jnp.float32).astype(wa.dtype)
    dx = dx + jnp.dot(da.astype(x.dtype), wa.T,
                      preferred_element_type=jnp.float32).astype(x.dtype)
    return (_zero_cot(bias_self), dw, dwa, dx, dseed)


banded_gat_mean_fused_wa.defvjp(_gatmfwa_vjp_fwd, _gatmfwa_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def banded_transformer(bias_noself, q, k, v, heads, dropout_rate=0.0,
                       seed=None):
    return banded_transformer_fwd(bias_noself, q, k, v, heads,
                                  dropout_rate=dropout_rate, seed=seed)


def _tr_vjp_fwd(bias_noself, q, k, v, heads, dropout_rate, seed):
    out = banded_transformer_fwd(bias_noself, q, k, v, heads,
                                 dropout_rate=dropout_rate, seed=seed)
    return out, (bias_noself, q, k, v, seed)


def _tr_vjp_bwd(heads, dropout_rate, res, g):
    from .banded_bwd import banded_transformer_bwd

    bias_noself, q, k, v, seed = res
    dq, dk, dv = banded_transformer_bwd(
        bias_noself, q, k, v, g, heads,
        dropout_rate=dropout_rate, seed=seed,
    )
    dseed = None if seed is None else np.zeros(seed.shape, jax.dtypes.float0)
    return _zero_cot(bias_noself), dq, dk, dv, dseed


banded_transformer.defvjp(_tr_vjp_fwd, _tr_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def banded_transformer_mean(bias_noself, q, k, v, heads, dropout_rate=0.0,
                            seed=None):
    """``banded_transformer`` with the head mean fused → [N, C]."""
    return banded_transformer_fwd(bias_noself, q, k, v, heads,
                                  dropout_rate=dropout_rate, seed=seed,
                                  mean_heads=True)


def _trm_vjp_fwd(bias_noself, q, k, v, heads, dropout_rate, seed):
    out = banded_transformer_fwd(bias_noself, q, k, v, heads,
                                 dropout_rate=dropout_rate, seed=seed,
                                 mean_heads=True)
    return out, (bias_noself, q, k, v, seed)


def _trm_vjp_bwd(heads, dropout_rate, res, g):
    from .banded_bwd import banded_transformer_bwd

    bias_noself, q, k, v, seed = res
    dq, dk, dv = banded_transformer_bwd(
        bias_noself, q, k, v, g.astype(q.dtype), heads,
        dropout_rate=dropout_rate, seed=seed, mean_expand=True,
    )
    dseed = None if seed is None else np.zeros(seed.shape, jax.dtypes.float0)
    return _zero_cot(bias_noself), dq, dk, dv, dseed


banded_transformer_mean.defvjp(_trm_vjp_fwd, _trm_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def banded_transformer_edge(bias_noself, edge_band, q, k, v, qw, heads,
                            dropout_rate=0.0, seed=None):
    """Edge-conditioned banded transformer attention → (out [N,H*C], s [N,H*D_e]).

    ``qw = per-head q @ W_e`` carries the logit edge term; ``s`` is the
    attention-weighted raw edge feature sum, to be projected by W_e outside
    (out_total = out + einsum('nhd,dhc->nhc', s, W_e)).  First-class edge
    conditioning the reference computed but never used (SURVEY.md §2 quirk 3).
    """
    return banded_transformer_fwd(bias_noself, q, k, v, heads,
                                  edge_band=edge_band, qw=qw,
                                  dropout_rate=dropout_rate, seed=seed)


def _tre_vjp_fwd(bias_noself, edge_band, q, k, v, qw, heads, dropout_rate,
                 seed):
    out = banded_transformer_fwd(bias_noself, q, k, v, heads,
                                 edge_band=edge_band, qw=qw,
                                 dropout_rate=dropout_rate, seed=seed)
    return out, (bias_noself, edge_band, q, k, v, qw, seed)


def _tre_vjp_bwd(heads, dropout_rate, res, g):
    from .banded_bwd import banded_transformer_bwd

    bias_noself, edge_band, q, k, v, qw, seed = res
    g_out, g_s = g  # cotangents of (out, s)
    dq, dk, dv, dqw = banded_transformer_bwd(
        bias_noself, q, k, v, g_out, heads,
        edge_band=edge_band, qw=qw, gs=g_s,
        dropout_rate=dropout_rate, seed=seed,
    )
    dseed = None if seed is None else np.zeros(seed.shape, jax.dtypes.float0)
    return (_zero_cot(bias_noself), jnp.zeros_like(edge_band),
            dq, dk, dv, dqw, dseed)


banded_transformer_edge.defvjp(_tre_vjp_fwd, _tre_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def banded_transformer_edge_mean(bias_noself, edge_band, q, k, v, qw, heads,
                                 dropout_rate=0.0, seed=None):
    """Edge-conditioned banded transformer with the head mean fused.

    → (out_mean [N, C], s [N, H*D_e]).  ``s`` stays per-head: its W_e
    projection + head mean collapse to one [N, H·D_e] @ [H·D_e, C] matmul
    outside (see ``TransformerConv``), so no strided reduce remains.
    """
    return banded_transformer_fwd(bias_noself, q, k, v, heads,
                                  edge_band=edge_band, qw=qw,
                                  dropout_rate=dropout_rate, seed=seed,
                                  mean_heads=True)


def _trem_vjp_fwd(bias_noself, edge_band, q, k, v, qw, heads, dropout_rate,
                  seed):
    out = banded_transformer_fwd(bias_noself, q, k, v, heads,
                                 edge_band=edge_band, qw=qw,
                                 dropout_rate=dropout_rate, seed=seed,
                                 mean_heads=True)
    return out, (bias_noself, edge_band, q, k, v, qw, seed)


def _trem_vjp_bwd(heads, dropout_rate, res, g):
    from .banded_bwd import banded_transformer_bwd

    bias_noself, edge_band, q, k, v, qw, seed = res
    g_out, g_s = g
    dq, dk, dv, dqw = banded_transformer_bwd(
        bias_noself, q, k, v, g_out.astype(q.dtype), heads,
        edge_band=edge_band, qw=qw, gs=g_s,
        dropout_rate=dropout_rate, seed=seed, mean_expand=True,
    )
    dseed = None if seed is None else np.zeros(seed.shape, jax.dtypes.float0)
    return (_zero_cot(bias_noself), jnp.zeros_like(edge_band),
            dq, dk, dv, dqw, dseed)


banded_transformer_edge_mean.defvjp(_trem_vjp_fwd, _trem_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def banded_transformer_geo(bias_noself, geo_band, pos, q, k, v, qw, heads,
                           dropout_rate=0.0, seed=None):
    """Geometric-factorized edge-conditioned transformer → (out, s).

    Same math and API contract as :func:`banded_transformer_edge` for
    ``[unit dir(3), dist]`` edge features (the only kind this framework's
    graphs carry), but streams 2 banded planes instead of 4 — the direction
    planes factor through ``pos`` (see ``_transformer_kernel`` doc).
    ``qw`` stays [N, H·4]; ``s`` stays [N, H·4] with identical semantics,
    so the outside W_e projection is unchanged.
    """
    return banded_transformer_fwd(bias_noself, q, k, v, heads,
                                  qw=qw, geo_band=geo_band, pos=pos,
                                  dropout_rate=dropout_rate, seed=seed)


def _trg_vjp_fwd(bias_noself, geo_band, pos, q, k, v, qw, heads,
                 dropout_rate, seed):
    out = banded_transformer_fwd(bias_noself, q, k, v, heads,
                                 qw=qw, geo_band=geo_band, pos=pos,
                                 dropout_rate=dropout_rate, seed=seed)
    return out, (bias_noself, geo_band, pos, q, k, v, qw, seed)


def _trg_vjp_bwd(heads, dropout_rate, res, g):
    from .banded_bwd import banded_transformer_bwd

    bias_noself, geo_band, pos, q, k, v, qw, seed = res
    g_out, g_s = g
    dq, dk, dv, dqw = banded_transformer_bwd(
        bias_noself, q, k, v, g_out, heads,
        qw=qw, gs=g_s, geo_band=geo_band, pos=pos,
        dropout_rate=dropout_rate, seed=seed,
    )
    dseed = None if seed is None else np.zeros(seed.shape, jax.dtypes.float0)
    return (_zero_cot(bias_noself), jnp.zeros_like(geo_band),
            jnp.zeros_like(pos), dq, dk, dv, dqw, dseed)


banded_transformer_geo.defvjp(_trg_vjp_fwd, _trg_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def banded_transformer_geo_mean(bias_noself, geo_band, pos, q, k, v, qw,
                                heads, dropout_rate=0.0, seed=None):
    """``banded_transformer_geo`` with the head mean fused → (out [N,C], s)."""
    return banded_transformer_fwd(bias_noself, q, k, v, heads,
                                  qw=qw, geo_band=geo_band, pos=pos,
                                  dropout_rate=dropout_rate, seed=seed,
                                  mean_heads=True)


def _trgm_vjp_fwd(bias_noself, geo_band, pos, q, k, v, qw, heads,
                  dropout_rate, seed):
    out = banded_transformer_fwd(bias_noself, q, k, v, heads,
                                 qw=qw, geo_band=geo_band, pos=pos,
                                 dropout_rate=dropout_rate, seed=seed,
                                 mean_heads=True)
    return out, (bias_noself, geo_band, pos, q, k, v, qw, seed)


def _trgm_vjp_bwd(heads, dropout_rate, res, g):
    from .banded_bwd import banded_transformer_bwd

    bias_noself, geo_band, pos, q, k, v, qw, seed = res
    g_out, g_s = g
    dq, dk, dv, dqw = banded_transformer_bwd(
        bias_noself, q, k, v, g_out.astype(q.dtype), heads,
        qw=qw, gs=g_s, geo_band=geo_band, pos=pos,
        dropout_rate=dropout_rate, seed=seed, mean_expand=True,
    )
    dseed = None if seed is None else np.zeros(seed.shape, jax.dtypes.float0)
    return (_zero_cot(bias_noself), jnp.zeros_like(geo_band),
            jnp.zeros_like(pos), dq, dk, dv, dqw, dseed)


banded_transformer_geo_mean.defvjp(_trgm_vjp_fwd, _trgm_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def banded_transformer_geo_mean_projgrad(
    bias_noself, geo_band, pos, x,
    wq, wk, wv,       # [F, HC]
    bq, bk, bv,       # [HC]
    wblk,             # [HC, H·4] block-diagonal qw projection
    heads, dropout_rate=0.0, seed=None,
):
    """Geo-mean transformer with the q/k/v projections INSIDE the vjp
    boundary → (out [N, C], s [N, H·4]).

    Forward is identical to the unfused path (XLA projections + the
    unfused kernel — in-kernel projection is a pinned negative,
    artifacts/tr_fuse_ab.json); the point is the BACKWARD: dk/dv leave the
    attention kernel as raw window partials and
    :func:`banded_bwd.fold_project_bwd` folds them straight into
    dWk/dWv/dbk/dbv/dx in VMEM — the [N, H·C] dk/dv arrays never exist in
    HBM (round-5; same trick as the GAT fuse_train fold).
    """
    q = (jnp.dot(x, wq, preferred_element_type=jnp.float32)
         + bq).astype(x.dtype)
    k = (jnp.dot(x, wk, preferred_element_type=jnp.float32)
         + bk).astype(x.dtype)
    v = (jnp.dot(x, wv, preferred_element_type=jnp.float32)
         + bv).astype(x.dtype)
    qw = jnp.dot(q, wblk,
                 preferred_element_type=jnp.float32).astype(q.dtype)
    return banded_transformer_fwd(bias_noself, q, k, v, heads,
                                  qw=qw, geo_band=geo_band, pos=pos,
                                  dropout_rate=dropout_rate, seed=seed,
                                  mean_heads=True)


def _trgmp_vjp_fwd(bias_noself, geo_band, pos, x, wq, wk, wv, bq, bk, bv,
                   wblk, heads, dropout_rate, seed):
    q = (jnp.dot(x, wq, preferred_element_type=jnp.float32)
         + bq).astype(x.dtype)
    k = (jnp.dot(x, wk, preferred_element_type=jnp.float32)
         + bk).astype(x.dtype)
    v = (jnp.dot(x, wv, preferred_element_type=jnp.float32)
         + bv).astype(x.dtype)
    qw = jnp.dot(q, wblk,
                 preferred_element_type=jnp.float32).astype(q.dtype)
    out = banded_transformer_fwd(bias_noself, q, k, v, heads,
                                 qw=qw, geo_band=geo_band, pos=pos,
                                 dropout_rate=dropout_rate, seed=seed,
                                 mean_heads=True)
    return out, (bias_noself, geo_band, pos, x, q, k, v, qw, seed,
                 wq, wk, wv, bq, bk, bv, wblk)


def _trgmp_vjp_bwd(heads, dropout_rate, res, g):
    from .banded_bwd import banded_transformer_bwd, fold_project_bwd

    (bias_noself, geo_band, pos, x, q, k, v, qw, seed,
     wq, wk, wv, bq, bk, bv, wblk) = res
    g_out, g_s = g
    tile = bias_noself.shape[1]
    if BWD_INKERNEL_PROJECT and wq.shape[1] >= 128:
        # carry-based direct dk/dv + full in-kernel projection backward:
        # dq/dk/dv/dqw never exist in HBM (see banded_transformer_bwd).
        # Unlike the GAT path this wins at every size (flagship 6.40 →
        # 6.05 ms: it absorbs two fold_project kernels, the dq_full/dwblk
        # fusions and the q projection backward), so no byte threshold.
        dx, dwq, dwk, dwv, dbq, dbk, dbv, dwblk = banded_transformer_bwd(
            bias_noself, q, k, v, g_out.astype(q.dtype), heads,
            qw=qw, gs=g_s, geo_band=geo_band, pos=pos,
            dropout_rate=dropout_rate, seed=seed, mean_expand=True,
            project_x=x, project_wq=wq, project_wk=wk, project_wv=wv,
            project_wblk=wblk,
        )
        dseed = (None if seed is None
                 else np.zeros(seed.shape, jax.dtypes.float0))
        return (_zero_cot(bias_noself), jnp.zeros_like(geo_band),
                jnp.zeros_like(pos), dx.astype(x.dtype),
                dwq.astype(wq.dtype), dwk.astype(wk.dtype),
                dwv.astype(wv.dtype), dbq.astype(bq.dtype),
                dbk.astype(bk.dtype), dbv.astype(bv.dtype),
                dwblk.astype(wblk.dtype), dseed)
    dq, dk_part, dv_part, dqw = banded_transformer_bwd(
        bias_noself, q, k, v, g_out.astype(q.dtype), heads,
        qw=qw, gs=g_s, geo_band=geo_band, pos=pos,
        dropout_rate=dropout_rate, seed=seed, mean_expand=True,
        raw_kv_partials=True,
    )
    # q collects cotangents from the kernel and from qw = q @ wblk — summed
    # in the primal dtype, matching the unfused path's autodiff accumulation
    dq_full = dq + jnp.dot(
        dqw.astype(q.dtype), wblk.T,
        preferred_element_type=jnp.float32).astype(q.dtype)
    dwblk = jnp.dot(q.T, dqw.astype(q.dtype),
                    preferred_element_type=jnp.float32).astype(wblk.dtype)
    dbq = jnp.sum(dq_full.astype(jnp.float32), axis=0).astype(bq.dtype)
    dwq = jnp.dot(x.T, dq_full,
                  preferred_element_type=jnp.float32).astype(wq.dtype)
    dx = jnp.dot(dq_full, wq.T,
                 preferred_element_type=jnp.float32).astype(x.dtype)
    # dk/dv fold + projection backward fused: dk/dv never hit HBM
    dx_k, dwk, dbk = fold_project_bwd(dk_part, x, wk, tile, with_bias=True)
    dx_v, dwv, dbv = fold_project_bwd(dv_part, x, wv, tile, with_bias=True)
    dx = dx + dx_k.astype(x.dtype) + dx_v.astype(x.dtype)
    dseed = None if seed is None else np.zeros(seed.shape, jax.dtypes.float0)
    return (_zero_cot(bias_noself), jnp.zeros_like(geo_band),
            jnp.zeros_like(pos), dx, dwq, dwk.astype(wk.dtype),
            dwv.astype(wv.dtype), dbq, dbk.astype(bk.dtype),
            dbv.astype(bv.dtype), dwblk, dseed)


banded_transformer_geo_mean_projgrad.defvjp(_trgmp_vjp_fwd, _trgmp_vjp_bwd)


def banded_transformer_geo_mean_fused(
    bias_noself, geo_band, pos, x,
    wq, wk, wv,       # [F, HC]
    bq, bk, bv,       # [HC]
    wblk,             # [HC, H·4] block-diagonal qw projection (q @ W_e form)
    heads,
):
    """``banded_transformer_geo_mean`` with q/k/v projections fused in-kernel.

    No-grad inference/eval path (see ``banded_gat_mean_fused``): sender
    blocks project to k/v once per grid step in VMEM, the receiver tile to
    q (and qw = q·wblk) — the [N, HC] q/k/v arrays never exist in HBM.
    Returns (out [N, C], s [N, H·4]) with identical semantics.
    """
    n_tiles, tile, width = bias_noself.shape
    sub = tile // 2
    w_sub = width // sub
    r = tile // sub
    f, hc = wq.shape
    c = hc // heads
    group = _choose_group(
        n_tiles, w_sub, tile, sub=sub,
        feat_bytes=f * x.dtype.itemsize + 4 * 4,
        # per-grid-step projected k/v blocks + q tile live in VMEM
        extra_in_bytes_per_tile=(5 * hc * x.dtype.itemsize
                                 + 2 * width * 4 + 6 * f * 2),
        extra_out_bytes_per_tile=heads * 4 * 4,
        scratch_bytes_per_tile=(
            (2 * heads * tile * width + 4 * width * hc) * 4
            if x.dtype == jnp.float32 else 0),
    )
    span = group * r + w_sub - r
    kernel = functools.partial(
        _transformer_kernel, window=w_sub, heads=heads,
        scale=1.0 / (c ** 0.5), edge_dim=4, group=group, sub=sub,
        mean_heads=True, geo=True, fuse_proj=True,
    )
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles // group,),
        in_specs=[
            pl.BlockSpec((group, tile, width), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((f, hc)), const((f, hc)), const((f, hc)),
            const((1, hc)), const((1, hc)), const((1, hc)),
            pl.BlockSpec((group * tile, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *_clamped_window_specs(w_sub, tile, f, n_tiles, group, sub),
            const((hc, heads * 4)),
            pl.BlockSpec((group, 2, tile, width), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *_clamped_window_specs(w_sub, tile, 4, n_tiles, group, sub),
        ],
        out_specs=(
            pl.BlockSpec((group * tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * tile, heads * 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x.shape[0], c), x.dtype),
            jax.ShapeDtypeStruct((x.shape[0], heads * 4), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * tile * (2 * width * hc + 3 * f * hc),
            bytes_accessed=bias_noself.size
            + geo_band.size * 4 + 2 * x.size * x.dtype.itemsize,
            transcendentals=n_tiles * heads * tile * width,
        ),
        interpret=_use_interpret(),
    )(bias_noself, wq, wk, wv,
      bq.reshape(1, hc), bk.reshape(1, hc), bv.reshape(1, hc),
      x, *([x] * span), wblk,
      geo_band, *([pos] * span))
