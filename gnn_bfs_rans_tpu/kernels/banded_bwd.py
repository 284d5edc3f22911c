"""Fused Pallas backward kernels for the banded attention forwards.

Flash-attention-style backward: attention probabilities are **recomputed in
VMEM** per receiver tile (never materialized to HBM — the jnp reference VJP
they replace materializes [n_tiles, T, W·T, H] tensors, ~75 MB/layer on the
BFS mesh, which made the train step ~30× slower than the forward).

Gradients w.r.t. *receiver-indexed* quantities (dα_dst, dq, dqw) are local
to the grid step and written directly.  Gradients w.r.t. *sender-indexed*
quantities (dz, dα_src, dk, dv) receive contributions from a bounded number
of receiver tiles; each grid step emits its per-window-block partials
``[n_tiles, W_sub, sub, F]`` (half-tile blocks, matching the forward's
window layout) and a cheap XLA shift-add (``combine_partials``) folds them
into ``[N, F]`` — W_sub adds of an [N, F]-sized array, no scatter.

All accumulation is float32 regardless of input dtype; cotangents are cast
back to the primal dtypes by the ``custom_vjp`` wrappers in ``banded.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _part_spec(window: int, sub: int, feat: int, group: int = 1):
    return pl.BlockSpec((group, window, sub, feat), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _part_spec_clamped(window: int, sub: int, feat: int, group: int,
                       n_real: int):
    """Partials spec whose extra (flush) grid step revisits the last block
    without writing it (see the direct-dz project mode)."""
    return pl.BlockSpec(
        (group, window, sub, feat),
        lambda i: (jnp.minimum(i, n_real - 1), 0, 0, 0),
        memory_space=pltpu.VMEM)


def _fold_kernel(n_tiles, w_sub, sub, r, k0, smax, span, group,
                 *refs):
    """Shifted-slice fold of G receiver tiles per grid step.

    ``refs[:group+span-1]`` are per-slot [1, w_sub, sub, F] blocks of the
    partials array: slot j holds tile ``clip(i·G - smax + j, 0, n_tiles-1)``
    (source offsets are −s, so tile i·G+g−s sits at the CONSTANT slot
    ``g + smax − s``).  Grouping amortizes the sliding-window re-read to
    (G+span−1)/G× — the G=1 form re-read the whole array span× and measured
    SLOWER than the XLA chain at 1M cells.  Out-of-range contributions are
    zeroed explicitly (the clamped duplicate would otherwise be added).
    """
    n_slots = group + span - 1
    part_refs, out_ref = refs[:n_slots], refs[n_slots]
    i = pl.program_id(0)
    feat = part_refs[0].shape[3]
    for g in range(group):
        t = i * group + g
        rows = []
        for m in range(r):
            acc = None
            for k in range(w_sub):
                if (k - k0) % r != m:
                    continue
                sft = (k - k0) // r
                slot = g + smax - sft
                valid = jnp.logical_and(t - sft >= 0, t - sft < n_tiles)
                blk = jnp.where(
                    valid, part_refs[slot][0, k].astype(jnp.float32), 0.0)
                acc = blk if acc is None else acc + blk
            rows.append(acc if acc is not None
                        else jnp.zeros((sub, feat), jnp.float32))
        tile = r * sub
        out_ref[g * tile:(g + 1) * tile] = jnp.concatenate(
            rows, axis=0).astype(out_ref.dtype)


def fold_partials(part: jax.Array, tile: int, out_dtype=None) -> jax.Array:
    """Pallas fold of window partials → [N, F] (see combine_partials).

    Built because XLA lowers the shifted-slice formulation to a TWO-stage
    fusion chain at 1M cells (~7.7 ms/layer vs the ~3.9 ms near-read-once
    roofline — round-4 trace, add_convert_fusion + pad_maximum_fusion).
    Wide features only; the narrow dα folds stay on the XLA path (a
    [.., 4]-lane block would hit the same T(8,128) padding waste the
    packed-α work removed).
    """
    from .banded import _use_interpret

    n_tiles, w_sub, sub, feat = part.shape
    r = tile // sub
    k0 = (w_sub - r) // 2
    shifts = sorted({(k - k0) // r for k in range(w_sub)})
    smin, smax = shifts[0], shifts[-1]
    span = smax - smin + 1
    out_dtype = out_dtype or jnp.float32
    # largest group ≤ 16 dividing n_tiles, VMEM-bounded: (G+span−1) slot
    # blocks + G output tiles (double-buffered; ~12 MiB of the 16 MiB VMEM)
    out_size = jnp.dtype(out_dtype).itemsize
    group = 1
    for gcand in range(2, 17):
        if n_tiles % gcand:
            continue
        vmem = ((gcand + span - 1) * w_sub * sub * feat * part.dtype.itemsize
                + gcand * tile * feat * out_size) * 2
        if vmem <= 12 * 2 ** 20:
            group = gcand
    kernel = functools.partial(
        _fold_kernel, n_tiles, w_sub, sub, r, k0, smax, span, group)

    def slot_map(j):
        return lambda i, j=j: (
            jnp.clip(i * group - smax + j, 0, n_tiles - 1), 0, 0, 0)

    n_slots = group + span - 1
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles // group,),
        in_specs=[pl.BlockSpec((1, w_sub, sub, feat), slot_map(j))
                  for j in range(n_slots)],
        out_specs=pl.BlockSpec((group * tile, feat), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, feat), out_dtype),
        interpret=_use_interpret(),
    )(*([part] * n_slots))
    return out


def _fold_project_kernel(n_tiles, w_sub, sub, r, k0, smax, span, group,
                         with_bias, *refs):
    """Fold window partials → dz tile in VMEM, then immediately apply the
    projection backward: dx = dz @ Wᵀ per tile and dW = Σ_t x_tᵀ @ dz_t
    accumulated across grid steps — dz never exists in HBM (round-5: the
    [N, HC] dz round trip plus the two XLA matmuls that re-read it were
    ~134 µs/layer on the flagship train step; this kernel's traffic is the
    partials + x + dx ≈ 40% of that)."""
    from .banded import _prec

    n_slots = group + span - 1
    part_refs = refs[:n_slots]
    x_ref = refs[n_slots]          # [G·T, F]
    w_ref = refs[n_slots + 1]      # [F, HC]
    dx_ref = refs[n_slots + 2]     # [G·T, F]
    dw_ref = refs[n_slots + 3]     # [F, HC] f32, same block every step
    db_ref = refs[n_slots + 4] if with_bias else None  # [8, HC] f32
    i = pl.program_id(0)
    feat = part_refs[0].shape[3]
    dt = w_ref.dtype
    prec = _prec(dt)

    @pl.when(i == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        if with_bias:
            db_ref[...] = jnp.zeros_like(db_ref)

    tile = r * sub
    for g in range(group):
        t = i * group + g
        rows = []
        for m in range(r):
            acc = None
            for k in range(w_sub):
                if (k - k0) % r != m:
                    continue
                sft = (k - k0) // r
                slot = g + smax - sft
                valid = jnp.logical_and(t - sft >= 0, t - sft < n_tiles)
                blk = jnp.where(
                    valid, part_refs[slot][0, k].astype(jnp.float32), 0.0)
                acc = blk if acc is None else acc + blk
            rows.append(acc if acc is not None
                        else jnp.zeros((sub, feat), jnp.float32))
        # identical rounding to fold_partials(out_dtype=primal): f32
        # accumulate, cast to the primal dtype, then the two matmuls
        dz_t = jnp.concatenate(rows, axis=0).astype(dt)      # [T, HC]
        x_t = x_ref[g * tile:(g + 1) * tile]
        dx_ref[g * tile:(g + 1) * tile] = jax.lax.dot_general(
            dz_t, w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dx_ref.dtype)
        dw_ref[...] += jax.lax.dot_general(
            x_t, dz_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        if with_bias:
            # bias grad = column sums of dz — MXU ones-contraction (cheap)
            # against an [8, T] ones block so the accumulator stays a full
            # sublane tile
            ones = jnp.ones((8, tile), dt)
            db_ref[...] += jnp.dot(
                ones, dz_t, preferred_element_type=jnp.float32,
                precision=prec)  # every row = colsum; caller reads row 0


def fold_project_bwd(part: jax.Array, x: jax.Array, w: jax.Array,
                     tile: int, with_bias: bool = False):
    """(dx, dw[, db]) of a fused projection z = x @ w (+ b) from dz window
    partials.

    Fuses :func:`fold_partials` with the projection backward (dx = dz·Wᵀ,
    dW = xᵀ·dz, db = colsum(dz)): the folded dz tile stays in VMEM and
    feeds the MXU contractions directly; dW/db accumulate in VMEM-resident
    f32 blocks across the (sequential) grid.  Numerics match the unfused
    path: f32 fold accumulation cast to the primal dtype, f32 matmul
    accumulation (HIGHEST precision on f32 primals), per-tile partial sums.
    """
    from .banded import _use_interpret

    n_tiles, w_sub, sub, feat = part.shape
    f = x.shape[1]
    r = tile // sub
    k0 = (w_sub - r) // 2
    shifts = sorted({(k - k0) // r for k in range(w_sub)})
    smin, smax = shifts[0], shifts[-1]
    span = smax - smin + 1
    # group: slot blocks + x/dx tiles + resident dW accumulator (+W), double
    # buffered for the streamed operands
    group = 1
    for gcand in (2, 4, 8, 16):
        if n_tiles % gcand:
            continue
        vmem = (2 * ((gcand + span - 1) * w_sub * sub * feat
                     * part.dtype.itemsize
                     + gcand * tile * (f * x.dtype.itemsize
                                       + f * x.dtype.itemsize))
                + f * feat * (4 + w.dtype.itemsize))
        if vmem <= 10 * 2 ** 20:
            group = gcand
    kernel = functools.partial(
        _fold_project_kernel, n_tiles, w_sub, sub, r, k0, smax, span, group,
        with_bias)

    def slot_map(j):
        return lambda i, j=j: (
            jnp.clip(i * group - smax + j, 0, n_tiles - 1), 0, 0, 0)

    n_slots = group + span - 1
    out_specs = [
        pl.BlockSpec((group * tile, f), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((f, feat), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles * tile, f), x.dtype),
        jax.ShapeDtypeStruct((f, feat), jnp.float32),
    ]
    if with_bias:
        out_specs.append(pl.BlockSpec((8, feat), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((8, feat), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles // group,),
        in_specs=[
            *[pl.BlockSpec((1, w_sub, sub, feat), slot_map(j))
              for j in range(n_slots)],
            pl.BlockSpec((group * tile, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, feat), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_tiles * tile * f * feat,
            bytes_accessed=part.size * part.dtype.itemsize
            + 2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(*([part] * n_slots), x, w)
    if with_bias:
        return outs[0], outs[1], outs[2][0]
    return outs[0], outs[1]


def combine_partials(part: jax.Array, tile: int) -> jax.Array:
    """[n_tiles, W_sub, sub, F] per-(receiver-tile, window-block) partials
    → [N, F].

    Window block (t, k) covers sender sub-tile ``t·r + k − k0`` (r = T/sub
    blocks per tile, ``k0 = (W_sub − r)/2``), i.e. partial (t, k) lands at
    destination tile ``u = t + ⌊(k−k0)/r⌋``, sub-row ``m = (k−k0) mod r``.
    Inverting: ``dz[u, m] = Σ_{k ≡ k0+m (mod r)} part[u − ⌊(k−k0)/r⌋, k]``
    — each output element is a sum of ``W_sub/r`` *shifted slices* of the
    partials, which XLA fuses into ONE pass (read the partials once, write
    the result once, f32 accumulation in registers).

    The previous formulation — W_sub strided ``.at[].add`` updates onto an
    [n_tiles(+pad), r, sub, F] f32 accumulator — nominally re-reads and
    re-writes the f32 accumulator per window block; XLA fused it well
    enough that the A/B at 1M cells measured neutral (w_sub=4,
    artifacts/scale_bwd_decomp*.json), so this form is kept for being
    guaranteed single-pass (and simpler), not for a measured win.
    Partials may be stored in the (bf16) primal dtype to halve the stream;
    the final cotangent is cast to the primal dtype regardless.
    """
    n_tiles, w_sub, sub, feat = part.shape
    r = tile // sub
    k0 = (w_sub - r) // 2
    pad = (w_sub + r - 1) // r + 1  # ≥ max |tile shift| over window blocks
    p = jnp.pad(part, ((pad, pad), (0, 0), (0, 0), (0, 0)))
    rows = []
    for m in range(r):
        acc = None
        for k in range(w_sub):
            if (k - k0) % r != m:
                continue
            s = (k - k0) // r  # Python floor: correct for negative k−k0
            sl = p[pad - s:pad - s + n_tiles, k].astype(jnp.float32)
            acc = sl if acc is None else acc + sl
        rows.append(acc if acc is not None
                    else jnp.zeros((n_tiles, sub, feat), jnp.float32))
    dz = jnp.stack(rows, axis=1)  # [n_tiles, r, sub, F]
    return dz.reshape(n_tiles * tile, feat)


# ------------------------------------------------------------ GAT backward
def _gat_bwd_kernel(*refs, window, heads, negative_slope, group, sub,
                    dropout_rate=0.0, mean_expand=False, use_stats=False,
                    delta_rs=False, mxu_das=False, dz_dg=False,
                    project=False, alpha_project=False):
    """Grouped + head-stacked, mirroring ``banded._gat_kernel`` — the
    softmax recompute runs as wide [H·T, Wcols] VPU ops over the half-tile
    window (see the forward kernel) and, when dropout is on, the
    per-receiver-tile re-seeded ``prng_random_bits`` call replays the
    forward's PRNG stream bit-exactly regardless of either side's group
    size.

    Recompute-thinning variants (round 5, each A/B'd on device):

    * ``use_stats`` — the forward saved the per-row softmax stats
      ([G·T, 2H] f32, packed m|inv like the alphas): skip the max and
      sum reductions over the [H·T, Wcols] plane; ``e = exp(full − m)``
      is bit-identical to the forward's (same m).
    * ``delta_rs`` — flash-attention delta trick: the softmax-VJP row
      term rs = Σ_j p̃·dp is ``rowsum(gout ⊙ out)`` where out is the
      forward's (per-head) output; recomputing out = (e_d@zcat)·inv is
      one MXU matmul + a narrow [T, C] reduce instead of a full-plane
      VPU multiply+lane-reduce.
    * ``mxu_das`` — the per-window dα_src column sums become ONE
      selector matmul [H, H·T] @ dpre on the MXU instead of H·W
      cross-sublane reductions.
    """
    i = 0
    if dropout_rate > 0:
        seed_ref = refs[i]; i += 1
    mask_ref = refs[i]; i += 1                   # [G, T, Wcols]
    tile = mask_ref.shape[1]
    r = tile // sub
    span = group * r + window - r
    aps = refs[i:i + span]; i += span            # span × [sub, 2H] packed
    apd_ref = refs[i]; i += 1                    # [G·T, 2H] packed (direct)
    stats_ref = None
    if use_stats:
        stats_ref = refs[i]; i += 1              # [G·T, 2H] f32 (m | inv)
    zs = refs[i:i + span]; i += span             # span × [sub, HC]
    g_ref = refs[i]; i += 1                      # [G·T, HC]
    if project:
        xs = refs[i:i + span]; i += span         # span × [sub, F] (x window)
        w_ref = refs[i]; i += 1                  # [F, HC]
        if alpha_project:
            # α factor matrices inside the boundary too (src/dst halves
            # pre-split and 8-padded for clean tiles): the narrow dα
            # streams never exist in HBM (see banded_gat_bwd doc)
            was_ref, wad_ref = refs[i], refs[i + 1]; i += 2   # [F, 8]
            dx_ref, dw_ref = refs[i], refs[i + 1]; i += 2
            dxr_ref = refs[i]; i += 1            # [G·T, F] receiver rows
            dwas_ref, dwad_ref = refs[i], refs[i + 1]; i += 2  # [8, F] f32
            carry_ref, carry_a_ref = refs[i], refs[i + 1]
        else:
            dad_ref, das_ref = refs[i], refs[i + 1]; i += 2
            dx_ref, dw_ref = refs[i], refs[i + 1]; i += 2
            carry_ref = refs[i]                  # VMEM scratch [L·sub, HC]
        n_real = pl.num_programs(0) - 1
        pid = pl.program_id(0)
        k0 = (window - r) // 2
        n_local = group * r + window - r         # local dz sub-blocks
        n_fin = group * r                        # finalized per step
        carry_subs = window - r

        @pl.when(pid == 0)
        def _init():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            if alpha_project:
                dwas_ref[...] = jnp.zeros_like(dwas_ref)
                dwad_ref[...] = jnp.zeros_like(dwad_ref)
    else:
        dad_ref, das_ref, dz_ref = refs[i], refs[i + 1], refs[i + 2]

    c = zs[0].shape[1] // heads
    from .banded import (
        _dropout_bits, _dropout_thresh, _mm_cast, _prec, _prng_seed,
    )

    prec = _prec(zs[0].dtype)
    dt = zs[0].dtype

    if dropout_rate > 0:
        inv_keep = 1.0 / (1.0 - dropout_rate)
    ap_blocks = [a[:].astype(jnp.float32) for a in aps]
    if project:
        # sliding-carry direct-dz accumulation (see banded_gat_bwd doc):
        # local[j] ↔ sender sub-block i·G·r − k0 + j; the first G·r are
        # finalized this step (after merging the carry), the last W−r roll
        # into the carry scratch for the next step.  Contributions computed
        # by the flush-only extra grid step are scaled to zero.
        local = [None] * n_local
        local_a = [None] * n_local if alpha_project else None
        vf = jnp.where(pid < n_real, 1.0, 0.0)
    for g in range(group):
        bias_cat = (mask_ref[g].astype(jnp.float32) - 1.0) * 1e30  # [T, Wc]
        # packed α via COLUMN extracts only (src lane h, dst lane heads+h) —
        # no lane-offset slices in the hot loop (see banded._gat_kernel)
        adst2 = apd_ref[g * tile:(g + 1) * tile].astype(jnp.float32)
        ap_cat = jnp.concatenate(
            [ap_blocks[g * r + k] for k in range(window)],
            axis=0)                                          # [Wcols, 2H]
        zcat = jnp.concatenate(
            [zs[g * r + k][:] for k in range(window)], axis=0)  # [Wcols, HC]
        pre = jnp.concatenate(
            [adst2[:, heads + h][:, None] + ap_cat[:, h][None, :]
             for h in range(heads)],
            axis=0,
        )                                                    # [H·T, WT]
        full = jnp.where(pre >= 0, pre, negative_slope * pre)
        full = full + jnp.concatenate([bias_cat] * heads, axis=0)
        if use_stats:
            # forward-saved stats: exp(full − m) is bit-identical to the
            # forward's e (same m), masked entries underflow to exactly 0.
            # Columns are extracted via masked lane-reduces so every concat
            # operand sits at lane offset 0 (Mosaic rejects concatenation of
            # narrow vectors with mismatched lane offsets).
            st = stats_ref[g * tile:(g + 1) * tile].astype(jnp.float32)
            lane = jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)

            def _col(j):
                return jnp.sum(jnp.where(lane == j, st, 0.0),
                               axis=1, keepdims=True)

            m = jnp.concatenate([_col(h) for h in range(heads)], axis=0)
            inv = jnp.concatenate(
                [_col(heads + h) for h in range(heads)], axis=0)
            e = jnp.exp(full - m)
        else:
            m = jnp.max(full, axis=1, keepdims=True)
            e = jnp.exp(full - m)
            denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
            # normalization deferred (see banded._gat_kernel): p = e·inv is
            # never materialized — inv row-scales the narrow [T, C] gout for
            # the dz matmuls and folds into the softmax-VJP algebra as
            # broadcast mults
            inv = 1.0 / denom                                # [H·T, 1]
        if mean_expand:
            # cotangent of the head-MEAN output: every head receives g/H.
            # Expanding here (one [T, C] VMEM read shared by all heads)
            # avoids materializing the tiled [N, H·C] cotangent in HBM.
            g_mean = (g_ref[g * tile:(g + 1) * tile]
                      .astype(jnp.float32) * (1.0 / heads))
            gout = [g_mean] * heads
        else:
            gout = [
                g_ref[g * tile:(g + 1) * tile, h * c:(h + 1) * c]
                .astype(jnp.float32)
                for h in range(heads)
            ]
        gout_s = [gout[h] * inv[h * tile:(h + 1) * tile] for h in range(heads)]
        if project:
            # zero the dz contributions of the flush-only extra step (its
            # clamped inputs and shifted dropout seed are bogus)
            gout_s = [gs_ * vf for gs_ in gout_s]
        dp = jnp.concatenate([
            jnp.dot(_mm_cast(gout[h], dt), zcat[:, h * c:(h + 1) * c].T,
                    preferred_element_type=jnp.float32, precision=prec)
            for h in range(heads)
        ], axis=0)                                           # [H·T, Wcols]
        if dropout_rate > 0:
            sv = seed_ref[0] + pl.program_id(0) * group + g
            _prng_seed(sv)
            keep = _dropout_bits(e.shape, sv) >= _dropout_thresh(dropout_rate)
            e_d = jnp.where(keep, e * inv_keep, 0.0)  # e as the fwd used it
            dp = jnp.where(keep, dp * inv_keep, 0.0)  # dpd → dp through mask
        else:
            e_d = e
        if delta_rs:
            # rs = Σ_j p̃·dp == rowsum(gout ⊙ out): recompute the per-head
            # output with ONE MXU matmul + a narrow [T, C] reduce instead of
            # the full-plane VPU multiply+lane-reduce (identical math —
            # Σ_j e_d·dp·inv = gout·(e_d@zcat)·inv, dropout masks included)
            rs = jnp.concatenate([
                jnp.sum(
                    gout[h] * jnp.dot(
                        _mm_cast(e_d[h * tile:(h + 1) * tile], dt),
                        zcat[:, h * c:(h + 1) * c],
                        preferred_element_type=jnp.float32, precision=prec)
                    * inv[h * tile:(h + 1) * tile],
                    axis=1, keepdims=True)
                for h in range(heads)
            ], axis=0)                                       # [H·T, 1]
        else:
            rs = jnp.sum(e * dp, axis=1, keepdims=True) * inv
        dl = e * ((dp - rs) * inv)                           # softmax VJP
        dpre = dl * jnp.where(pre >= 0, 1.0, negative_slope)  # [H·T, WT]
        if project and alpha_project:
            # zero the α contributions of the flush-only extra step too
            dpre = dpre * vf
        dad_cols = []
        das_blocks = [[] for _ in range(window)]  # [k][h] → [sub, 1]
        dz_blocks = [[] for _ in range(window)]   # [k] → [sub, C] per head
        if alpha_project:
            # dα_src column sums in [8, Wcols] orientation (rows ≥ H zero):
            # the per-window blocks slice on the LANE dim, matching the
            # lane-major local_a/carry layout that avoids all [.., H]
            # lane-padding
            sel8 = (jax.lax.broadcasted_iota(
                jnp.int32, (8, heads * tile), 0)
                == jax.lax.broadcasted_iota(
                    jnp.int32, (8, heads * tile), 1) // tile)
            colsum8 = jax.lax.dot_general(
                _mm_cast(sel8.astype(jnp.float32), dt), _mm_cast(dpre, dt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )                                                # [8, Wcols]
        elif mxu_das:
            # all H·W column sums as ONE MXU contraction over the plane's
            # row dim: out[w, h] = Σ_j dpre[j, w]·sel[j, h] with
            # sel[j, h] = 1 iff row j belongs to head h — lands [Wcols, H]
            # so the per-window das blocks are plain sublane slices
            sel = (jax.lax.broadcasted_iota(
                jnp.int32, (heads * tile, heads), 0) // tile
                == jax.lax.broadcasted_iota(
                    jnp.int32, (heads * tile, heads), 1))
            colsum_t = jax.lax.dot_general(
                _mm_cast(dpre, dt), _mm_cast(sel.astype(jnp.float32), dt),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )                                                # [Wcols, H]
        for h in range(heads):
            rows = slice(h * tile, (h + 1) * tile)
            dad_cols.append(jnp.sum(dpre[rows], axis=1, keepdims=True))
            for k in range(window):
                cols = slice(k * sub, (k + 1) * sub)
                if not mxu_das and not alpha_project:
                    das_blocks[k].append(
                        jnp.sum(dpre[rows, cols], axis=0)[:, None])
                if dz_dg:
                    # dim-0 contraction: the MXU consumes the e_d block
                    # without a materialized vreg transpose
                    dz_blocks[k].append(jax.lax.dot_general(
                        _mm_cast(e_d[rows, cols], dt),
                        _mm_cast(gout_s[h], dt),
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec))
                else:
                    dz_blocks[k].append(jnp.dot(
                        _mm_cast(e_d[rows, cols], dt).T,
                        _mm_cast(gout_s[h], dt),
                        preferred_element_type=jnp.float32, precision=prec))
        if project and alpha_project:
            # α receiver side: dxr = dad·wa_dstᵀ (write-guarded), dWa_dst
            # accumulate — dad never exists in HBM.  dad8 pads H → 8 lanes
            # with zero columns so every contraction is a clean tile.
            dad8 = jnp.concatenate(
                dad_cols + [jnp.zeros((tile, 1), jnp.float32)] * (8 - heads),
                axis=1)                                      # [T, 8]
            x_dir = jnp.concatenate(
                [xs[g * r + k0 + j][:] for j in range(r)], axis=0)

            @pl.when(pid < n_real)
            def _store_dxr(g=g, dad8=dad8):
                dxr_ref[g * tile:(g + 1) * tile] = jax.lax.dot_general(
                    dad8.astype(dt), wad_ref[:],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                ).astype(dxr_ref.dtype)

            dwad_ref[...] += jax.lax.dot_general(
                dad8, x_dir.astype(jnp.float32),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for k in range(window):
                j = g * r + k
                blk = jnp.concatenate(dz_blocks[k], axis=1)  # [sub, HC] f32
                local[j] = blk if local[j] is None else local[j] + blk
                a_blk = colsum8[:, k * sub:(k + 1) * sub]    # [8, sub]
                local_a[j] = (a_blk if local_a[j] is None
                              else local_a[j] + a_blk)
        elif project:
            @pl.when(pid < n_real)
            def _store_narrow(g=g, dad_cols=dad_cols, das_blocks=das_blocks,
                              colsum_t=colsum_t if mxu_das else None):
                dad_ref[g * tile:(g + 1) * tile] = jnp.concatenate(
                    dad_cols, axis=1).astype(dad_ref.dtype)
                if mxu_das:
                    das_ref[g] = jnp.stack(
                        [colsum_t[k * sub:(k + 1) * sub]
                         for k in range(window)],
                        axis=0).astype(das_ref.dtype)
                else:
                    das_ref[g] = jnp.stack(
                        [jnp.concatenate(bs, axis=1) for bs in das_blocks],
                        axis=0).astype(das_ref.dtype)

            for k in range(window):
                j = g * r + k
                blk = jnp.concatenate(dz_blocks[k], axis=1)  # [sub, HC] f32
                local[j] = blk if local[j] is None else local[j] + blk
        else:
            dad_ref[g * tile:(g + 1) * tile] = jnp.concatenate(
                dad_cols, axis=1).astype(dad_ref.dtype)
            if mxu_das:
                das_ref[g] = jnp.stack(
                    [colsum_t[k * sub:(k + 1) * sub] for k in range(window)],
                    axis=0).astype(das_ref.dtype)
            else:
                das_ref[g] = jnp.stack(
                    [jnp.concatenate(bs, axis=1) for bs in das_blocks],
                    axis=0).astype(das_ref.dtype)
            dz_ref[g] = jnp.stack(
                [jnp.concatenate(bs, axis=1) for bs in dz_blocks], axis=0
            ).astype(dz_ref.dtype)
    if project:
        # merge the carry into the first W−r local blocks, finalize G·r
        # sub-blocks, and project them in VMEM: dx = dz·Wᵀ, dW += xᵀ·dz —
        # dz never exists in HBM
        cin = carry_ref[...]                                 # [L·sub, HC]
        for m in range(carry_subs):
            blk = jnp.where(pid == 0, 0.0, cin[m * sub:(m + 1) * sub])
            local[m] = blk if local[m] is None else local[m] + blk
        for j in range(n_local):
            if local[j] is None:
                local[j] = jnp.zeros((sub, zs[0].shape[1]), jnp.float32)
        dz_win = jnp.concatenate(
            [local[j] for j in range(n_fin)], axis=0).astype(dt)
        x_win = jnp.concatenate(
            [xs[j][:] for j in range(n_fin)], axis=0)        # [G·T, F]
        dx_win = jax.lax.dot_general(
            dz_win, w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        if alpha_project:
            # merge + finalize the α carry in the same shifted window and
            # fold the α-src term into dx / dWa_src — the [8, ·] lane-major
            # layout never pays the [N, H] lane-padding
            cin_a = carry_a_ref[...]                         # [8, L·sub]
            for m in range(carry_subs):
                a_blk = jnp.where(pid == 0, 0.0,
                                  cin_a[:, m * sub:(m + 1) * sub])
                local_a[m] = (a_blk if local_a[m] is None
                              else local_a[m] + a_blk)
            for j in range(n_local):
                if local_a[j] is None:
                    local_a[j] = jnp.zeros((8, sub), jnp.float32)
            das_win8 = jnp.concatenate(
                [local_a[j] for j in range(n_fin)], axis=1)  # [8, G·T]
            dx_win = dx_win + jax.lax.dot_general(
                _mm_cast(das_win8, dt), was_ref[:],
                (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            dwas_ref[...] += jax.lax.dot_general(
                das_win8, x_win.astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            carry_a_ref[...] = jnp.concatenate(
                [local_a[n_fin + m] for m in range(carry_subs)], axis=1)
        dx_ref[...] = dx_win.astype(dx_ref.dtype)
        dw_ref[...] += jax.lax.dot_general(
            x_win, dz_win, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        carry_ref[...] = jnp.concatenate(
            [local[n_fin + m] for m in range(carry_subs)], axis=0)


def banded_gat_bwd(bias_self, z, alphas, g, heads,
                   negative_slope=0.2, dropout_rate=0.0, seed=None,
                   mean_expand=False, stats=None, delta_rs=False,
                   mxu_das=False, dz_dg=False, raw_dz_partials=False,
                   project_x=None, project_w=None, alpha_wa=None):
    """Fused backward of ``banded_gat_fwd`` → (dz, dalphas).

    ``alphas`` is PACKED [N, 2H] (src|dst), sliced in VMEM like the forward
    — no narrow [N, H] arrays in HBM; ``dalphas`` returns packed the same
    way.  With ``mean_expand`` the cotangent ``g`` is that of the head-MEAN
    output ([N, C]); the per-head expansion g/H happens in VMEM instead of
    materializing the tiled [N, H·C] cotangent in HBM.  ``stats`` is the
    forward-saved [N, 2H] f32 softmax stats array (m|inv packed) — when
    given, the backward skips the plane max/sum recompute (see
    ``_gat_bwd_kernel``); ``delta_rs``/``mxu_das`` select the MXU-offload
    variants of the softmax-VJP row term and the dα_src column sums.
    """
    from .banded import _choose_group, _clamped_window_specs, _seed_inputs

    n_tiles, tile, width = bias_self.shape
    sub = tile // 2
    w_sub = width // sub
    r = tile // sub
    hc = z.shape[1]
    h = heads
    n = z.shape[0]
    g_feat = hc // heads if mean_expand else hc
    use_stats = stats is not None
    project = project_x is not None
    alpha = alpha_wa is not None
    assert not alpha or (project and heads <= 8), \
        "alpha_wa requires project mode and heads <= 8"
    f = project_x.shape[1] if project else 0
    group = _choose_group(
        n_tiles, w_sub, tile, sub=sub,
        feat_bytes=(hc + 2 * h) * z.dtype.itemsize + hc * 4
        + (f * project_x.dtype.itemsize if project else 0),
        # per-window partials (dz in primal dtype + f32 dα_src) dominate the
        # output side
        extra_out_bytes_per_tile=(width // tile) * (
            (0 if project else hc * z.dtype.itemsize) + h * 4)
        + (f * project_x.dtype.itemsize if project else 0),
        extra_in_bytes_per_tile=(2 * h * 4 if use_stats else 0),
        scratch_bytes_per_tile=(
            3 * heads * tile * width * 4
            if z.dtype == jnp.float32 else 0),
    )
    span = group * r + w_sub - r
    kernel = functools.partial(
        _gat_bwd_kernel, window=w_sub, heads=heads,
        negative_slope=negative_slope, group=group, sub=sub,
        dropout_rate=dropout_rate, mean_expand=mean_expand,
        use_stats=use_stats, delta_rs=delta_rs, mxu_das=mxu_das, dz_dg=dz_dg,
        project=project, alpha_project=alpha,
    )
    seed_in, seed_specs = _seed_inputs(dropout_rate, seed)
    stats_in, stats_specs = [], []
    if use_stats:
        stats_in = [stats]
        stats_specs = [pl.BlockSpec((group * tile, 2 * h), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)]
    n_real = n_tiles // group
    if project:
        # one flush-only extra grid step; every direct map clamps to the
        # last real block (outputs revisit it and skip their writes there)
        grid = n_real + 1
        dmap = lambda i: (jnp.minimum(i, n_real - 1), 0)  # noqa: E731
        mmap = lambda i: (jnp.minimum(i, n_real - 1), 0, 0)  # noqa: E731
    else:
        grid = n_real
        dmap = lambda i: (i, 0)  # noqa: E731
        mmap = lambda i: (i, 0, 0)  # noqa: E731
    in_specs = [
        *seed_specs,
        pl.BlockSpec((group, tile, width), mmap, memory_space=pltpu.VMEM),
        *_clamped_window_specs(w_sub, tile, 2 * h, n_tiles, group, sub),
        pl.BlockSpec((group * tile, 2 * h), dmap, memory_space=pltpu.VMEM),
        *stats_specs,
        *_clamped_window_specs(w_sub, tile, hc, n_tiles, group, sub),
        pl.BlockSpec((group * tile, g_feat), dmap, memory_space=pltpu.VMEM),
    ]
    inputs = [*seed_in, bias_self, *([alphas] * span), alphas, *stats_in,
              *([z] * span), g]
    if alpha:
        out_specs, out_shape = [], []
    else:
        out_specs = [
            pl.BlockSpec((group * tile, h), dmap, memory_space=pltpu.VMEM),
            _part_spec_clamped(w_sub, sub, h, group, n_real) if project
            else _part_spec(w_sub, sub, h, group),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n, h), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, w_sub, sub, h), jnp.float32),
        ]
    scratch_shapes = []
    if project:
        in_specs += [
            *_clamped_window_specs(w_sub, tile, f, n_tiles, group, sub),
            pl.BlockSpec((f, hc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs += [*([project_x] * span), project_w]
        if alpha:
            # α factor halves, 8-padded [F, 8] for clean tiles
            wa8 = jnp.zeros((f, 8), alpha_wa.dtype)
            was8 = wa8.at[:, :h].set(alpha_wa[:, :h])
            wad8 = wa8.at[:, :h].set(alpha_wa[:, h:])
            in_specs += [pl.BlockSpec((f, 8), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)] * 2
            inputs += [was8, wad8]
        out_specs += [
            pl.BlockSpec((group * tile, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, hc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            # shifted by k0 sub-blocks (+1 flush step): dx row R of the real
            # array sits at padded row R + k0·sub
            jax.ShapeDtypeStruct((grid * group * tile, f), project_x.dtype),
            jax.ShapeDtypeStruct((f, hc), jnp.float32),
        ]
        scratch_shapes = [pltpu.VMEM(((w_sub - r) * sub, hc), jnp.float32)]
        if alpha:
            out_specs += [
                pl.BlockSpec((group * tile, f), dmap,
                             memory_space=pltpu.VMEM),       # dxr (guarded)
                pl.BlockSpec((8, f), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),       # dwa_src acc
                pl.BlockSpec((8, f), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),       # dwa_dst acc
            ]
            out_shape += [
                jax.ShapeDtypeStruct((n, f), project_x.dtype),
                jax.ShapeDtypeStruct((8, f), jnp.float32),
                jax.ShapeDtypeStruct((8, f), jnp.float32),
            ]
            scratch_shapes.append(
                pltpu.VMEM((8, (w_sub - r) * sub), jnp.float32))
    else:
        out_specs.append(_part_spec(w_sub, sub, hc, group))
        out_shape.append(
            # dz partials in the primal dtype: the combined cotangent is cast
            # to z.dtype anyway, and f32 partials are the dominant HBM stream.
            # NOTE: for bf16 primals each of the W window partials is rounded
            # to bf16 BEFORE the f32 combine_partials fold — extra gradient
            # noise of a few bf16 ulps vs all-f32 partials.  Gradient-parity
            # tests therefore compare in f32 at rtol=1e-4; bf16 training
            # quality is covered by the acceptance runs (BENCHMARKS.md).
            jax.ShapeDtypeStruct((n_tiles, w_sub, sub, hc), z.dtype))
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=4 * n_tiles * heads * tile * width * (hc // heads)
            + (4 * n_tiles * tile * f * hc if project else 0),
            bytes_accessed=bias_self.size * bias_self.dtype.itemsize
            + 2 * (w_sub // r + 1) * z.size * 4,
            transcendentals=n_tiles * heads * tile * width,
        ),
        interpret=_use_interpret(),
    )(*inputs)
    if alpha:
        dx_arr, dw, dxr, dwas, dwad = outs
        k0 = (w_sub - r) // 2
        dx = (jax.lax.slice_in_dim(dx_arr, k0 * sub, k0 * sub + n, axis=0)
              + dxr)
        # [F, 2H] α-factor cotangent from the two [8, F] accumulators —
        # tiny transposes, no [N, narrow] array anywhere
        dwa = jnp.concatenate([dwas[:h].T, dwad[:h].T],
                              axis=1).astype(alpha_wa.dtype)
        return dx, dw, dwa
    dad, das_part = outs[0], outs[1]
    das = combine_partials(das_part, tile)
    # packed dα (src|dst) — one concat of two already-f32 streams
    da = jnp.concatenate([das, dad], axis=1).astype(alphas.dtype)
    if project:
        k0 = (w_sub - r) // 2
        dx = jax.lax.slice_in_dim(outs[2], k0 * sub, k0 * sub + n, axis=0)
        return dx, outs[3], da
    dz_part = outs[2]
    if raw_dz_partials:
        # caller folds (e.g. fold_project_bwd fuses the fold with the
        # projection backward so dz never exists in HBM)
        return dz_part, da
    dz = (fold_partials(dz_part, tile, out_dtype=z.dtype)
          if dz_part.shape[-1] >= 128
          else combine_partials(dz_part, tile).astype(z.dtype))
    return dz, da


# ------------------------------------ Transformer backward (head-stacked)
def _tr_bwd_kernel_stacked(*refs, window, heads, scale, has_gs, group, sub,
                           dropout_rate=0.0, mean_expand=False, geo=False,
                           project=False):
    """Head-STACKED transformer backward (geo / plain paths).

    The round-4 kernel looped heads with narrow [T, Wcols] VPU chains; this
    variant mirrors ``_gat_bwd_kernel``: the per-head MXU matmuls (logits,
    dp, dq, dk/dv) stay per-head, but every elementwise/reduce chain and
    every K=4 geometric matmul (qpos, gsp, t13u) runs ONCE on the stacked
    [H·T, Wcols] plane.  Dropout replays the forward's per-head PRNG draws
    (one draw per head, stacked by concatenation) bit-exactly.
    """
    i = 0
    if dropout_rate > 0:
        seed_ref = refs[i]; i += 1
    mask_ref = refs[i]; i += 1                   # [G, T, Wcols]
    tile = mask_ref.shape[1]
    r = tile // sub
    span = group * r + window - r
    k0 = (window - r) // 2
    q_ref = refs[i]; i += 1                      # [G·T, HC]
    ks = refs[i:i + span]; i += span             # span × [sub, HC]
    vs = refs[i:i + span]; i += span
    poss = None
    if geo:
        feat_ref = refs[i]; i += 1   # [G, 2, T, Wcols] (dist, 1/dist)
        qw_ref = refs[i]; i += 1     # [G·T, H*4]
        poss = refs[i:i + span]; i += span       # span × [sub, 4]
    g_ref = refs[i]; i += 1
    gs_ref = refs[i] if has_gs else None
    i += 1 if has_gs else 0
    if project:
        span_x = span
        xs = refs[i:i + span_x]; i += span_x     # span × [sub, F] (x window)
        wq_ref, wk_ref, wv_ref = refs[i:i + 3]; i += 3   # [F, HC]
        wblk_ref = refs[i]; i += 1               # [HC, H·4]
        dxq_ref = refs[i]; i += 1                # [G·T, F] (receiver rows)
        dxkv_ref = refs[i]; i += 1               # [G·T, F] (shifted window)
        dwq_ref, dwk_ref, dwv_ref = refs[i:i + 3]; i += 3  # [F, HC] f32 acc
        dbq_ref, dbk_ref, dbv_ref = refs[i:i + 3]; i += 3  # [8, HC] f32 acc
        dwblk_ref = refs[i]; i += 1              # [HC, H·4] f32 acc
        carry_k_ref, carry_v_ref = refs[i], refs[i + 1]   # VMEM scratch
        n_real = pl.num_programs(0) - 1
        pid = pl.program_id(0)
        n_local = group * r + window - r
        n_fin = group * r
        carry_subs = window - r

        @pl.when(pid == 0)
        def _init():
            dwq_ref[...] = jnp.zeros_like(dwq_ref)
            dwk_ref[...] = jnp.zeros_like(dwk_ref)
            dwv_ref[...] = jnp.zeros_like(dwv_ref)
            dbq_ref[...] = jnp.zeros_like(dbq_ref)
            dbk_ref[...] = jnp.zeros_like(dbk_ref)
            dbv_ref[...] = jnp.zeros_like(dbv_ref)
            dwblk_ref[...] = jnp.zeros_like(dwblk_ref)

        local_k = [None] * n_local
        local_v = [None] * n_local
        vf = jnp.where(pid < n_real, 1.0, 0.0)
    else:
        dq_ref = refs[i]; i += 1
        dk_ref, dv_ref = refs[i], refs[i + 1]; i += 2
        dqw_ref = refs[i] if geo else None

    c = q_ref.shape[1] // heads
    from .banded import _mm_cast, _prec

    prec = _prec(ks[0].dtype)
    dt = ks[0].dtype
    if dropout_rate > 0:
        from .banded import (
            _dropout_bits, _dropout_thresh, _prng_seed,
        )

        inv_keep = 1.0 / (1.0 - dropout_rate)

    def _stack4(src_ref, rows):
        """[T, H·4] lane-packed per-head quads → stacked [H·T, 4] f32.

        Per-head extraction via tiny one-hot matmuls so every concat
        operand lands at lane offset 0 (Mosaic vpad constraint)."""
        t_blk = src_ref[rows].astype(jnp.float32)            # [T, H·4]
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (heads * 4, 4), 0)
        col = jax.lax.broadcasted_iota(
            jnp.int32, (heads * 4, 4), 1)
        blocks = []
        for h in range(heads):
            sel = ((lane >= h * 4) & (lane < (h + 1) * 4)
                   & (lane - h * 4 == col)).astype(jnp.float32)
            blocks.append(jnp.dot(t_blk, sel,
                                  preferred_element_type=jnp.float32))
        return jnp.concatenate(blocks, axis=0)               # [H·T, 4]

    for g in range(group):
        rows = slice(g * tile, (g + 1) * tile)
        bias_cat = (mask_ref[g].astype(jnp.float32) - 1.0) * 1e30  # [T, Wc]
        bias_st = jnp.concatenate([bias_cat] * heads, axis=0)
        kcat = jnp.concatenate(
            [ks[g * r + k][:] for k in range(window)], axis=0)  # [Wcols, HC]
        vcat = jnp.concatenate(
            [vs[g * r + k][:] for k in range(window)], axis=0)
        # per-head logit matmuls, stacked rows
        full = jnp.concatenate([
            jnp.dot(q_ref[rows, h * c:(h + 1) * c],
                    kcat[:, h * c:(h + 1) * c].T,
                    preferred_element_type=jnp.float32,
                    precision=prec)
            for h in range(heads)
        ], axis=0) * scale                                   # [H·T, Wcols]
        full = full + bias_st
        if geo:
            dist_st = jnp.concatenate([feat_ref[g, 0]] * heads, axis=0)
            invd_st = jnp.concatenate([feat_ref[g, 1]] * heads, axis=0)
            pos_cat = jnp.concatenate(
                [poss[g * r + k][:].astype(jnp.float32)
                 for k in range(window)], axis=0)            # [Wcols, 4]
            pos_c = jnp.concatenate(
                [poss[g * r + k0 + j][:].astype(jnp.float32)
                 for j in range(r)], axis=0)                 # [T, 4]
            pos_c_st = jnp.concatenate([pos_c] * heads, axis=0)
            qd = _stack4(qw_ref, rows) * scale               # [H·T, 4]
            qself = jnp.sum(qd * pos_c_st, axis=1, keepdims=True)
            qpos = jnp.dot(qd, pos_cat.T,
                           preferred_element_type=jnp.float32,
                           precision=prec)                   # [H·T, Wcols]
            full = full + (qself - qpos) * invd_st \
                + qd[:, 3:4] * dist_st
        m = jnp.maximum(jnp.max(full, axis=1, keepdims=True), -1e30)
        e = jnp.exp(full - m)
        e = jnp.where(full <= -1e29, 0.0, e)
        denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
        inv = 1.0 / denom                                    # [H·T, 1]
        if mean_expand:
            g_hs = [g_ref[rows].astype(jnp.float32) * (1.0 / heads)
                    ] * heads
        else:
            g_hs = [g_ref[rows, h * c:(h + 1) * c].astype(jnp.float32)
                    for h in range(heads)]
        dp = jnp.concatenate([
            jnp.dot(_mm_cast(g_hs[h], dt), vcat[:, h * c:(h + 1) * c].T,
                    preferred_element_type=jnp.float32, precision=prec)
            for h in range(heads)
        ], axis=0)                                           # [H·T, Wcols]
        if has_gs:
            gs4 = _stack4(gs_ref, rows)                      # [H·T, 4]
            gs_self = jnp.sum(gs4 * pos_c_st, axis=1, keepdims=True)
            gsp = jnp.dot(gs4, pos_cat.T,
                          preferred_element_type=jnp.float32,
                          precision=prec)
            dp = dp + (gs_self - gsp) * invd_st + gs4[:, 3:4] * dist_st
        if dropout_rate > 0:
            sv = seed_ref[0] + pl.program_id(0) * group + g
            _prng_seed(sv)
            # replay the forward's per-head draw order, stacked
            keep = jnp.concatenate([
                _dropout_bits((tile, e.shape[1]), sv, draw=h)
                >= _dropout_thresh(dropout_rate)
                for h in range(heads)
            ], axis=0)
            e_d = jnp.where(keep, e * inv_keep, 0.0)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        else:
            e_d = e
        g_ss = [g_hs[h] * inv[h * tile:(h + 1) * tile] for h in range(heads)]
        rs = jnp.sum(e * dp, axis=1, keepdims=True) * inv
        dl = (e * ((dp - rs) * inv)) * scale                 # [H·T, Wcols]
        if project:
            # zero every contribution of the flush-only extra grid step
            # (clamped inputs, shifted dropout seed): dl covers dq/dk/dqw,
            # g_ss covers dv
            dl = dl * vf
            g_ss = [gs_ * vf for gs_ in g_ss]
        dq_cols = []
        dk_blocks = [[] for _ in range(window)]
        dv_blocks = [[] for _ in range(window)]
        for h in range(heads):
            hrows = slice(h * tile, (h + 1) * tile)
            dq_cols.append(jnp.dot(
                _mm_cast(dl[hrows], dt), kcat[:, h * c:(h + 1) * c],
                preferred_element_type=jnp.float32, precision=prec))
            for k in range(window):
                cols = slice(k * sub, (k + 1) * sub)
                dk_blocks[k].append(jnp.dot(
                    _mm_cast(dl[hrows, cols], dt).T,
                    q_ref[rows, h * c:(h + 1) * c]
                    if dt == jnp.bfloat16
                    else q_ref[rows, h * c:(h + 1) * c].astype(jnp.float32),
                    preferred_element_type=jnp.float32, precision=prec))
                dv_blocks[k].append(jnp.dot(
                    _mm_cast(e_d[hrows, cols], dt).T, _mm_cast(g_ss[h], dt),
                    preferred_element_type=jnp.float32, precision=prec))
        if project:
            for k in range(window):
                j = g * r + k
                bk_ = jnp.concatenate(dk_blocks[k], axis=1)  # [sub, HC] f32
                bv_ = jnp.concatenate(dv_blocks[k], axis=1)
                local_k[j] = bk_ if local_k[j] is None else local_k[j] + bk_
                local_v[j] = bv_ if local_v[j] is None else local_v[j] + bv_
        else:
            dq_ref[rows] = jnp.concatenate(
                dq_cols, axis=1).astype(dq_ref.dtype)
            dk_ref[g] = jnp.stack(
                [jnp.concatenate(bs, axis=1) for bs in dk_blocks], axis=0
            ).astype(dk_ref.dtype)
            dv_ref[g] = jnp.stack(
                [jnp.concatenate(bs, axis=1) for bs in dv_blocks], axis=0
            ).astype(dv_ref.dtype)
        if geo:
            # dqw via the stacked factorization: one [H·T, Wcols] plane
            # pass + one stacked K=4 matmul
            u = dl * invd_st
            t13u = jnp.dot(u, pos_cat,
                           preferred_element_type=jnp.float32,
                           precision=prec)                   # [H·T, 4]
            t0u = jnp.sum(u, axis=1, keepdims=True)
            dqw3 = jnp.sum(dl * dist_st, axis=1, keepdims=True)
            dqw_cols = []
            for h in range(heads):
                hrows = slice(h * tile, (h + 1) * tile)
                dqw_cols.append(jnp.concatenate(
                    [(pos_c * t0u[hrows] - t13u[hrows])[:, :3],
                     dqw3[hrows]], axis=1))                  # [T, 4]
            if not project:
                dqw_ref[rows] = jnp.concatenate(
                    dqw_cols, axis=1).astype(dqw_ref.dtype)
        if project:
            # receiver-side epilogue: fold dqw through wblk into dq, then
            # project dq in VMEM (dxq = dq·Wqᵀ, dWq += xᵀ·dq, dbq += Σdq,
            # dwblk += qᵀ·dqw) — dq/dqw never exist in HBM
            x_dir = jnp.concatenate(
                [xs[g * r + k0 + j][:] for j in range(r)], axis=0)  # [T, F]
            dqf_cols = []
            for h in range(heads):
                wblk_h = wblk_ref[h * c:(h + 1) * c,
                                  h * 4:(h + 1) * 4].astype(jnp.float32)
                dq_h = dq_cols[h]
                if geo:
                    dq_h = dq_h + jnp.dot(
                        dqw_cols[h], wblk_h.T,
                        preferred_element_type=jnp.float32)
                    dwblk_ref[h * c:(h + 1) * c, h * 4:(h + 1) * 4] += (
                        jax.lax.dot_general(
                            q_ref[rows, h * c:(h + 1) * c].astype(
                                jnp.float32),
                            dqw_cols[h], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32))
                dqf_cols.append(dq_h)
            dq_full = jnp.concatenate(dqf_cols, axis=1).astype(dt)  # [T, HC]

            @pl.when(pid < n_real)
            def _store_dxq(g=g, dq_full=dq_full):
                dxq_ref[g * tile:(g + 1) * tile] = jax.lax.dot_general(
                    dq_full, wq_ref[:], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                ).astype(dxq_ref.dtype)

            dwq_ref[...] += jax.lax.dot_general(
                x_dir, dq_full, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            dbq_ref[...] += jnp.dot(
                jnp.ones((8, tile), dt), dq_full,
                preferred_element_type=jnp.float32, precision=prec)
    if project:
        # sender-side epilogue: merge the carries, finalize G·r sub-blocks
        # of dk/dv and project them (see banded_gat_bwd's project mode)
        cin_k = carry_k_ref[...]
        cin_v = carry_v_ref[...]
        for m in range(carry_subs):
            bk_ = jnp.where(pid == 0, 0.0, cin_k[m * sub:(m + 1) * sub])
            bv_ = jnp.where(pid == 0, 0.0, cin_v[m * sub:(m + 1) * sub])
            local_k[m] = bk_ if local_k[m] is None else local_k[m] + bk_
            local_v[m] = bv_ if local_v[m] is None else local_v[m] + bv_
        hc_all = q_ref.shape[1]
        for j in range(n_local):
            if local_k[j] is None:
                local_k[j] = jnp.zeros((sub, hc_all), jnp.float32)
            if local_v[j] is None:
                local_v[j] = jnp.zeros((sub, hc_all), jnp.float32)
        dk_win = jnp.concatenate(
            [local_k[j] for j in range(n_fin)], axis=0).astype(dt)
        dv_win = jnp.concatenate(
            [local_v[j] for j in range(n_fin)], axis=0).astype(dt)
        x_win = jnp.concatenate(
            [xs[j][:] for j in range(n_fin)], axis=0)
        dxkv_ref[...] = (jax.lax.dot_general(
            dk_win, wk_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
            + jax.lax.dot_general(
                dv_win, wv_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        ).astype(dxkv_ref.dtype)
        dwk_ref[...] += jax.lax.dot_general(
            x_win, dk_win, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        dwv_ref[...] += jax.lax.dot_general(
            x_win, dv_win, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        ones8 = jnp.ones((8, n_fin * sub), dt)
        dbk_ref[...] += jnp.dot(ones8, dk_win,
                                preferred_element_type=jnp.float32,
                                precision=prec)
        dbv_ref[...] += jnp.dot(ones8, dv_win,
                                preferred_element_type=jnp.float32,
                                precision=prec)
        carry_k_ref[...] = jnp.concatenate(
            [local_k[n_fin + m] for m in range(carry_subs)], axis=0)
        carry_v_ref[...] = jnp.concatenate(
            [local_v[n_fin + m] for m in range(carry_subs)], axis=0)


# ---------------------------------------------------- Transformer backward
def _tr_bwd_kernel(*refs, window, heads, scale, edge_dim, has_gs, group, sub,
                   dropout_rate=0.0, mean_expand=False, geo=False):
    i = 0
    if dropout_rate > 0:
        seed_ref = refs[i]; i += 1
    mask_ref = refs[i]; i += 1                   # [G, T, Wcols]
    tile = mask_ref.shape[1]
    r = tile // sub
    span = group * r + window - r
    k0 = (window - r) // 2
    q_ref = refs[i]; i += 1                      # [G·T, HC]
    ks = refs[i:i + span]; i += span             # span × [sub, HC]
    vs = refs[i:i + span]; i += span
    poss = None
    if geo:
        feat_ref = refs[i]; i += 1   # [G, 2, T, Wcols] (dist, 1/dist)
        qw_ref = refs[i]; i += 1     # [G·T, H*4]
        poss = refs[i:i + span]; i += span       # span × [sub, 4]
    elif edge_dim:
        feat_ref = refs[i]; i += 1   # [G, D_e, T, Wcols]
        qw_ref = refs[i]; i += 1     # [G·T, H*D_e]
    g_ref = refs[i]; i += 1
    gs_ref = refs[i] if has_gs else None
    i += 1 if has_gs else 0
    dq_ref = refs[i]; i += 1
    dk_ref, dv_ref = refs[i], refs[i + 1]; i += 2
    dqw_ref = refs[i] if edge_dim else None

    c = q_ref.shape[1] // heads
    from .banded import _mm_cast, _prec

    prec = _prec(ks[0].dtype)
    dt = ks[0].dtype
    if dropout_rate > 0:
        from .banded import (
            _dropout_bits, _dropout_thresh, _prng_seed,
        )

        inv_keep = 1.0 / (1.0 - dropout_rate)
    for g in range(group):
        rows = slice(g * tile, (g + 1) * tile)
        # int8 0/1 mask → additive bias, once for all heads
        bias_cat = (mask_ref[g].astype(jnp.float32) - 1.0) * 1e30  # [T, Wc]
        kcat = jnp.concatenate(
            [ks[g * r + k][:] for k in range(window)], axis=0)  # [Wcols, HC]
        vcat = jnp.concatenate(
            [vs[g * r + k][:] for k in range(window)], axis=0)
        if geo:
            # factorized geometric planes (see banded._transformer_kernel)
            dist_cat = feat_ref[g, 0]                            # [T, Wcols]
            invd_cat = feat_ref[g, 1]
            pos_cat = jnp.concatenate(
                [poss[g * r + k][:].astype(jnp.float32)
                 for k in range(window)], axis=0)                # [Wcols, 4]
            pos_c = jnp.concatenate(
                [poss[g * r + k0 + j][:].astype(jnp.float32)
                 for j in range(r)], axis=0)                     # [T, 4]
        if dropout_rate > 0:
            sv = seed_ref[0] + pl.program_id(0) * group + g
            _prng_seed(sv)
        dq_cols, dqw_cols = [], []
        dk_blocks = [[] for _ in range(window)]
        dv_blocks = [[] for _ in range(window)]
        for h in range(heads):
            q = q_ref[rows, h * c:(h + 1) * c]
            if mean_expand:
                # head-mean cotangent: every head receives g/H (see GAT bwd)
                g_h = g_ref[rows].astype(jnp.float32) * (1.0 / heads)
            else:
                g_h = g_ref[rows, h * c:(h + 1) * c].astype(jnp.float32)
            full = jnp.dot(q, kcat[:, h * c:(h + 1) * c].T,
                           preferred_element_type=jnp.float32,
                           precision=prec) * scale               # [T, Wcols]
            if edge_dim and not geo:
                for d in range(edge_dim):
                    qw_d = qw_ref[rows, h * edge_dim + d][:, None]
                    full += (qw_d * scale) * feat_ref[g, d]
            full = full + bias_cat
            dp = jnp.dot(_mm_cast(g_h, dt), vcat[:, h * c:(h + 1) * c].T,
                         preferred_element_type=jnp.float32,
                         precision=prec)                         # [T, Wcols]
            if has_gs and not geo:
                for d in range(edge_dim):
                    gs_d = gs_ref[rows, h * edge_dim + d][:, None]
                    dp += gs_d.astype(jnp.float32) * feat_ref[g, d]
            if geo:
                qd = qw_ref[rows, h * 4:(h + 1) * 4].astype(
                    jnp.float32) * scale                         # [T, 4]
                qself = jnp.sum(qd * pos_c, axis=1, keepdims=True)
                qpos = jnp.dot(qd, pos_cat.T,
                               preferred_element_type=jnp.float32,
                               precision=prec)
                full = full + (qself - qpos) * invd_cat \
                    + qd[:, 3:4] * dist_cat
            m = jnp.maximum(jnp.max(full, axis=1, keepdims=True), -1e30)
            e = jnp.exp(full - m)
            e = jnp.where(full <= -1e29, 0.0, e)
            denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
            # normalization deferred (see _gat_bwd_kernel): p never formed
            inv = 1.0 / denom                                # [T, 1]
            g_s = g_h * inv   # row-scaled cotangent for the dv matmuls
            if has_gs and geo:
                # Σ_d gs_d·feat_d factorized like the forward logit term
                gs4 = gs_ref[rows, h * 4:(h + 1) * 4].astype(jnp.float32)
                gs_self = jnp.sum(gs4 * pos_c, axis=1, keepdims=True)
                gsp = jnp.dot(gs4, pos_cat.T,
                              preferred_element_type=jnp.float32,
                              precision=prec)
                dp = dp + (gs_self - gsp) * invd_cat \
                    + gs4[:, 3:4] * dist_cat
            if dropout_rate > 0:
                keep = _dropout_bits(e.shape, sv, draw=h) >= _dropout_thresh(
                    dropout_rate)
                e_d = jnp.where(keep, e * inv_keep, 0.0)
                dp = jnp.where(keep, dp * inv_keep, 0.0)
            else:
                e_d = e
            rs = jnp.sum(e * dp, axis=1, keepdims=True) * inv
            dl = (e * ((dp - rs) * inv)) * scale  # logit grad incl. 1/√C
            dq_h = jnp.dot(_mm_cast(dl, dt), kcat[:, h * c:(h + 1) * c],
                           preferred_element_type=jnp.float32, precision=prec)
            dqw_h = []
            for k in range(window):
                dl_k = dl[:, k * sub:(k + 1) * sub]
                e_k = e_d[:, k * sub:(k + 1) * sub]
                dk_blocks[k].append(jnp.dot(
                    _mm_cast(dl_k, dt).T,
                    q if dt == jnp.bfloat16 else q.astype(jnp.float32),
                    preferred_element_type=jnp.float32, precision=prec,
                ))
                dv_blocks[k].append(jnp.dot(
                    _mm_cast(e_k, dt).T, _mm_cast(g_s, dt),
                    preferred_element_type=jnp.float32, precision=prec))
            if geo:
                # dqw_d = Σ_jk dl·feat_d — same factorization as the s output
                u = dl * invd_cat
                t13u = jnp.dot(u, pos_cat,
                               preferred_element_type=jnp.float32,
                               precision=prec)                   # [T, 4]
                t0u = jnp.sum(u, axis=1, keepdims=True)
                dqw3 = jnp.sum(dl * dist_cat, axis=1, keepdims=True)
                dqw_cols.append(jnp.concatenate(
                    [(pos_c * t0u - t13u)[:, :3], dqw3], axis=1))  # [T, 4]
            elif edge_dim:
                for d in range(edge_dim):
                    dqw_h.append(jnp.sum(dl * feat_ref[g, d], axis=1,
                                         keepdims=True))
                dqw_cols.append(jnp.concatenate(dqw_h, axis=1))  # [T, D_e]
            dq_cols.append(dq_h)
        dq_ref[rows] = jnp.concatenate(dq_cols, axis=1).astype(dq_ref.dtype)
        dk_ref[g] = jnp.stack(
            [jnp.concatenate(bs, axis=1) for bs in dk_blocks], axis=0
        ).astype(dk_ref.dtype)
        dv_ref[g] = jnp.stack(
            [jnp.concatenate(bs, axis=1) for bs in dv_blocks], axis=0
        ).astype(dv_ref.dtype)
        if edge_dim:
            dqw_ref[rows] = jnp.concatenate(
                dqw_cols, axis=1).astype(dqw_ref.dtype)


def banded_transformer_bwd(
    bias_noself, q, k, v, g, heads,
    edge_band=None, qw=None, gs=None,
    dropout_rate=0.0, seed=None,
    mean_expand=False,
    geo_band=None, pos=None,
    raw_kv_partials=False,
    project_x=None, project_wq=None, project_wk=None, project_wv=None,
    project_wblk=None,
):
    """Fused backward of the (optionally edge-conditioned) transformer forward.

    ``g`` is the cotangent of the attention output; ``gs`` (when edge
    conditioning is on) the cotangent of the weighted-edge-feature output
    ``s``.  ``geo_band``+``pos`` select the factorized geometric path
    (see ``banded._transformer_kernel``).  Returns (dq, dk, dv) or
    (dq, dk, dv, dqw).  With the ``project_*`` arguments (geo path only)
    the q/k/v projection backward runs INSIDE the kernel (carry-based
    direct dk/dv — see ``banded_gat_bwd``) and the return becomes
    ``(dx, dwq, dwk, dwv, dbq, dbk, dbv, dwblk)``.
    """
    from .banded import _choose_group, _clamped_window_specs, _seed_inputs

    n_tiles, tile, width = bias_noself.shape
    sub = tile // 2
    w_sub = width // sub
    r = tile // sub
    hc = q.shape[1]
    c = hc // heads
    n = q.shape[0]
    geo = geo_band is not None
    edge_dim = 4 if geo else (
        edge_band.shape[1] if edge_band is not None else 0)
    n_planes = 2 if geo else edge_dim
    from .banded import TR_BWD_STACKED
    project = project_x is not None
    assert not project or geo, "in-kernel projection requires the geo path"
    stacked = project or (TR_BWD_STACKED and (geo or edge_dim == 0))
    f = project_x.shape[1] if project else 0
    group = _choose_group(
        n_tiles, w_sub, tile, sub=sub,
        feat_bytes=(2 * hc * q.dtype.itemsize + 2 * hc * 4
                    + (4 * 4 if geo else 0)    # windowed [sub, 4] pos
                    + (f * q.dtype.itemsize if project else 0)),
        extra_in_bytes_per_tile=(
            2 * hc * q.dtype.itemsize           # direct q and g tiles
            + n_planes * width * 4              # f32 edge/geo planes
            + 2 * heads * edge_dim * 4          # qw + gs tiles
        ),
        # output side: dk/dv window partials — or, with in-kernel
        # projection, the two dx streams
        extra_out_bytes_per_tile=(
            2 * f * q.dtype.itemsize if project
            else 2 * (width // tile) * hc * q.dtype.itemsize
            + heads * edge_dim * 4),
        # f32 scratch includes the kcat/vcat window concatenations (see the
        # forward wrapper) — the geo backward at HC=256 measures 17.4 MB
        # scoped VMEM at the group the old estimate picked (hard limit 16);
        # the project carries/accumulators add ~4·hc·(f+sub) f32
        scratch_bytes_per_tile=(
            (3 * heads * tile * width + 2 * width * hc) * 4
            if q.dtype == jnp.float32 else 0)
        + (4 * hc * (f + (w_sub - r) * sub) // max(n_tiles // 16, 1)
           if project else 0),
    )
    span = group * r + w_sub - r
    n_real = n_tiles // group
    if project:
        grid = n_real + 1
        dmap = lambda i: (jnp.minimum(i, n_real - 1), 0)  # noqa: E731
        mmap = lambda i: (jnp.minimum(i, n_real - 1), 0, 0)  # noqa: E731
        gmap = lambda i: (jnp.minimum(i, n_real - 1), 0, 0, 0)  # noqa: E731
    else:
        grid = n_real
        dmap = lambda i: (i, 0)  # noqa: E731
        mmap = lambda i: (i, 0, 0)  # noqa: E731
        gmap = lambda i: (i, 0, 0, 0)  # noqa: E731
    extra, extra_specs = [], []
    if geo:
        extra = [geo_band, qw, *([pos] * span)]
        extra_specs = [
            pl.BlockSpec((group, 2, tile, width), gmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * tile, heads * 4), dmap,
                         memory_space=pltpu.VMEM),
            *_clamped_window_specs(w_sub, tile, 4, n_tiles, group, sub),
        ]
    elif edge_dim:
        extra = [edge_band, qw]
        extra_specs = [
            pl.BlockSpec((group, edge_dim, tile, width), gmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * tile, heads * edge_dim), dmap,
                         memory_space=pltpu.VMEM),
        ]
    has_gs = gs is not None
    gs_in, gs_specs = [], []
    if has_gs:
        gs_in = [gs]
        gs_specs = [pl.BlockSpec((group * tile, heads * edge_dim),
                                 dmap, memory_space=pltpu.VMEM)]
    if stacked:
        kernel = functools.partial(
            _tr_bwd_kernel_stacked, window=w_sub, heads=heads,
            scale=1.0 / (c ** 0.5), has_gs=has_gs, group=group, sub=sub,
            dropout_rate=dropout_rate, mean_expand=mean_expand, geo=geo,
            project=project,
        )
    else:
        kernel = functools.partial(
            _tr_bwd_kernel, window=w_sub, heads=heads, scale=1.0 / (c ** 0.5),
            edge_dim=edge_dim, has_gs=has_gs, group=group, sub=sub,
            dropout_rate=dropout_rate, mean_expand=mean_expand, geo=geo,
        )
    g_feat = c if mean_expand else hc
    seed_in, seed_specs = _seed_inputs(dropout_rate, seed)
    proj_in, proj_in_specs = [], []
    scratch_shapes = []
    if project:
        proj_in = [*([project_x] * span), project_wq, project_wk,
                   project_wv, project_wblk]
        proj_in_specs = [
            *_clamped_window_specs(w_sub, tile, f, n_tiles, group, sub),
            pl.BlockSpec((f, hc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, hc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, hc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, heads * 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = [
            pl.BlockSpec((group * tile, f), dmap,
                         memory_space=pltpu.VMEM),               # dxq
            pl.BlockSpec((group * tile, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),               # dxkv
            *[pl.BlockSpec((f, hc), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)] * 3,        # dW q/k/v
            *[pl.BlockSpec((8, hc), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)] * 3,        # db q/k/v
            pl.BlockSpec((hc, heads * 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),               # dwblk
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n, f), project_x.dtype),
            jax.ShapeDtypeStruct((grid * group * tile, f), project_x.dtype),
            *[jax.ShapeDtypeStruct((f, hc), jnp.float32)] * 3,
            *[jax.ShapeDtypeStruct((8, hc), jnp.float32)] * 3,
            jax.ShapeDtypeStruct((hc, heads * 4), jnp.float32),
        ]
        scratch_shapes = [
            pltpu.VMEM(((w_sub - r) * sub, hc), jnp.float32),
            pltpu.VMEM(((w_sub - r) * sub, hc), jnp.float32),
        ]
    else:
        out_specs = [
            pl.BlockSpec((group * tile, hc), dmap,
                         memory_space=pltpu.VMEM),
            _part_spec(w_sub, sub, hc, group),
            _part_spec(w_sub, sub, hc, group),
        ]
        out_shape = [
            # dq in the primal dtype: every consumer casts it there anyway,
            # and the f32 write+read was the largest stream of the projgrad
            # backward (f32[12288,1024] = 50 MB at the flagship shape)
            jax.ShapeDtypeStruct((n, hc), q.dtype),
            # dk/dv partials in the primal dtype (see banded_gat_bwd)
            jax.ShapeDtypeStruct((n_tiles, w_sub, sub, hc), k.dtype),
            jax.ShapeDtypeStruct((n_tiles, w_sub, sub, hc), v.dtype),
        ]
        if edge_dim:
            out_specs.append(
                pl.BlockSpec((group * tile, heads * edge_dim), dmap,
                             memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((n, heads * edge_dim), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            *seed_specs,
            pl.BlockSpec((group, tile, width), mmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * tile, hc), dmap,
                         memory_space=pltpu.VMEM),
            *_clamped_window_specs(w_sub, tile, hc, n_tiles, group, sub),
            *_clamped_window_specs(w_sub, tile, hc, n_tiles, group, sub),
            *extra_specs,
            pl.BlockSpec((group * tile, g_feat), dmap,
                         memory_space=pltpu.VMEM),
            *gs_specs,
            *proj_in_specs,
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=8 * n_tiles * heads * tile * width * c,
            bytes_accessed=bias_noself.size * bias_noself.dtype.itemsize
            + 3 * (w_sub // r + 1) * q.size * 4,
            transcendentals=n_tiles * heads * tile * width,
        ),
        interpret=_use_interpret(),
    )(*seed_in, bias_noself, q, *([k] * span), *([v] * span), *extra,
      g, *gs_in, *proj_in)
    if project:
        (dxq, dxkv, dwq, dwk, dwv, dbq, dbk, dbv, dwblk) = outs
        k0 = (w_sub - r) // 2
        dx = dxq + jax.lax.slice_in_dim(
            dxkv, k0 * sub, k0 * sub + n, axis=0)
        return dx, dwq, dwk, dwv, dbq[0], dbk[0], dbv[0], dwblk
    dq = outs[0].astype(q.dtype)
    if raw_kv_partials:
        # caller folds (fold_project_bwd fuses the fold with the k/v
        # projection backward so dk/dv never exist in HBM)
        if edge_dim:
            return dq, outs[1], outs[2], outs[3].astype(qw.dtype)
        return dq, outs[1], outs[2]
    dk = (fold_partials(outs[1], tile, out_dtype=k.dtype)
          if outs[1].shape[-1] >= 128
          else combine_partials(outs[1], tile).astype(k.dtype))
    dv = (fold_partials(outs[2], tile, out_dtype=v.dtype)
          if outs[2].shape[-1] >= 128
          else combine_partials(outs[2], tile).astype(v.dtype))
    if edge_dim:
        return dq, dk, dv, outs[3].astype(qw.dtype)
    return dq, dk, dv
