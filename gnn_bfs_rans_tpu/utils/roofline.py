"""Analytic FLOP/byte accounting, MFU, and roofline sanity guards.

Anchors every benchmark number to hardware limits (VERDICT round 3, items
1 & 5): each measured config reports

* ``matmul_flops`` — *algorithmic* (ideal) multiply-accumulate work, counted
  analytically from N/E/H/heads/layers.  This is the "model FLOPs" convention
  (as in MFU papers): padded-window overcompute inside the Pallas kernels is
  deliberately NOT counted, so MFU measures useful work per second.
* ``mfu`` — matmul_flops / time / chip peak (bf16 peak; see DEVICE_PEAKS).
* ``bound`` — which roofline wall (MXU / HBM) is closer to the measured time.

It also provides the measurement-sanity guard the round-3 bench artifact
lacked: a measured time *below* ``matmul_flops / peak`` is physically
impossible and means the harness resolution collapsed (the failure mode of
``BENCH_r03.json``) — ``check_roofline`` raises in that case.

The reference publishes no FLOP accounting at all (SURVEY.md §6); peaks are
public figures for the TPU generations jax exposes via ``device_kind``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


# Public per-chip peaks: (bf16 matmul FLOP/s, HBM bytes/s).
# Keys are matched as lowercase substrings of jax's ``device_kind``.
DEVICE_PEAKS: dict[str, tuple[float, float]] = {
    "v5 lite": (197e12, 819e9),   # v5e ("TPU v5 lite")
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v5": (459e12, 2765e9),       # plain "v5" → assume v5p (after lite/e checks)
    "v4": (275e12, 1228e9),
    "v6": (918e12, 1640e9),       # Trillium
    "v6e": (918e12, 1640e9),
}


@dataclasses.dataclass(frozen=True)
class DevicePeak:
    kind: str
    flops: float | None   # bf16 matmul peak, FLOP/s (None: unknown device/CPU)
    hbm: float | None     # HBM bandwidth, bytes/s


def device_peak(device=None) -> DevicePeak:
    """Look up the peak specs of ``device`` (default: ``jax.devices()[0]``)."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", str(device)).lower()
    if device.platform == "tpu":
        # check the most specific substrings first ("v5 lite" before "v5")
        for key in ("v5 lite", "v5e", "v6e", "v6", "v5p", "v4", "v5"):
            if key in kind and key in DEVICE_PEAKS:
                flops, hbm = DEVICE_PEAKS[key]
                return DevicePeak(kind, flops, hbm)
    return DevicePeak(kind, None, None)  # CPU / unknown: no guard possible


def _mm(m: int, k: int, n: int) -> float:
    """FLOPs of an [m,k]@[k,n] matmul (multiply+add counted separately)."""
    return 2.0 * m * k * n


def forward_matmul_flops(
    layer_type: str,
    num_layers: int,
    hidden_dim: int,
    n_nodes: int,
    n_edges: int,
    heads: int = 4,
    input_dim: int = 3,
    output_dim: int = 7,
    edge_dim: int = 4,
    use_edge_attr: bool = True,
) -> float:
    """Algorithmic matmul FLOPs of one FlowGNN forward pass.

    Counts only O(N·H²)/O(E·H) multiply-accumulate work (MXU-shaped);
    softmax/LeakyReLU/BN elementwise passes are VPU work and excluded — this
    matches the "model FLOPs" convention so MFU compares across backends.
    Formulas follow models/flow_gnn.py + models/convs.py exactly:

    * input projection  Linear(input_dim→H)
    * per layer, by conv type (heads=Hd, features=C=H):
        GCN:  proj N·H·H; aggregation (E+N self-loop) edge MACs of width H
        GAT:  proj N·H·(Hd·C); α matmul N·(Hd·C)·(2·Hd);
              weighted value aggregation over (E + N self-loops) per head
        GIN:  aggregation E·H; 2-layer MLP N·(H·H + H·H)
        Transformer: q/k/v projections 3·N·H·(Hd·C); skip N·H·C;
              qw N·(Hd·C)·(Hd·De); edge keys/values E·De·(Hd·C) when
              edge-conditioned; qk dots E·Hd·C; value agg E·Hd·C;
              edge-term collapse N·(Hd·De)·C
    * output MLP H→H→H→H/2→output_dim (flow_gnn.py out_0..out_3)
    """
    n, e, h, hd = float(n_nodes), float(n_edges), float(hidden_dim), float(heads)
    c = h  # per-head feature width equals hidden_dim in every conv here
    total = _mm(n, input_dim, h)

    if layer_type == "GCN":
        per_layer = _mm(n, h, h) + 2.0 * (e + n) * h
    elif layer_type == "GAT":
        per_layer = (
            _mm(n, h, hd * c)
            + _mm(n, hd * c, 2 * hd)
            + 2.0 * (e + n) * hd * c      # attention-weighted aggregation
        )
    elif layer_type == "GIN":
        per_layer = 2.0 * e * h + _mm(n, h, h) + _mm(n, h, h)
    elif layer_type == "Transformer":
        per_layer = (
            3.0 * _mm(n, h, hd * c)       # q, k, v
            + _mm(n, h, c)                # root/skip weight (concat=False)
            + 2.0 * e * hd * c            # q·k logits
            + 2.0 * e * hd * c            # attention-weighted value agg
        )
        if use_edge_attr:
            per_layer += (
                _mm(n, hd * c, hd * edge_dim)   # qw block matmul
                + 2.0 * e * edge_dim * hd * c   # k/v edge conditioning
                + _mm(n, hd * edge_dim, c)      # edge-term head-mean collapse
            )
    else:
        raise ValueError(f"unknown layer_type {layer_type!r}")

    total += num_layers * per_layer
    total += (
        _mm(n, h, h) + _mm(n, h, h) + _mm(n, h, h / 2)
        + _mm(n, h / 2, output_dim)
    )
    return total


def train_matmul_flops(*args: Any, **kwargs: Any) -> float:
    """Matmul FLOPs of one training step ≈ 3× forward.

    Standard convention: the backward of every matmul is two matmuls of the
    same shape (grad-input, grad-weight).  The fused-projection GAT VJP adds
    one re-projection per layer but drops the stored-z read — within the 3×
    approximation's noise; documented rather than modeled.
    """
    return 3.0 * forward_matmul_flops(*args, **kwargs)


def hbm_bytes_estimate(
    layer_type: str,
    num_layers: int,
    hidden_dim: int,
    n_nodes: int,
    param_count: int,
    bytes_per_el: int = 2,
    graph_bytes: int = 0,
    mode: str = "forward",
) -> float:
    """Coarse HBM traffic estimate for one step (documentation-grade).

    Per layer the activation stream reads/writes x [N,H] a handful of times
    (conv in/out, residual, BN, ReLU+dropout ≈ 6 passes fused by XLA into
    ~3 read+write pairs); parameters and static graph/band arrays are read
    once.  Backward roughly doubles activation traffic and adds a parameter
    write.  This feeds the ``bound`` classification only — not a guard.
    """
    act = 6.0 * n_nodes * hidden_dim * bytes_per_el * num_layers
    par = 4.0 * param_count
    tot = act + par + graph_bytes
    if mode == "train":
        tot = 2.0 * tot + 4.0 * param_count
    return tot


def xla_bytes_accessed(compiled) -> float | None:
    """Total HBM bytes accessed per execution, from XLA's cost model.

    ``compiled`` is a ``jax.stages.Compiled`` (``jit(f).lower(...).compile()``).
    This is XLA's per-op analytic traffic (operands + outputs at HBM, after
    fusion), not a runtime counter — but it reflects the actual compiled
    op graph, unlike :func:`hbm_bytes_estimate`'s passes-per-layer guess.
    Returns None when the backend exposes no cost analysis.
    """
    try:
        ca = compiled.cost_analysis()
    except Exception:  # noqa: BLE001 — optional feature across backends
        return None
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    val = (ca or {}).get("bytes accessed")
    return float(val) if val is not None else None


def graph_static_bytes(graph) -> int:
    """Actual bytes of the device-resident graph (incl. band planes)."""
    total = 0
    for leaf in jax.tree.leaves(graph):
        if hasattr(leaf, "nbytes"):
            total += int(leaf.nbytes)
    return total


def analyze(
    *,
    layer_type: str,
    num_layers: int,
    hidden_dim: int,
    n_nodes: int,
    n_edges: int,
    time_s: float,
    mode: str = "forward",
    heads: int = 4,
    param_count: int = 0,
    graph_bytes: int = 0,
    use_edge_attr: bool = True,
    device=None,
    bytes_measured: float | None = None,
) -> dict:
    """Full roofline report for one measured config; JSON-able.

    ``bytes_measured`` (from :func:`xla_bytes_accessed`) grounds the
    HBM side of the ``bound`` classification in the compiled op graph's
    actual traffic; the passes-per-layer estimate is still reported for
    comparison (``hbm_bytes_est``) but no longer decides the label when a
    measurement is present (VERDICT r4 weak item 5).
    """
    kw = dict(
        layer_type=layer_type, num_layers=num_layers, hidden_dim=hidden_dim,
        n_nodes=n_nodes, n_edges=n_edges, heads=heads,
        use_edge_attr=use_edge_attr,
    )
    flops = (train_matmul_flops(**kw) if mode == "train"
             else forward_matmul_flops(**kw))
    bytes_est = hbm_bytes_estimate(
        layer_type, num_layers, hidden_dim, n_nodes, param_count,
        graph_bytes=graph_bytes, mode=mode,
    )
    peak = device_peak(device)
    out = {
        "matmul_flops": flops,
        "hbm_bytes_est": bytes_est,
        "flops_per_sec": flops / time_s,
        "device_kind": peak.kind,
    }
    # XLA's bytes-accessed counts every DECLARED kernel block: the Pallas
    # sliding-window specs declare W overlapping feature blocks per grid
    # step, so window reuse is overcounted ~W× and the implied bandwidth
    # can exceed the chip's (measured up to 3× peak on the GCN forward) —
    # physically impossible as actual traffic.  Treat it as an upper bound:
    # it grounds the label only when it is feasible within bw×time;
    # otherwise the label falls back to the analytic estimate and the
    # overcount is flagged.
    hbm_bytes = bytes_est
    if bytes_measured is not None:
        out["hbm_bytes_xla"] = bytes_measured
        feasible = peak.hbm is None or (
            bytes_measured <= 1.05 * peak.hbm * time_s
        )
        out["xla_bytes_overcount"] = not feasible
        if feasible:
            hbm_bytes = bytes_measured
            out["bytes_basis"] = "xla_cost_analysis"
        else:
            out["bytes_basis"] = "estimate (xla upper bound infeasible)"
    else:
        out["bytes_basis"] = "estimate"
    if peak.flops:
        t_mxu = flops / peak.flops
        t_hbm = hbm_bytes / peak.hbm
        out["mfu"] = flops / time_s / peak.flops
        out["hbm_frac"] = hbm_bytes / time_s / peak.hbm
        out["hbm_frac_est"] = bytes_est / time_s / peak.hbm
        # a frac > 1 means the byte model overcounts (the measured time is
        # below the model's bandwidth floor) — the op is running AT the
        # bandwidth wall with less true traffic than modeled; flagged for
        # transparency, and the hbm label is then read as "at the wall"
        out["byte_model_infeasible"] = bool(out["hbm_frac"] > 1.05)
        out["roofline_min_s"] = max(t_mxu, t_hbm)
        out["bound"] = "mxu" if t_mxu >= t_hbm else "hbm"
        if out["mfu"] > 0.6 and out["hbm_frac"] > 0.6:
            out["bound"] = "mixed"
        elif out["mfu"] < 0.25 and out["hbm_frac"] < 0.25:
            # neither wall explains the time → VPU passes / kernel overhead
            out["bound"] = "vpu/glue"
    else:
        out["mfu"] = None
        out["bound"] = "unknown"
    return out


def check_roofline(matmul_flops: float, time_s: float, device=None,
                   slack: float = 1.05) -> None:
    """Raise if a measurement implies more than chip-peak FLOP throughput.

    The guard BENCH_r03.json lacked: 41 µs for a ~10⁺-GFLOP forward implies
    >peak FLOP/s — physically impossible, so the *measurement* is wrong.
    ``slack`` absorbs peak-spec rounding.  No-op on CPU/unknown devices.
    """
    peak = device_peak(device)
    if peak.flops is None:
        return
    rate = matmul_flops / max(time_s, 1e-12)
    if rate > peak.flops * slack:
        raise RuntimeError(
            f"roofline violation: measured {rate/1e12:.1f} TFLOP/s exceeds "
            f"{peak.kind} peak {peak.flops/1e12:.0f} TFLOP/s — the timing "
            f"harness is under-resolved (see VERDICT round 3, item 1); "
            f"time={time_s*1e6:.1f} µs for {matmul_flops/1e9:.2f} GFLOP"
        )
