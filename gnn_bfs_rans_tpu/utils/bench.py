"""Benchmark harness: edge-messages/sec/chip with honest device timing.

Metric (BASELINE.json): one "edge message" = one edge processed by one conv
layer, so a forward emits ``num_layers × n_edges`` messages.

Round-4 rework (VERDICT round 3, item 1): the r03 harness's marginal-timing
resolution collapsed and recorded a physically impossible number.  This
harness now enforces four defenses:

1. **Full-output consumption** — the chain feedback reduces the WHOLE output
   (``jnp.sum``), so no part of the model (output MLP, BN glue) is sliceable
   dead code.  (The r03 chain consumed ``out.ravel()[0]`` only.)
2. **Signal ≫ noise** — base=8/reps=64/trials=5 by default, and reps widen
   automatically until the full-vs-base delta is ≥ ``min_snr``× the observed
   trial spread.
3. **Roofline sanity** — analytic matmul FLOPs (utils.roofline) divided by
   the measured time must not exceed chip peak; a violation raises.
4. **Steady-state cross-check** — an independent back-to-back-dispatch
   measurement (the method trace-validated at 1M cells,
   tools/profile_scale_steady.py); both numbers are reported and a >2×
   disagreement in the impossible direction (steady < chained/2) raises.

Timing methodology — **chained marginal latency**: on remote/tunneled device
runtimes, ``jax.block_until_ready`` can return before compute finishes and
naive per-call loops measure queue depth, not work.  Instead, one jit
computation chains K data-dependent forwards; the marginal cost
``(T(K) − T(base)) / (K − base)`` isolates pure device execution of one
forward, with the host→device round trip cancelled by the subtraction.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch_scalar(out) -> None:
    """Fence: fetch one element (consumption happens *inside* the jit)."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


@dataclasses.dataclass
class MarginalTiming:
    step_s: float
    base: int
    reps: int
    trials: int
    t_base_s: float
    t_full_s: float
    spread_s: float        # max−min over trials at the full rep count
    snr: float             # (t_full − t_base) / spread

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


def _marginal_from_times(
    t_base: float, t_full: float, base: int, reps: int,
    spread: float, trials: int,
) -> MarginalTiming:
    """Form the marginal estimate; refuse a collapsed (≤0) delta."""
    delta = t_full - t_base
    if delta <= 0:
        raise RuntimeError(
            f"bench resolution collapse: T({reps})={t_full:.4f}s ≤ "
            f"T({base})={t_base:.4f}s — the marginal signal is below the "
            f"jitter floor even at reps={reps}; refusing to report"
        )
    return MarginalTiming(
        step_s=delta / (reps - base),
        base=base, reps=reps, trials=trials,
        t_base_s=t_base, t_full_s=t_full, spread_s=spread,
        snr=delta / spread,
    )


def chained_marginal_time(
    apply_fn,
    graph,
    reps: int = 64,
    base: int = 8,
    trials: int = 5,
    min_snr: float = 20.0,
    max_reps: int = 512,
) -> MarginalTiming:
    """Marginal seconds per forward via chained data-dependent calls.

    ``apply_fn(graph) -> out`` must be a pure function of the graph.  The
    chain runs as a ``lax.fori_loop`` whose carry feeds each iteration's
    **full output reduction** back into the next input (scaled by 1e-30 —
    numerically invisible but not constant-foldable), so the device must
    execute ``k`` sequential forwards per call and every output element is
    live; ``(T(reps) − T(base)) / (reps − base)`` cancels both the host
    round trip and the loop setup.  One traced body per k → compile cost is
    k-independent.  Reps double until the delta clears ``min_snr×`` the
    trial spread (the r03 failure was a delta below the jitter floor).

    Off-TPU (local CPU, no tunnel jitter to average away) the widening is
    capped low — interpret-mode kernels are ~1000× slower and the adaptive
    loop would otherwise run for many minutes.
    """
    if jax.default_backend() != "tpu":
        reps = min(reps, 16)
        base = min(base, 2)
        trials = min(trials, 2)
        max_reps = min(max_reps, 32)

    @jax.jit
    def f(g, k):
        def body(_, feat):
            out = apply_fn(dataclasses.replace(g, node_feat=feat))
            # FULL reduction: consumes every output element — nothing is
            # sliceable dead code (VERDICT r3 item 1 / advisor r2)
            dep = jnp.sum(out).astype(feat.dtype) * 1e-30
            return feat + dep

        # dynamic trip count → ONE compiled executable serves every k
        return jax.lax.fori_loop(0, k, body, g.node_feat)

    def timings(k: int) -> list[float]:
        kk = jnp.asarray(k, jnp.int32)
        _fetch_scalar(f(graph, kk))  # warm
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            _fetch_scalar(f(graph, kk))
            ts.append(time.perf_counter() - t0)
        return ts

    while True:
        tb = timings(base)
        tf = timings(reps)
        t_base, t_full = min(tb), min(tf)
        spread = max(max(tf) - min(tf), 1e-9)
        if (t_full - t_base) >= min_snr * spread or reps >= max_reps:
            break
        reps *= 2

    return _marginal_from_times(t_base, t_full, base, reps, spread, trials)


def steady_state_time(
    dispatch_fn,
    steps: int = 64,
    base: int = 8,
    depth: int = 3,
    trials: int = 2,
) -> float:
    """Wall throughput of back-to-back host-driven dispatches.

    ``dispatch_fn(i) -> out`` launches step ``i`` asynchronously and returns
    something fetchable.  A bounded pending queue (``depth``) keeps the
    device busy without overrunning the dispatch tunnel; ``(T(steps) −
    T(base)) / (steps − base)`` subtracts warmup/fence cost.  This is the
    method the 1M-cell per-op trace validated (zero intra-step bubbles,
    wall == device-busy); at very small step times it upper-bounds device
    time by per-dispatch host cost instead — the cross-check logic in
    :func:`run_benchmark` accounts for that asymmetry.
    """

    def burst(n: int) -> float:
        pending = []
        t0 = time.perf_counter()
        for i in range(n):
            pending.append(dispatch_fn(i))
            if len(pending) > depth:
                _fetch_scalar(pending.pop(0))
        for o in pending:
            _fetch_scalar(o)
        return time.perf_counter() - t0

    burst(base)  # warm the dispatch path
    tb = min(burst(base) for _ in range(trials))
    tk = min(burst(steps) for _ in range(trials))
    return max((tk - tb) / (steps - base), 1e-9)


def time_fn(fn, *args, steps: int = 50, warmup: int = 5, chunk: int = 10) -> dict:
    """Wall-time of back-to-back launches fenced by a host fetch.

    Kept for train-step timing where chaining inside one jit isn't practical;
    note this measures launch+execute pipeline throughput, an upper bound on
    per-step cost.
    """

    out = None
    for _ in range(warmup):
        out = fn(*args)
    _fetch_scalar(out)
    rt0 = time.perf_counter()
    _fetch_scalar(out)
    roundtrip = time.perf_counter() - rt0

    n_chunks = max(steps // chunk, 3)
    times = []
    for _ in range(n_chunks):
        t0 = time.perf_counter()
        for _ in range(chunk):
            out = fn(*args)
        _fetch_scalar(out)
        dt = time.perf_counter() - t0 - roundtrip
        times.append(max(dt, 1e-9) / chunk)
    times = np.array(times)
    return {
        "median_s": float(np.median(times)),
        "mean_s": float(times.mean()),
        "p10_s": float(np.percentile(times, 10)),
        "min_s": float(times.min()),
        "steps": steps,
    }


def _cross_check(chained_s: float, steady_s: float | None) -> dict:
    """Reconcile the two timing modes; raise on impossible disagreement.

    Steady-state wall per step can exceed chained marginal time when
    per-dispatch host/tunnel cost dominates a sub-ms step (it is an upper
    bound on device time) — that is reported, not fatal.  Steady-state
    being *less than half* the chained time is impossible (the device cannot
    execute a step faster than its marginal execution time) and means one of
    the measurements is broken.
    """
    if steady_s is None:
        return {"steady_available": False}
    ratio = steady_s / chained_s
    if ratio < 0.5:
        raise RuntimeError(
            f"timing cross-check failed: steady-state {steady_s*1e6:.1f} µs "
            f"is {1/ratio:.1f}× FASTER than chained marginal "
            f"{chained_s*1e6:.1f} µs — physically impossible; one harness "
            f"is under-resolved"
        )
    return {
        "steady_available": True,
        "steady_over_chained": ratio,
        "agreement_2x": bool(ratio <= 2.0),
        # ratio > 2 ⇒ the dispatch path, not the device, limits steady-state
        "steady_dispatch_bound": bool(ratio > 2.0),
    }


def run_benchmark(
    case_path: str = "/root/reference/OpenFOAM-data",
    layer_type: str = "GAT",
    num_layers: int = 4,
    hidden_dim: int = 256,
    backend: str = "pallas",
    steps: int = 64,
    mode: str = "forward",
    baseline_msgs_per_sec: float = 1e8,
    compute_dtype: str = "bfloat16",
    cross_check: bool = True,
    trace: bool = False,
) -> dict:
    """Benchmark a model config on the BFS mesh; returns a JSON-able dict.

    Defaults are the flagship configuration: 4-layer GAT, fused banded Pallas
    attention kernels, bfloat16 compute.  The returned dict carries both
    timing modes, analytic FLOPs, MFU, and the roofline bound class.

    ``trace=True`` additionally captures a per-op device trace (utils.trace)
    of the same step and reports the summed device-lane time — a
    dispatch-independent third witness that stays meaningful at sub-ms step
    times where the steady-state probe measures only tunnel cost.
    """
    from ..graph.band import LAYER_COMPONENTS
    from ..models.flow_gnn import FlowGNN, ModelConfig
    from ..train import TrainConfig, load_dataset
    from ..train.loop import init_state, make_train_step
    from . import roofline

    dataset = load_dataset(
        case_path,
        with_band=(backend == "pallas"),
        band_components=LAYER_COMPONENTS.get(layer_type),
    )
    graph = dataset.graph.to_device()

    mcfg = ModelConfig(
        hidden_dim=hidden_dim,
        num_layers=num_layers,
        layer_type=layer_type,
        backend=backend,
        dropout=0.0 if mode == "forward" else 0.1,
        compute_dtype=compute_dtype,
    )
    tcfg = TrainConfig()
    model = FlowGNN(mcfg)
    state = init_state(model, graph, tcfg, jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(state.params))

    edge_messages = num_layers * graph.n_edges

    steady_s: float | None = None
    launch = None  # single-step dispatcher (steady-state probe + trace)
    compiled = None  # single-step executable (XLA cost analysis)
    if mode == "forward":
        def apply_fn(g):
            return model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                g, train=False,
            )

        timing = chained_marginal_time(apply_fn, graph, reps=max(steps, 64))

        fwd = jax.jit(apply_fn)
        compiled = fwd.lower(graph).compile()
        if cross_check or trace:
            _fetch_scalar(fwd(graph))  # compile
            launch = lambda i: fwd(graph)  # noqa: E731
        if cross_check:
            steady_s = steady_state_time(launch)
    else:
        # Chained-marginal timing for the train step too: K data-dependent
        # steps inside one executable; the marginal cost per step cancels the
        # tunnel round trip (a per-step host fetch would measure ~50 ms of
        # network latency, not the ~ms of device work).
        raw_step = make_train_step(model, tcfg, jit=False)
        targets = jnp.asarray(dataset.targets)
        rng = jax.random.key(1, impl="rbg")  # matches train.Trainer
        lr = jnp.asarray(3e-4, jnp.float32)

        @jax.jit
        def chain(s0, g, tgt, k):
            def body(i, s):
                s2, _ = raw_step(s, g, tgt, lr, jax.random.fold_in(rng, i))
                return s2
            return jax.lax.fori_loop(0, k, body, s0)

        def timings(k: int, trials: int = 5) -> list[float]:
            kk = jnp.asarray(k, jnp.int32)
            out = chain(state, graph, targets, kk)
            _fetch_scalar(out.params["out_3"]["bias"])
            ts = []
            for _ in range(trials):
                t0 = time.perf_counter()
                out = chain(state, graph, targets, kk)
                _fetch_scalar(out.params["out_3"]["bias"])
                ts.append(time.perf_counter() - t0)
            return ts

        base, reps = 8, max(steps, 64)
        while True:
            tb, tf = timings(base), timings(reps)
            t_base, t_full = min(tb), min(tf)
            spread = max(max(tf) - min(tf), 1e-9)
            if (t_full - t_base) >= 20.0 * spread or reps >= 512:
                break
            reps *= 2
        timing = _marginal_from_times(t_base, t_full, base, reps, spread, 5)

        jstep_ca = make_train_step(model, tcfg)
        compiled = jstep_ca.lower(
            state, graph, targets, lr, rng, freeze_pressure=False
        ).compile()
        if cross_check or trace:
            # donation-safe single-step dispatch: thread the state like a
            # real run
            jstep = make_train_step(model, tcfg)
            st = init_state(model, graph, tcfg, jax.random.PRNGKey(0))
            st, l0 = jstep(st, graph, targets, lr, rng)
            _fetch_scalar(l0)
            box = {"state": st}

            def dispatch(i):
                box["state"], loss = jstep(
                    box["state"], graph, targets, lr,
                    jax.random.fold_in(rng, i))
                return loss

            launch = dispatch
        if cross_check:
            steady_s = steady_state_time(launch, steps=32, base=4)

    step_s = timing.step_s
    check = _cross_check(step_s, steady_s)

    trace_info = None
    if trace and launch is not None:
        from . import trace as trace_mod

        tres = trace_mod.trace_steps(launch, n_steps=32)
        device_s = tres["device_total_s_per_step"]
        trace_info = {
            "device_total_s_per_step": device_s,
            # device-lane total vs chained marginal: the two independent
            # methods should agree; >15% disagreement flags a broken harness
            "trace_over_chained": device_s / step_s,
            "agreement_15pct": bool(abs(device_s / step_s - 1.0) <= 0.15),
            **trace_mod.top_ops(tres, n=20),
        }

    # Roofline: analytic FLOPs vs measured time must respect chip peak.
    # HBM side grounded in XLA's compiled-graph bytes-accessed when available.
    bytes_measured = (
        roofline.xla_bytes_accessed(compiled) if compiled is not None else None
    )
    roof = roofline.analyze(
        layer_type=layer_type, num_layers=num_layers, hidden_dim=hidden_dim,
        n_nodes=graph.n_nodes, n_edges=graph.n_edges, time_s=step_s,
        mode=mode, heads=mcfg.heads, param_count=n_params,
        graph_bytes=roofline.graph_static_bytes(graph),
        use_edge_attr=mcfg.use_edge_attr,
        bytes_measured=bytes_measured,
    )
    roofline.check_roofline(roof["matmul_flops"], step_s)

    msgs_per_sec = edge_messages / step_s
    device = jax.devices()[0]
    return {
        "metric": "edge_messages_per_sec_per_chip",
        "value": msgs_per_sec,
        "unit": "msgs/s",
        "vs_baseline": msgs_per_sec / baseline_msgs_per_sec,
        "mode": mode,
        "layer_type": layer_type,
        "num_layers": num_layers,
        "hidden_dim": hidden_dim,
        "backend": backend,
        "compute_dtype": compute_dtype,
        "n_edges": graph.n_edges,
        "n_nodes": graph.n_nodes,
        "n_params": n_params,
        "step_median_s": step_s,
        "step_min_s": step_s,
        "step_steady_s": steady_s,
        "steps_per_sec": 1.0 / step_s,
        "device": str(device),
        "platform": device.platform,
        "timing": "chained_marginal",
        "timing_detail": timing.to_dict(),
        "cross_check": check,
        **({"trace": trace_info} if trace_info is not None else {}),
        "matmul_flops": roof["matmul_flops"],
        "mfu": roof["mfu"],
        "bound": roof["bound"],
        "bytes_basis": roof["bytes_basis"],
        "hbm_bytes_xla": roof.get("hbm_bytes_xla"),
        "hbm_bytes_est": roof["hbm_bytes_est"],
        "hbm_frac": roof.get("hbm_frac"),
        "flops_per_sec": roof["flops_per_sec"],
        "roofline_min_s": roof.get("roofline_min_s"),
    }
