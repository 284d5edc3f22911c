"""DP scaling-efficiency harness (BASELINE row: ≥90% efficiency 1→N).

Measures the data-parallel train step at mesh sizes 1 and N with a FIXED
per-device batch (weak scaling — the deployment regime: more chips ⇒ more
snapshots/cases per step) and reports

    efficiency = T_step(1 device) / T_step(N devices)

(ideal 1.0: N devices process N× the snapshots in the same wall time; the
loss/grad all-reduce and any BN sync are the overhead being measured).

Runs on whatever mesh exists — N virtual CPU devices today
(``XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu``),
real ICI when a pod slice is attached — so the ≥90% BASELINE row is one
command when multi-chip hardware appears:

    python -m gnn_bfs_rans_tpu bench --mode dp --devices N

Timing is chained-marginal (utils.bench methodology): K data-dependent DP
steps inside one executable; the marginal per-step cost cancels host round
trips.  NOTE: virtual CPU devices share host cores, so CPU-measured
"efficiency" is an OVERHEAD BOUND (collective + partitioning cost), not an
ICI measurement — the artifact records the platform for that reason.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from .bench import _fetch_scalar


def _time_dp_step(model, tcfg, mesh, graph, targets, reps=16, base=2,
                  trials=3) -> float:
    """Marginal seconds per DP train step on ``mesh`` (chained fori_loop)."""
    from ..parallel.data_parallel import (
        make_dp_train_step,
        replicate,
        shard_targets,
    )
    from ..train.loop import init_state

    state = replicate(
        init_state(model, graph, tcfg, jax.random.PRNGKey(0)), mesh
    )
    graph = graph.to_device(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    tgt, wts = shard_targets(targets, mesh)
    raw = make_dp_train_step(model, tcfg, mesh, jit=False)
    rng = jax.random.PRNGKey(1)
    lr = jnp.asarray(1e-3, jnp.float32)

    @jax.jit
    def chain(s0, g, t, w, k):
        def body(i, s):
            s2, _ = raw(s, g, t, w, lr, jax.random.fold_in(rng, i))
            return s2

        return jax.lax.fori_loop(0, k, body, s0)

    def best_time(k: int) -> float:
        kk = jnp.asarray(k, jnp.int32)
        out = chain(state, graph, tgt, wts, kk)
        _fetch_scalar(out.params["out_3"]["bias"])
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            out = chain(state, graph, tgt, wts, kk)
            _fetch_scalar(out.params["out_3"]["bias"])
            best = min(best, time.perf_counter() - t0)
        return best

    t_base, t_full = best_time(base), best_time(reps)
    delta = t_full - t_base
    if delta <= 0:
        # resolution collapse (host contention on virtual-CPU meshes can
        # invert the two minima): retry once with a wider spread before
        # refusing — a clamped near-zero time would fabricate an absurd
        # efficiency ratio (seen as a flaky 4e7 "ratio" in CI)
        t_base2, t_full2 = best_time(base), best_time(4 * reps)
        delta = t_full2 - t_base2
        if delta <= 0:
            raise RuntimeError(
                "DP bench resolution collapse: T(full) <= T(base) even at "
                f"4x reps (base={base}, reps={reps})")
        return delta / (4 * reps - base)
    return delta / (reps - base)


def run_dp_scaling_benchmark(
    n_devices: int | None = None,
    case_path: str = "/root/reference/OpenFOAM-data",
    layer_type: str = "GAT",
    num_layers: int = 4,
    hidden_dim: int = 64,
    backend: str = "dense",
    compute_dtype: str = "float32",
    snapshots_per_device: int = 4,
    steps: int = 16,
) -> dict:
    """Weak-scaling DP efficiency at mesh sizes {1, N}; JSON-able dict."""
    from ..graph.band import LAYER_COMPONENTS
    from ..models.flow_gnn import FlowGNN, ModelConfig
    from ..parallel.data_parallel import make_data_mesh
    from ..train import TrainConfig, load_dataset

    avail = len(jax.devices())
    n = n_devices or avail
    if n > avail:
        raise ValueError(
            f"--devices {n} but only {avail} device(s) visible; for a "
            "virtual mesh set XLA_FLAGS=--xla_force_host_platform_device_"
            f"count={n} JAX_PLATFORMS=cpu"
        )

    dataset = load_dataset(
        case_path,
        with_band=(backend == "pallas"),
        band_components=LAYER_COMPONENTS.get(layer_type),
    )
    graph = dataset.graph
    mcfg = ModelConfig(
        hidden_dim=hidden_dim, num_layers=num_layers, layer_type=layer_type,
        backend=backend, dropout=0.0, compute_dtype=compute_dtype,
    )
    tcfg = TrainConfig()
    model = FlowGNN(mcfg)

    base_targets = np.asarray(dataset.targets)

    def targets_for(n_dev: int) -> np.ndarray:
        total = snapshots_per_device * n_dev
        idx = np.arange(total) % base_targets.shape[0]
        return base_targets[idx]

    t1 = _time_dp_step(
        model, tcfg, make_data_mesh(1), graph, targets_for(1), reps=steps
    )
    tn = (
        t1 if n == 1
        else _time_dp_step(
            model, tcfg, make_data_mesh(n), graph, targets_for(n), reps=steps
        )
    )
    efficiency = t1 / tn

    device = jax.devices()[0]
    edge_messages = num_layers * graph.n_edges
    return {
        "metric": "dp_scaling_efficiency",
        "value": efficiency,
        "unit": "ratio (weak scaling, T1/TN, ideal 1.0)",
        "vs_baseline": efficiency / 0.90,   # BASELINE: ≥90%
        "mode": "dp",
        "n_devices": n,
        "snapshots_per_device": snapshots_per_device,
        "step_s_1dev": t1,
        "step_s_ndev": tn,
        "global_snapshots_per_sec_ndev": snapshots_per_device * n / tn,
        "edge_messages_per_sec_global": edge_messages * n / tn,
        "layer_type": layer_type,
        "num_layers": num_layers,
        "hidden_dim": hidden_dim,
        "backend": backend,
        "compute_dtype": compute_dtype,
        "n_edges": graph.n_edges,
        "platform": device.platform,
        "note": (
            "virtual CPU mesh: overhead bound, not an ICI measurement"
            if device.platform == "cpu" else "hardware mesh"
        ),
        "timing": "chained_marginal",
    }
