"""Multi-chip data parallelism over a jax device mesh.

The reference is strictly single-process/single-device (SURVEY.md §2
parallelism table: no torch.distributed/DDP/NCCL anywhere).  This module is
the TPU-native DP design required by the BASELINE north star:

* a 1-D ``Mesh`` over the ``data`` axis (chips within a slice ride ICI;
  multi-host extends the same code via ``jax.distributed.initialize``);
* snapshots (targets ``[S, N_pad, 7]``) sharded over ``data``; params,
  optimizer state and the static graph replicated;
* gradients (and the scalar loss) reduced with ``lax.pmean`` inside
  ``jax.shard_map`` — XLA lowers this to an ICI all-reduce;
* batch-norm statistics are ``pmean``-synchronized across shards, which is
  exact here (every shard sees the same geometry input) and the
  correct "sync BN" semantics for perturbed-geometry DP;
* prediction writeback gathers with ordered semantics automatically —
  outputs are sharded by the leading axis and ``jax.device_get`` restores
  original order (multi-host writeback ordering, SURVEY.md §7 risk list).

Everything is testable without hardware on N fake CPU devices
(``--xla_force_host_platform_device_count``), which is how tests/test_dist.py
and ``__graft_entry__.dryrun_multichip`` run it.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.structs import Graph
from ..models.flow_gnn import FlowGNN
from ..train.loop import TrainConfig, TrainState, _pressure_freeze_mask, make_optimizer
from ..train.normalization import weighted_fieldwise_mse


def make_data_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), ("data",), devices=np.array(devices))


def shard_targets(
    targets: np.ndarray, mesh: Mesh
) -> tuple[jax.Array, jax.Array]:
    """Place [S, ...] snapshot targets sharded over the data axis.

    Returns ``(targets, weights)``, both sharded ``P('data')``.  When S is not
    divisible by the mesh size, snapshots are repeated round-robin to pad to a
    multiple — and every copy of snapshot *i* carries weight ``1/(c_i * S)``
    (``c_i`` = number of copies), so ``psum(sum(w_j * loss_j))`` is the exact
    mean over the ORIGINAL S snapshots: duplication never reweights the loss.
    With divisible S all weights are ``1/S`` and this reduces to a plain mean.
    """
    n = mesh.shape["data"]
    s = targets.shape[0]
    s_pad = -(-s // n) * n
    idx = np.arange(s_pad) % s
    counts = np.bincount(idx, minlength=s)
    weights = (1.0 / (counts[idx].astype(np.float64) * s)).astype(np.float32)
    sharding = NamedSharding(mesh, P("data"))
    return (
        jax.device_put(targets[idx], sharding),
        jax.device_put(weights, sharding),
    )


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def make_dp_train_step(
    model: FlowGNN, cfg: TrainConfig, mesh: Mesh, jit: bool = True
) -> Callable:
    """A fully-jitted DP train step: shard_map over the data axis.

    Signature matches the single-chip step plus snapshot weights:
    ``(state, graph, targets, weights, lr, rng, freeze_pressure) ->
    (state, loss)`` with ``targets``/``weights`` sharded ``P('data')``
    (from :func:`shard_targets`) and everything else replicated.
    ``jit=False`` returns the raw traceable body (for embedding in a larger
    jitted computation, e.g. the chained DP-scaling timing harness).
    """
    tx = make_optimizer(cfg)

    def local_step(state, graph, targets_local, weights_local, lr, rng):
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                graph,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            per_target = jax.vmap(
                lambda t: weighted_fieldwise_mse(
                    out, t, graph.node_mask,
                    pressure_ref_weight=cfg.pressure_ref_weight,
                )
            )(targets_local)
            # This shard's share of the GLOBAL mean loss (weights sum to 1
            # across the whole padded batch — exact even when snapshots were
            # duplicated to pad).  Params are axis-invariant inside
            # shard_map, so jax.grad automatically psums the per-device
            # cotangents over ICI — the returned grads are already the exact
            # global-batch gradient; no explicit pmean is needed (and adding
            # one would double-count).
            loss_share = jnp.sum(per_target * weights_local)
            return loss_share, mutated["batch_stats"]

        (loss_share, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # Scalar loss for reporting: sum of shares = global mean.
        loss = jax.lax.psum(loss_share, "data")
        # BN stats are computed from the replicated geometry input, hence
        # identical on every shard already (exact sync-BN for free).
        return loss, grads, new_bs

    def dp_train_step(
        state: TrainState,
        graph: Graph,
        targets: jax.Array,
        weights: jax.Array,
        lr: jax.Array,
        rng: jax.Array,
        freeze_pressure: bool = False,
    ):
        loss, grads, new_bs = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), P(), P()),
            out_specs=(P(), P(), P()),
        )(state, graph, targets, weights, lr, rng)
        if freeze_pressure:
            grads = jax.tree_util.tree_map_with_path(_pressure_freeze_mask, grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        if freeze_pressure:
            updates = jax.tree_util.tree_map_with_path(_pressure_freeze_mask, updates)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        import optax

        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, loss

    if jit:
        return partial(
            jax.jit, static_argnames=("freeze_pressure",), donate_argnums=(0,)
        )(dp_train_step)
    return dp_train_step


def make_dp_forward(model: FlowGNN, mesh: Mesh) -> Callable:
    """Replicated-forward for DP inference.

    The graph is replicated (single mesh fits on every chip); node-sharded
    forward with halo exchange is the large-mesh path (see parallel.partition).
    """

    @jax.jit
    def forward(params, batch_stats, graph: Graph):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, graph, train=False
        )

    return forward


def gather_predictions(out: jax.Array, graph: Graph) -> np.ndarray:
    """Device→host gather preserving original cell order."""
    return np.asarray(jax.device_get(out))[: graph.n_nodes]
