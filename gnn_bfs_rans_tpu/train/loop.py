"""Jitted training step and host-side training loop.

The reference's epoch loop (``train.py:158-213, 391-469``) maps to:

* one fully-jitted ``train_step`` (forward, field-wise weighted loss,
  backward, curriculum pressure-freeze mask, global-norm clip 1.0, torch-style
  Adam + L2 weight decay) — no per-step host sync except the scalar loss the
  progress line reports;
* a torch-compatible ``ReduceLROnPlateau`` re-implementation (factor 0.5,
  patience 10, rel threshold 1e-4; ``train.py:374-376``) driven from host;
* curriculum phase-1 pressure freezing as a gradient mask on the output
  head's pressure column.  Deviation from the reference, by design: the
  reference masks only the 2-D weight rows and lets the bias keep learning
  (``train.py:180-186``, SURVEY.md §2 quirk 5); we mask weight AND bias.

Because every snapshot shares the one static graph and the model input is
geometry only, a batch of B snapshots needs a single forward — the loss
averages over the batch's targets (exactly what PyG disjoint-union batching
of identical graphs computes, without replicating nodes).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..graph.structs import Graph
from ..models.flow_gnn import FlowGNN
from .metrics import compute_field_errors
from .normalization import weighted_fieldwise_mse


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters; defaults mirror ``train.py:283-298``."""

    lr: float = 3e-4
    weight_decay: float = 1e-5
    grad_clip: float = 1.0
    epochs: int = 100
    batch_size: int = 1
    pressure_ref_weight: float = 0.1
    curriculum_epochs: int = 0
    save_every: int = 10
    seed: int = 0
    # plateau scheduler (torch ReduceLROnPlateau defaults + reference args)
    plateau_factor: float = 0.5
    plateau_patience: int = 10
    plateau_threshold: float = 1e-4
    # torch default is 0 (parity); set >0 for long runs — unbounded decay
    # drives lr to ~1e-50 over thousands of plateaued epochs.
    plateau_min_lr: float = 0.0
    # 'plateau' (reference parity) or 'cosine' (better for long single-case
    # overfitting runs where the eval loss lags BN running stats)
    scheduler: str = "plateau"
    # Dropout PRNG implementation.  'auto' = 'rbg' on TPU (XLA's on-device
    # RngBitGenerator; saves ~1.2 ms/step on the flagship GAT train step vs
    # threefry's long u32 ALU chains), 'threefry' elsewhere.
    # REPRODUCIBILITY: 'rbg' streams are stable within one backend+XLA
    # version but NOT across TPU/CPU or across JAX/XLA upgrades — set
    # rng_impl='threefry' when a seed must reproduce bitwise anywhere.
    rng_impl: str = "auto"
    # BatchNorm recalibration mode ('auto'|'on'|'off', train/recal.py).
    # When resolved on: the epoch loop's val loss (and hence plateau
    # scheduling + best-model selection) comes from a deterministic
    # train-mode forward — BN normalizes with the EXACT batch statistics of
    # the current parameters instead of the lagging/noisy running-stat EMA —
    # and every checkpoint is saved with those exact statistics.  'auto' =
    # on for bfloat16 batch-norm models (the measured failure mode), off
    # otherwise (reference-parity eval semantics for f32).
    bn_recal: str = "auto"
    # Epochs per device-resident lax.scan block (make_epoch_block).  1 =
    # host-driven loop (reference-parity dispatch).  >1 runs whole epochs
    # on-device and syncs the host once per block — the win is wall-clock:
    # each host dispatch to a network-attached TPU pays the tunnel RTT
    # (~50 ms ≫ the ~4 ms device step).  Blocks are cut at save_every
    # multiples and curriculum boundaries so checkpoint cadence and phase
    # switches stay exact; requires n_snapshots % batch_size == 0 (else the
    # trainer falls back to 1 with a warning).
    epoch_block: int = 1

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "TrainConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: clip → L2 decay into grad → Adam moments."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
    )


def init_state(
    model: FlowGNN, graph: Graph, cfg: TrainConfig, rng: jax.Array
) -> TrainState:
    variables = model.init(rng, graph, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = make_optimizer(cfg).init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )


def _pressure_freeze_mask(path, leaf):
    """Zero the pressure (index 3) output column of the final head.

    flax Dense kernels are [in, out]; the head ``out_3`` maps H/2 → 7, so the
    pressure column is ``kernel[:, 3]`` / ``bias[3]``.
    """
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    if "out_3" in names:
        return leaf.at[..., 3].set(0.0)
    return leaf


def make_train_step(
    model: FlowGNN, cfg: TrainConfig, jit: bool = True
) -> Callable:
    """The jitted train step; ``jit=False`` returns the raw traced body

    (for embedding in a larger jitted computation, e.g. the chained
    device-timing harness in ``utils.bench`` or a scanned multi-step loop).
    """
    tx = make_optimizer(cfg)

    def train_step(
        state: TrainState,
        graph: Graph,
        targets: jax.Array,   # [B, N_pad, 7]
        lr: jax.Array,
        rng: jax.Array,
        freeze_pressure: bool = False,
    ):
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                graph,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            loss = jnp.mean(
                jax.vmap(
                    lambda t: weighted_fieldwise_mse(
                        out, t, graph.node_mask,
                        pressure_ref_weight=cfg.pressure_ref_weight,
                    )
                )(targets)
            )
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if freeze_pressure:
            grads = jax.tree_util.tree_map_with_path(_pressure_freeze_mask, grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        if freeze_pressure:
            # Also mask the post-optimizer update: the L2 decay term added
            # inside the chain would otherwise drive an Adam-normalized step
            # on the frozen column (the reference has this leak, train.py:180-186;
            # we freeze for real).
            updates = jax.tree_util.tree_map_with_path(_pressure_freeze_mask, updates)
        updates = jax.tree.map(lambda u: -lr * u, updates)
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
        )(train_step)
    return train_step


def make_eval_body(
    model: FlowGNN, cfg: TrainConfig, recal: bool = False
) -> Callable:
    """Unjitted eval body (loss, per-field errors, prediction) — shared by
    the jitted eval step and the device-resident epoch block.

    ``recal=True`` evaluates through a deterministic (dropout-free)
    train-mode forward instead of the eval-mode one: BatchNorm normalizes
    with the exact batch statistics of the current parameters rather than
    the running-stat EMA.  Because the model input is geometry only, this is
    precisely the loss an eval-mode forward would report after a BN
    re-estimation pass (train/recal.py) — without running two forwards.
    """
    if recal:
        import dataclasses as _dc

        det_model = FlowGNN(_dc.replace(model.config, dropout=0.0))

    def eval_step(state: TrainState, graph: Graph, targets: jax.Array):
        if recal:
            out, _ = det_model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                graph,
                train=True,
                mutable=["batch_stats"],
            )
        else:
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                graph,
                train=False,
            )
        loss = jnp.mean(
            jax.vmap(
                lambda t: weighted_fieldwise_mse(
                    out, t, graph.node_mask,
                    pressure_ref_weight=cfg.pressure_ref_weight,
                )
            )(targets)
        )
        # Per-snapshot errors, then mean over snapshots.  The reference's
        # evaluate_detailed (train.py:241-264) instead CONCATENATES all
        # snapshots and computes one mean over nodes — identical numbers
        # here, exactly: every snapshot shares the one mesh (equal node
        # count n), so mean-of-per-snapshot-means == mean-over-concatenation
        # for every metric (each is a plain mean over nodes).  Equivalence is
        # pinned by tests/test_train.py::test_eval_errors_match_concatenated
        # and noted in PARITY.md.
        errs_per = jax.vmap(
            lambda t: compute_field_errors(out, t, graph.node_mask)
        )(targets)
        errors = {k: jnp.mean(v) for k, v in errs_per.items()}
        return loss, errors, out

    return eval_step


def make_eval_step(
    model: FlowGNN, cfg: TrainConfig, recal: bool = False
) -> Callable:
    return jax.jit(make_eval_body(model, cfg, recal=recal))


def make_forward(model: FlowGNN, exact_bn: bool = False) -> Callable:
    """Jitted inference forward.

    ``exact_bn=True`` predicts through the deterministic (dropout-free)
    train-mode forward: BN normalizes with the exact batch statistics of
    the input, computed in-forward — analytically the eval-mode forward
    after a BN re-estimation pass, and numerically the TRAINING forward's
    exact arithmetic schedule (see ``infer.Predictor.exact_bn``)."""
    if exact_bn:
        import dataclasses as _dc

        det_model = FlowGNN(_dc.replace(model.config, dropout=0.0))

        @jax.jit
        def forward(params, batch_stats, graph: Graph):
            out, _ = det_model.apply(
                {"params": params, "batch_stats": batch_stats},
                graph, train=True, mutable=["batch_stats"],
            )
            return out

        return forward

    @jax.jit
    def forward(params, batch_stats, graph: Graph):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, graph, train=False
        )

    return forward


class PlateauState(struct.PyTreeNode):
    """On-device ReduceLROnPlateau state (see :func:`plateau_update`)."""

    lr: jax.Array       # f32 scalar
    best: jax.Array     # f32 scalar
    num_bad: jax.Array  # i32 scalar


def plateau_init(lr: float) -> PlateauState:
    return PlateauState(
        lr=jnp.asarray(lr, jnp.float32),
        best=jnp.asarray(jnp.inf, jnp.float32),
        num_bad=jnp.zeros((), jnp.int32),
    )


def plateau_update(s: PlateauState, metric: jax.Array,
                   cfg: TrainConfig) -> PlateauState:
    """Traceable torch-``ReduceLROnPlateau`` step (mode='min', rel threshold)
    — the same state machine as :class:`ReduceLROnPlateau`, but pure jnp so
    the whole epoch loop can live on-device in :func:`make_epoch_block`.
    State is float32 (vs the host class's float64); the ±1-ulp threshold
    comparisons this can shift are far below run-to-run training noise.
    """
    metric = metric.astype(jnp.float32)
    improved = metric < s.best * (1.0 - cfg.plateau_threshold)
    num_bad = jnp.where(improved, 0, s.num_bad + 1)
    reduce = num_bad > cfg.plateau_patience
    lr = jnp.where(
        reduce,
        jnp.maximum(s.lr * cfg.plateau_factor, cfg.plateau_min_lr),
        s.lr,
    )
    return PlateauState(
        lr=lr,
        best=jnp.where(improved, metric, s.best),
        num_bad=jnp.where(reduce, 0, num_bad),
    )


class EpochBlockCarry(struct.PyTreeNode):
    """Device-resident carry of the scanned epoch loop.

    ``best_params``/``best_stats`` track the best-val-loss epoch *inside* the
    device loop, so blocked training preserves the reference's best-model
    checkpoint semantics (``train.py:443-461``) without a host sync per epoch.
    """

    state: TrainState
    sched: PlateauState
    rng: jax.Array
    best_params: Any
    best_stats: Any
    best_val: jax.Array    # f32
    best_epoch: jax.Array  # i32


def init_epoch_block_carry(
    state: TrainState, lr: float, rng: jax.Array
) -> EpochBlockCarry:
    return EpochBlockCarry(
        state=state,
        sched=plateau_init(lr),
        rng=rng,
        # distinct buffers: the carry is donated, and donating the same
        # buffer twice (params aliased as best_params) is an error
        best_params=jax.tree.map(jnp.copy, state.params),
        best_stats=jax.tree.map(jnp.copy, state.batch_stats),
        best_val=jnp.asarray(jnp.inf, jnp.float32),
        best_epoch=jnp.zeros((), jnp.int32),
    )


def make_epoch_block(
    model: FlowGNN, cfg: TrainConfig, n_snapshots: int, recal: bool = False
) -> Callable:
    """Build the jitted multi-epoch training block.

    ``block_fn(carry, graph, targets, epoch0, n_epochs=K, freeze=...)`` runs
    K full epochs (shuffled batches → train steps → eval → scheduler) in ONE
    device executable via ``lax.scan`` and returns the new carry plus stacked
    per-epoch ``{train_loss, val_loss, lr, errors}``.

    Rationale (TPU-first): the reference's epoch loop (``train.py:391-469``)
    is a host-driven per-step dispatch; through a network-attached TPU each
    dispatch pays the tunnel RTT (~50 ms — 10× the 4 ms device step).  The
    scan keeps the whole loop on-device; the host syncs once per block for
    history/checkpoint bookkeeping.

    Constraints: ``n_snapshots % batch_size == 0`` (or one full batch) so the
    inner scan has static batch shapes; per-epoch 'best model' tracking is
    carried on-device (params + batch_stats; the optimizer state saved with a
    'best' checkpoint is the block-end one — documented in Trainer).
    """
    raw_step = make_train_step(model, cfg, jit=False)
    # recal: val loss (→ plateau scheduling + best-model selection) measured
    # on the exact-batch-stats forward; the 'best' checkpoint is then saved
    # with recalibrated statistics by the Trainer (see TrainConfig.bn_recal)
    eval_body = make_eval_body(model, cfg, recal=recal)
    bsz = min(cfg.batch_size, n_snapshots)
    if n_snapshots % bsz:
        raise ValueError(
            f"epoch block needs n_snapshots ({n_snapshots}) divisible by "
            f"batch_size ({bsz}); fall back to epoch_block=1"
        )
    n_batches = n_snapshots // bsz
    cos_lr0 = cfg.lr

    @partial(
        jax.jit,
        static_argnames=("n_epochs", "freeze"),
        donate_argnums=(0,),
    )
    def epoch_block(
        carry: EpochBlockCarry,
        graph: Graph,
        targets: jax.Array,
        epoch0: jax.Array,  # i32: absolute epoch number of the block's first epoch, minus 1
        n_epochs: int,
        freeze: bool = False,
    ):
        def one_epoch(c: EpochBlockCarry, e_idx: jax.Array):
            epoch = epoch0 + e_idx + 1  # absolute, 1-based
            if cfg.scheduler == "cosine":
                frac = (epoch - 1).astype(jnp.float32) / max(cfg.epochs - 1, 1)
                lr = cfg.plateau_min_lr + 0.5 * (cos_lr0 - cfg.plateau_min_lr) * (
                    1.0 + jnp.cos(jnp.pi * frac)
                )
            else:
                lr = c.sched.lr
            rng = c.rng
            if n_batches > 1:
                rng, perm_rng = jax.random.split(rng)
                order = jax.random.permutation(perm_rng, n_snapshots)
            else:
                order = jnp.arange(n_snapshots)
            order = order.reshape(n_batches, bsz)

            def batch_step(sc, idx):
                st, r = sc
                r, step_rng = jax.random.split(r)
                st, loss = raw_step(
                    st, graph, targets[idx], lr, step_rng,
                    freeze_pressure=freeze,
                )
                return (st, r), loss

            (state, rng), losses = jax.lax.scan(
                batch_step, (c.state, rng), order
            )
            train_loss = jnp.mean(losses)
            val_loss, errors, _ = eval_body(state, graph, targets)
            sched = plateau_update(c.sched, val_loss, cfg)

            improved = val_loss < c.best_val
            take = lambda a, b: jnp.where(improved, a, b)
            new_c = EpochBlockCarry(
                state=state,
                sched=sched,
                rng=rng,
                best_params=jax.tree.map(take, state.params, c.best_params),
                best_stats=jax.tree.map(take, state.batch_stats, c.best_stats),
                best_val=take(val_loss.astype(jnp.float32), c.best_val),
                best_epoch=take(epoch.astype(jnp.int32), c.best_epoch),
            )
            outs = {
                "train_loss": train_loss,
                "val_loss": val_loss,
                "lr": lr,
                "errors": errors,
            }
            return new_c, outs

        return jax.lax.scan(one_epoch, carry, jnp.arange(n_epochs))

    return epoch_block


class ReduceLROnPlateau:
    """Host-side re-implementation of torch's plateau scheduler.

    mode='min', threshold_mode='rel' (torch defaults), factor/patience from
    the reference (``train.py:374-376``).
    """

    def __init__(
        self,
        lr: float,
        factor: float = 0.5,
        patience: int = 10,
        threshold: float = 1e-4,
        min_lr: float = 0.0,
    ):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr


def iterate_batches(
    n_samples: int, batch_size: int, rng: np.random.Generator
) -> list[np.ndarray]:
    """Shuffled batch index lists (drop nothing; last batch may be short)."""
    order = rng.permutation(n_samples)
    return [order[i : i + batch_size] for i in range(0, n_samples, batch_size)]
