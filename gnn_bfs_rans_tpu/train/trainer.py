"""High-level trainer: epochs, curriculum, plateau LR, history, checkpoints.

Behavioral parity with the reference ``train.py main()`` (``train.py:267-486``):

* per-epoch: shuffled batches → train steps; "validation" over the same data
  in eval mode (the reference has no split, ``train.py:410-412``); plateau
  scheduler stepped on val loss; detailed per-field errors every 10 epochs;
* curriculum (``--curriculum_epochs``): phase 1 freezes the pressure output,
  phase 2 unfreezes and halves the LR (``train.py:391-403``);
* best checkpoint on val-loss improvement + periodic ``epoch_N`` checkpoints
  (``train.py:443-469``) — plus actual resume, which the reference lacks;
* ``training_history.json`` with the exact reference schema
  {epoch, train_loss, val_loss, learning_rate, field_errors}
  (``train.py:383-389, 474-486``) so the plotting tool is drop-in compatible.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models.flow_gnn import FlowGNN, ModelConfig
from .checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    restore_state,
    save_checkpoint,
)
from .data import FlowDataset
from .loop import (
    ReduceLROnPlateau,
    TrainConfig,
    TrainState,
    init_epoch_block_carry,
    init_state,
    iterate_batches,
    make_epoch_block,
    make_eval_step,
    make_train_step,
)

FIELDS = ("U", "p", "k", "epsilon", "nut")


def empty_history() -> dict:
    return {
        "epoch": [],
        "train_loss": [],
        "val_loss": [],
        "field_errors": {f: [] for f in FIELDS},
        "learning_rate": [],
    }


class Trainer:
    def __init__(
        self,
        dataset: FlowDataset,
        model_config: ModelConfig,
        train_config: TrainConfig,
        output_dir: str | Path = "checkpoints",
        log_fn=print,
        progress: bool = False,
        aot: bool | str = "auto",
    ):
        self.dataset = dataset
        self.model_config = model_config
        self.config = train_config
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.log = log_fn
        # Live tqdm progress (parity with the reference's per-batch bar,
        # train.py:165,194).  Opt-in: the per-batch loss postfix forces a
        # device sync per batch in the per-epoch loop — exactly what the
        # reference's loss.item() does, but worth paying only when a human
        # is watching.  In the blocked loop the bar advances per block (the
        # whole point of epoch blocks is not syncing per batch).
        self.progress = progress
        self._pbar = None
        # Precompiled-executable cache for the TRAINING path (ROADMAP Perf
        # #4 leftover / VERDICT r3 item 6): epoch-block scan executables
        # serialize into <output_dir>/aot keyed on the lowered HLO (which
        # embeds the Mosaic kernel payloads + config), so a cold-start train
        # run skips the minutes-scale Mosaic compile.  'auto' = TPU only —
        # the CPU interpret path compiles in seconds and some backends don't
        # support executable serialization.
        if aot == "auto":
            aot = jax.default_backend() == "tpu"
        self.aot_dir = (self.output_dir / "aot") if aot else None

        self.model = FlowGNN(model_config)
        self.graph = dataset.graph.to_device()
        self.targets = jnp.asarray(dataset.targets)

        # Jitted steps wrapped for Mosaic compile-failure recovery: a wrong
        # VMEM group pick retries at smaller group caps, then falls back to
        # the dense backend (kernels.fallback; parameter trees are
        # backend-independent so training state carries over).
        from ..kernels.fallback import GroupFallback

        def _dense_model() -> FlowGNN:
            import dataclasses as _dc

            return FlowGNN(_dc.replace(model_config, backend="dense"))

        # BN recalibration (train/recal.py): when resolved on, the val loss
        # driving plateau scheduling and best-model selection comes from the
        # exact-batch-stats forward, and checkpoints are saved with
        # recalibrated statistics (_save).  'auto' = bfloat16 batch-norm
        # models only — the measured eval-floor failure mode.
        from .recal import make_exact_stats_fn, resolve_bn_recal

        self.bn_recal = resolve_bn_recal(train_config.bn_recal, model_config)
        self._exact_stats = (
            jax.jit(make_exact_stats_fn(model_config)) if self.bn_recal else None
        )

        # log late-bound through self.log: _open_pbar() swaps self.log to
        # tqdm.write, and fallback warnings must follow the swap or they
        # tear the progress bar (advisor round 3)
        self.train_step = GroupFallback(
            lambda: make_train_step(self.model, train_config),
            dense_build=lambda: make_train_step(_dense_model(), train_config),
            log=lambda *a, **k: self.log(*a, **k), name="train step",
        )
        self.eval_step = GroupFallback(
            lambda: make_eval_step(self.model, train_config,
                                   recal=self.bn_recal),
            dense_build=lambda: make_eval_step(_dense_model(), train_config,
                                               recal=self.bn_recal),
            log=lambda *a, **k: self.log(*a, **k), name="eval step",
        )

        # PRNG impl per TrainConfig.rng_impl ('auto' → rbg on TPU for speed,
        # threefry elsewhere; see the config field for the reproducibility
        # caveat — rbg streams are not stable across backends/XLA versions)
        impl = train_config.rng_impl
        if impl == "auto":
            impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
        self.rng = jax.random.key(train_config.seed, impl=impl)
        self.np_rng = np.random.default_rng(train_config.seed)
        self.history = empty_history()
        self.state: TrainState | None = None
        self.start_epoch = 1
        self.scheduler = ReduceLROnPlateau(
            train_config.lr,
            factor=train_config.plateau_factor,
            patience=train_config.plateau_patience,
            threshold=train_config.plateau_threshold,
            min_lr=train_config.plateau_min_lr,
        )
        self.best_val = float("inf")

    # ------------------------------------------------------------------ setup
    def initialize(self, resume: bool = False) -> None:
        from ..kernels.fallback import run_with_group_retry

        self.rng, init_rng = jax.random.split(self.rng)
        # model.init runs kernels eagerly — give it the same Mosaic recovery
        # as the wrapped steps (param trees are backend-independent, so a
        # dense-backend init yields identical parameters)
        import dataclasses as _dc

        dense = FlowGNN(_dc.replace(self.model_config, backend="dense"))
        self.state = run_with_group_retry(
            lambda: init_state(self.model, self.graph, self.config, init_rng),
            fallback_fn=lambda: init_state(
                dense, self.graph, self.config, init_rng),
            log=self.log, name="parameter init",
        )
        if resume:
            name = latest_checkpoint(self.output_dir)
            if name is not None:
                restored, meta = load_checkpoint(
                    self.output_dir, name, abstract_state=self.state
                )
                self.state = restore_state(TrainState, restored)
                self.start_epoch = int(meta.get("epoch", 0)) + 1
                self.best_val = float(meta.get("best_val", meta.get("val_loss", np.inf)))
                self.scheduler.lr = float(meta.get("lr", self.config.lr))
                self.scheduler.best = float(meta.get("sched_best", self.best_val))
                hist_path = self.output_dir / "training_history.json"
                if hist_path.exists():
                    self.history = json.loads(hist_path.read_text())
                self._truncate_metrics_jsonl(self.start_epoch)
                self.log(f"Resumed from {name} at epoch {self.start_epoch}")

        n_params = sum(
            int(np.prod(p.shape)) for p in jax.tree.leaves(self.state.params)
        )
        self.log(f"Model parameters: {n_params:,}")
        if self.bn_recal:
            self.log("BN recalibration ON: val loss / best selection on "
                     "exact batch statistics; checkpoints saved recalibrated")

    def _open_pbar(self):
        """Start the epoch progress bar and route log lines through
        ``tqdm.write`` so they don't tear the bar."""
        if not self.progress:
            return
        try:
            from tqdm import tqdm
        except ImportError:  # declared in pyproject; guard a partial install
            self.log("tqdm not installed — --progress disabled")
            self.progress = False
            return

        self._pbar = tqdm(
            total=self.config.epochs, initial=self.start_epoch - 1,
            desc="Training", unit="epoch", dynamic_ncols=True,
        )
        self._plain_log, self.log = self.log, tqdm.write

    def _close_pbar(self):
        if self._pbar is not None:
            self._pbar.close()
            self._pbar = None
            self.log = self._plain_log

    def _truncate_metrics_jsonl(self, start_epoch: int) -> None:
        """Drop metrics.jsonl rows at/after ``start_epoch`` so a resumed run
        does not double-append epochs already recorded (the history JSON is
        reloaded; the JSONL must be truncated to match)."""
        path = self.output_dir / "metrics.jsonl"
        if not path.exists():
            return
        kept = []
        for line in path.read_text().splitlines():
            try:
                if int(json.loads(line).get("epoch", -1)) < start_epoch:
                    kept.append(line)
            except (ValueError, json.JSONDecodeError):
                kept.append(line)  # keep unparseable lines untouched
        path.write_text("".join(l + "\n" for l in kept))

    # ------------------------------------------------------------------ train
    def train(self) -> dict:
        """Run the epoch loop; saves an ``interrupt`` checkpoint on Ctrl-C /
        SIGTERM-raised KeyboardInterrupt so ``--resume`` can continue, and
        aborts loudly on non-finite loss (NaN guard — SURVEY.md §5 failure
        detection plan)."""
        try:
            return self._train_loop()
        except KeyboardInterrupt:
            if self.state is not None:
                epoch = self.history["epoch"][-1] if self.history["epoch"] else 0
                self._save(f"epoch_{epoch}", epoch,
                           self.history["val_loss"][-1] if epoch else float("inf"),
                           {"interrupted": True})
                self.save_history()
                self.log(f"Interrupted: checkpoint saved at epoch {epoch}")
            raise

    def _train_loop(self) -> dict:
        if self.state is None:
            self.initialize()
        cfg = self.config
        n = self.dataset.n_snapshots
        if cfg.epoch_block > 1:
            if n % min(cfg.batch_size, n) == 0:
                return self._train_loop_blocked()
            self.log(
                f"epoch_block={cfg.epoch_block} needs n_snapshots ({n}) "
                f"divisible by batch_size ({cfg.batch_size}); falling back "
                "to the per-epoch loop"
            )
        lr = self.scheduler.lr

        self._open_pbar()
        try:
            self._run_epochs(cfg, n, lr)
        finally:
            self._close_pbar()
        self.save_history()
        return self.history

    def _run_epochs(self, cfg, n, lr) -> None:
        for epoch in range(self.start_epoch, cfg.epochs + 1):
            freeze = False
            if cfg.curriculum_epochs > 0:
                if epoch <= cfg.curriculum_epochs:
                    freeze = True
                elif epoch == cfg.curriculum_epochs + 1:
                    self.scheduler.lr *= 0.5
                    lr = self.scheduler.lr
                    self.log(
                        f"Curriculum phase 2: unfreezing pressure, lr → {lr:.3e}"
                    )

            if cfg.scheduler == "cosine":
                import math

                lr = cfg.plateau_min_lr + 0.5 * (cfg.lr - cfg.plateau_min_lr) * (
                    1 + math.cos(math.pi * (epoch - 1) / max(cfg.epochs - 1, 1))
                )

            t0 = time.perf_counter()
            losses = []
            for batch_idx in iterate_batches(n, cfg.batch_size, self.np_rng):
                self.rng, step_rng = jax.random.split(self.rng)
                self.state, loss = self.train_step(
                    self.state,
                    self.graph,
                    self.targets[batch_idx],
                    jnp.asarray(lr, jnp.float32),
                    step_rng,
                    freeze_pressure=freeze,
                )
                losses.append(loss)
                if self._pbar is not None:
                    # live per-batch loss postfix (reference train.py:194);
                    # float(loss) is the same per-batch sync loss.item() pays
                    self._pbar.set_postfix(loss=f"{float(loss):.6f}")
            train_loss = float(np.mean([float(l) for l in losses]))
            if not np.isfinite(train_loss):
                self.save_history()
                raise FloatingPointError(
                    f"non-finite training loss at epoch {epoch} "
                    f"(loss={train_loss}); enable "
                    "utils.profiling.enable_nan_checks() to locate the op"
                )

            val_loss, errors, _ = self.eval_step(
                self.state, self.graph, self.targets
            )
            val_loss = float(val_loss)
            lr_used = lr
            if cfg.scheduler == "plateau":
                lr = self.scheduler.step(val_loss)

            detailed = epoch % 10 == 0
            self.history["epoch"].append(epoch)
            self.history["train_loss"].append(train_loss)
            self.history["val_loss"].append(val_loss)
            self.history["learning_rate"].append(lr_used)
            for f in FIELDS:
                self.history["field_errors"][f].append(
                    float(errors[f]) if detailed else None
                )
            if detailed:
                self.log(f"Epoch {epoch} field errors: "
                         + ", ".join(f"{f}={float(errors[f]):.6f}" for f in FIELDS))

            dt = time.perf_counter() - t0
            self.log(
                f"Epoch {epoch}: train={train_loss:.6f} val={val_loss:.6f} "
                f"lr={lr_used:.3e} ({dt:.2f}s)"
            )
            if self._pbar is not None:
                self._pbar.set_postfix(
                    train=f"{train_loss:.6f}", val=f"{val_loss:.6f}",
                    lr=f"{lr_used:.1e}",
                )
                self._pbar.update(1)

            # structured per-epoch metrics (SURVEY.md §5 observability plan)
            with open(self.output_dir / "metrics.jsonl", "a") as f:
                f.write(json.dumps({
                    "epoch": epoch,
                    "train_loss": train_loss,
                    "val_loss": val_loss,
                    "lr": lr_used,
                    "epoch_seconds": dt,
                    **({f"err_{k}": float(errors[k]) for k in FIELDS}
                       if detailed else {}),
                }) + "\n")

            extra = {
                "best_val": min(self.best_val, val_loss),
                "lr": lr,
                "sched_best": self.scheduler.best,
            }
            if val_loss < self.best_val:
                self.best_val = val_loss
                self._save("best", epoch, val_loss, extra)
            if epoch % cfg.save_every == 0:
                self._save(f"epoch_{epoch}", epoch, val_loss, extra)

    def _train_loop_blocked(self) -> dict:
        """Device-resident epoch loop: ``lax.scan`` blocks of up to
        ``cfg.epoch_block`` epochs per dispatch (loop.make_epoch_block).

        Exactness vs the per-epoch loop: blocks are cut at ``save_every``
        multiples and at the curriculum phase boundary, so periodic
        checkpoints and the freeze/LR-halving switch land on the same epochs;
        the plateau scheduler runs on-device (float32 state).  Two documented
        deviations: snapshot shuffling uses the device PRNG stream instead of
        the host numpy one, and a 'best' checkpoint carries the best epoch's
        params/batch_stats with the block-end optimizer state (resume
        normally uses the latest epoch_N checkpoint, which is exact).
        """
        cfg = self.config
        n = self.dataset.n_snapshots
        from ..kernels.fallback import GroupFallback

        def _dense_block():
            import dataclasses as _dc

            dense_model = FlowGNN(_dc.replace(self.model_config,
                                              backend="dense"))
            return make_epoch_block(dense_model, cfg, n, recal=self.bn_recal)

        block_fn = GroupFallback(
            lambda: self._aot_wrap(
                make_epoch_block(self.model, cfg, n, recal=self.bn_recal)),
            dense_build=_dense_block,
            log=lambda *a, **k: self.log(*a, **k), name="epoch block",
        )
        self.rng, loop_rng = jax.random.split(self.rng)
        carry = init_epoch_block_carry(self.state, self.scheduler.lr, loop_rng)
        # resume support: seed the on-device scheduler with host state
        carry = carry.replace(sched=carry.sched.replace(
            best=jnp.asarray(self.scheduler.best, jnp.float32),
        ), best_val=jnp.asarray(self.best_val, jnp.float32))

        epoch = self.start_epoch
        self._open_pbar()
        try:
            epoch = self._run_blocks(cfg, n, block_fn, carry, epoch)
        finally:
            self._close_pbar()
        self.save_history()
        return self.history

    def _aot_wrap(self, block):
        """Route epoch-block calls through the precompiled-executable cache.

        One executable per static signature ``(n_epochs, freeze)`` — a run
        uses at most ~4 (full block, save_every remainder, curriculum
        boundary, final partial block).  Buffer donation (the carry) is an
        executable property and survives serialization.  No-op when AOT is
        disabled.
        """
        if self.aot_dir is None:
            return block
        from ..utils.aot import load_or_compile

        compiled: dict = {}

        def call(carry, graph, targets, epoch0, n_epochs, freeze=False):
            key = (n_epochs, bool(freeze))
            if key not in compiled:
                compiled[key] = load_or_compile(
                    block, (carry, graph, targets, epoch0), self.aot_dir,
                    label=(f"epoch-block-k{n_epochs}-f{int(freeze)}"
                           + ("-recal" if self.bn_recal else "")),
                    kwargs={"n_epochs": n_epochs, "freeze": freeze},
                )
            return compiled[key](carry, graph, targets, epoch0)

        return call

    def _run_blocks(self, cfg, n, block_fn, carry, epoch) -> int:
        while epoch <= cfg.epochs:
            if cfg.curriculum_epochs > 0 and epoch == cfg.curriculum_epochs + 1:
                new_lr = float(carry.sched.lr) * 0.5
                carry = carry.replace(
                    sched=carry.sched.replace(
                        lr=jnp.asarray(new_lr, jnp.float32))
                )
                self.log(
                    f"Curriculum phase 2: unfreezing pressure, lr → {new_lr:.3e}"
                )
            freeze = cfg.curriculum_epochs > 0 and epoch <= cfg.curriculum_epochs
            # block end: epoch_block cap, save_every multiple, curriculum
            # boundary, final epoch — whichever comes first
            stop = min(
                epoch + cfg.epoch_block - 1,
                ((epoch - 1) // cfg.save_every + 1) * cfg.save_every,
                cfg.epochs,
            )
            if freeze:
                stop = min(stop, cfg.curriculum_epochs)
            k = stop - epoch + 1

            t0 = time.perf_counter()
            carry, outs = block_fn(
                carry, self.graph, self.targets,
                jnp.asarray(epoch - 1, jnp.int32),
                n_epochs=k, freeze=freeze,
            )
            train_losses = np.asarray(outs["train_loss"], np.float64)
            val_losses = np.asarray(outs["val_loss"], np.float64)
            lrs = np.asarray(outs["lr"], np.float64)
            errs = {f: np.asarray(v, np.float64)
                    for f, v in outs["errors"].items()}
            dt = time.perf_counter() - t0

            if not np.isfinite(train_losses).all():
                bad = epoch + int(np.argmax(~np.isfinite(train_losses)))
                self.save_history()
                raise FloatingPointError(
                    f"non-finite training loss at epoch {bad} "
                    f"(block {epoch}..{stop}); enable "
                    "utils.profiling.enable_nan_checks() to locate the op"
                )

            with open(self.output_dir / "metrics.jsonl", "a") as fh:
                for j in range(k):
                    e = epoch + j
                    detailed = e % 10 == 0
                    self.history["epoch"].append(e)
                    self.history["train_loss"].append(float(train_losses[j]))
                    self.history["val_loss"].append(float(val_losses[j]))
                    self.history["learning_rate"].append(float(lrs[j]))
                    for f in FIELDS:
                        self.history["field_errors"][f].append(
                            float(errs[f][j]) if detailed else None
                        )
                    fh.write(json.dumps({
                        "epoch": e,
                        "train_loss": float(train_losses[j]),
                        "val_loss": float(val_losses[j]),
                        "lr": float(lrs[j]),
                        "epoch_seconds": dt / k,
                        **({f"err_{f}": float(errs[f][j]) for f in FIELDS}
                           if detailed else {}),
                    }) + "\n")

            self.log(
                f"Epochs {epoch}-{stop}: train={train_losses[-1]:.6f} "
                f"val={val_losses[-1]:.6f} lr={lrs[-1]:.3e} "
                f"({dt:.2f}s, {dt/k*1e3:.0f} ms/epoch)"
            )

            # checkpointing at block end (stop aligns with save_every)
            self.state = carry.state
            self.scheduler.lr = float(carry.sched.lr)
            self.scheduler.best = float(carry.sched.best)
            block_best = float(carry.best_val)
            extra = {
                "best_val": min(self.best_val, block_best),
                "lr": self.scheduler.lr,
                "sched_best": self.scheduler.best,
            }
            if block_best < self.best_val:
                self.best_val = block_best
                best_state = self.state.replace(
                    params=carry.best_params, batch_stats=carry.best_stats
                )
                saved, self.state = self.state, best_state
                try:
                    self._save("best", int(carry.best_epoch), block_best, extra)
                finally:
                    self.state = saved
            if stop % cfg.save_every == 0 or stop == cfg.epochs:
                self._save(f"epoch_{stop}", stop, float(val_losses[-1]), extra)
            if self._pbar is not None:
                self._pbar.set_postfix(
                    train=f"{train_losses[-1]:.6f}",
                    val=f"{val_losses[-1]:.6f}", lr=f"{lrs[-1]:.1e}",
                )
                self._pbar.update(k)
            epoch = stop + 1

        self.rng = carry.rng
        return epoch

    def _save(self, name: str, epoch: int, val_loss: float, extra: dict) -> None:
        state = self.state
        if self.bn_recal:
            # Save with EXACT batch statistics for the saved parameters
            # (train/recal.py): one deterministic forward + EMA inversion.
            # The training state itself keeps its EMA stats — recalibration
            # affects what eval/inference sees, not the optimization.
            try:
                exact = self._exact_stats(
                    state.params, state.batch_stats, self.graph
                )
                state = state.replace(batch_stats=exact)
                extra = {**extra, "bn_recalibrated": True}
            except Exception as e:  # noqa: BLE001 — e.g. Mosaic compile
                # failure after the train path fell back to dense; an
                # un-recalibrated checkpoint is still valid (and
                # `infer --recalibrate_bn` can recover it later)
                self.log(f"BN recalibration at save failed ({e}); "
                         "saving running-EMA statistics")
        save_checkpoint(
            self.output_dir,
            name,
            state,
            epoch=epoch,
            val_loss=val_loss,
            model_config=self.model_config,
            train_config=self.config,
            normalizer=self.dataset.normalizer,
            extra=extra,
        )

    def save_history(self) -> Path:
        path = self.output_dir / "training_history.json"
        path.write_text(json.dumps(self.history, indent=2))
        return path
