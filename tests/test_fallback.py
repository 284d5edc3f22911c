"""Mosaic compile-failure recovery (kernels.fallback.GroupFallback).

The banded kernels' VMEM group estimate is hand-tuned; a wrong pick fails at
Mosaic compile time.  These tests force over-budget configurations (via
injected Mosaic-shaped compile errors — real Mosaic only compiles on TPU,
while CI runs interpret mode) and observe recovery instead of a crash:
group-cap retry 16 → 8 → 4 → 2 → 1, then the dense-backend fallback.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_bfs_rans_tpu.kernels import banded
from gnn_bfs_rans_tpu.kernels.fallback import GroupFallback, is_mosaic_compile_error


@pytest.fixture(autouse=True)
def _reset_cap():
    """The group cap is process-global state: always restore it."""
    before = banded.current_max_group_cap()
    yield
    banded.set_max_group_cap(before)


class TestErrorClassification:
    def test_mosaic_markers_detected(self):
        assert is_mosaic_compile_error(RuntimeError("Mosaic lowering failed"))
        assert is_mosaic_compile_error(
            ValueError("scoped vmem limit exceeded: 18MiB > 16MiB")
        )
        assert is_mosaic_compile_error(Exception("RESOURCE_EXHAUSTED: vmem"))

    def test_chained_cause_detected(self):
        inner = RuntimeError("Mosaic failed")
        outer = ValueError("compile error")
        outer.__cause__ = inner
        assert is_mosaic_compile_error(outer)

    def test_unrelated_errors_not_matched(self):
        assert not is_mosaic_compile_error(TypeError("bad argument"))
        assert not is_mosaic_compile_error(ValueError("shape mismatch"))


class TestChooseGroupCap:
    def test_cap_limits_group(self):
        kwargs = dict(n_tiles=16, window=3, tile=128, feat_bytes=4)
        g_full = banded._choose_group(**kwargs)
        assert g_full == 16
        banded.set_max_group_cap(4)
        assert banded._choose_group(**kwargs) == 4
        banded.set_max_group_cap(1)
        assert banded._choose_group(**kwargs) == 1


class TestGroupFallbackRetry:
    def test_retries_until_cap_small_enough(self):
        calls = []

        def build():
            cap = banded.current_max_group_cap()

            def fn(x):
                calls.append(cap)
                if cap > 2:
                    raise RuntimeError(
                        f"Mosaic: scoped vmem limit exceeded at group {cap}"
                    )
                return x + 1

            return fn

        logs = []
        wrapped = GroupFallback(build, log=logs.append, name="test kernel")
        assert wrapped(1) == 2
        # tried 16 (fail), 8 (fail), 4 (fail), 2 (success)
        assert calls == [16, 8, 4, 2]
        assert banded.current_max_group_cap() == 2
        assert len(logs) == 3 and all("Mosaic" in m for m in logs)
        # subsequent calls reuse the working callable without retrying
        calls.clear()
        assert wrapped(5) == 6
        assert calls == [2]

    def test_dense_fallback_at_cap_one(self):
        def build():
            def fn(x):
                raise RuntimeError("Mosaic: vmem exceeded, always")

            return fn

        logs = []
        wrapped = GroupFallback(
            build, dense_build=lambda: (lambda x: x * 10),
            log=logs.append, name="test kernel",
        )
        assert wrapped(3) == 30
        assert banded.current_max_group_cap() == 1
        assert any("DENSE" in m.upper() for m in logs)
        # permanently dense now
        assert wrapped(4) == 40

    def test_non_mosaic_errors_propagate(self):
        def build():
            def fn(x):
                raise TypeError("a genuine bug")

            return fn

        wrapped = GroupFallback(build, dense_build=lambda: (lambda x: x))
        with pytest.raises(TypeError, match="genuine bug"):
            wrapped(1)
        assert banded.current_max_group_cap() == 16  # untouched

    def test_no_dense_build_reraises_at_cap_one(self):
        def build():
            def fn(x):
                raise RuntimeError("Mosaic: vmem exceeded")

            return fn

        wrapped = GroupFallback(build, log=lambda m: None)
        with pytest.raises(RuntimeError, match="Mosaic"):
            wrapped(1)
        assert banded.current_max_group_cap() == 1


class TestTrainerRecovery:
    """End-to-end: a pallas Trainer whose GAT kernel 'fails to compile' at
    large group caps trains to completion after automatic cap lowering."""

    def test_training_recovers_from_mosaic_failure(self, tmp_path, monkeypatch):
        from gnn_bfs_rans_tpu.models.flow_gnn import ModelConfig
        from gnn_bfs_rans_tpu.train import TrainConfig, Trainer, load_dataset

        real_kernel = banded.banded_gat_mean

        def flaky_kernel(*args, **kwargs):
            if banded.current_max_group_cap() > 4:
                raise RuntimeError(
                    "Mosaic lowering failed: scoped vmem limit exceeded"
                )
            return real_kernel(*args, **kwargs)

        def flaky_fused(*args, **kwargs):
            # init/eval hit the fused eval path (deterministic): same cap gate
            if banded.current_max_group_cap() > 4:
                raise RuntimeError(
                    "Mosaic lowering failed: scoped vmem limit exceeded"
                )
            return real_fused(*args, **kwargs)

        real_fused = banded.banded_gat_mean_fused
        monkeypatch.setattr(banded, "banded_gat_mean", flaky_kernel)
        monkeypatch.setattr(banded, "banded_gat_mean_fused", flaky_fused)

        ds = load_dataset(
            "/root/reference/OpenFOAM-data", ["282"], with_band=True,
            band_components=("bias_self",),
        )
        mcfg = ModelConfig(hidden_dim=32, num_layers=1, layer_type="GAT",
                           backend="pallas", dropout=0.0)
        tcfg = TrainConfig(lr=1e-3, epochs=1, save_every=5, batch_size=1)
        logs = []
        tr = Trainer(ds, mcfg, tcfg, output_dir=tmp_path, log_fn=logs.append)
        hist = tr.train()
        assert hist["epoch"] == [1]
        assert np.isfinite(hist["train_loss"][0])
        assert banded.current_max_group_cap() <= 4
        assert any("Mosaic" in m for m in logs)
