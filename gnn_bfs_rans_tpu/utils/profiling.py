"""Profiling and debugging aids (SURVEY.md §5 tracing/observability plan).

The reference has only tqdm progress bars; here:

* ``trace`` — context manager around ``jax.profiler`` writing a TensorBoard
  trace directory (viewable with xprof/tensorboard);
* ``enable_nan_checks`` — toggles ``jax_debug_nans`` (the single-controller
  analog of a sanitizer: any NaN produced under jit raises at the op);
* ``log_compile_times`` — toggles XLA compilation logging.
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/jax-trace"):
    """Profile a block: ``with trace('dir'): step()`` → TensorBoard trace."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def log_compile_times(enable: bool = True) -> None:
    jax.config.update("jax_log_compiles", enable)


def device_memory_stats() -> dict:
    """Per-device memory statistics (bytes) where the backend reports them."""
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except (AttributeError, NotImplementedError):
            stats[str(d)] = None
    return stats
