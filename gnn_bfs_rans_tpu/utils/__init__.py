"""Utilities: benchmarking, profiling, config helpers."""

from .bench import run_benchmark, time_fn
from .cache import enable_compilation_cache

__all__ = ["run_benchmark", "time_fn", "enable_compilation_cache"]
