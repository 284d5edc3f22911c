"""Utilities: benchmarking, profiling, config helpers."""

from .bench import run_benchmark, time_fn

__all__ = ["run_benchmark", "time_fn"]
