"""Persistent XLA compilation cache.

Mosaic/XLA compiles of the larger models take minutes on tunneled devices;
the persistent cache makes every repeat CLI invocation (train --resume,
infer, visualize, bench) reuse the compiled executables across processes.
Enabled by default from the CLI and bench entry points; set
``GNN_BFS_RANS_TPU_NO_CACHE=1`` to disable.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on jax's persistent compilation cache; returns the directory."""
    if os.environ.get("GNN_BFS_RANS_TPU_NO_CACHE"):
        return None
    import jax

    path = Path(
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or Path.home() / ".cache" / "gnn_bfs_rans_tpu" / "xla"
    )
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    # cache everything, including fast compiles (the tunnel round trip is
    # what dominates, not local compile time)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return str(path)
