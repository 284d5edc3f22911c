"""Multi-host initialization for real TPU pod slices.

One chip/host is what CI and the bundled benchmarks use; on an actual pod
slice, call :func:`initialize_multihost` once at program start (before any
jax computation) and every module in ``parallel/`` works unchanged — the
device mesh simply spans hosts, and XLA routes the same collectives over
ICI within a slice and DCN across slices.

Testing without a pod (SURVEY.md §4): ``XLA_FLAGS=
--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu`` fakes N devices
in-process, which is exactly what tests/conftest.py configures.
"""

from __future__ import annotations

import os

import jax


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize jax.distributed; no-ops cleanly in single-process runs.

    With TPU metadata available (GCE/pod runtime) argument-free
    ``jax.distributed.initialize()`` autodetects everything; explicit
    coordinator settings cover manual clusters.
    """
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and already():
        pass
    elif num_processes is not None or coordinator_address is not None or (
        os.environ.get("JAX_COORDINATOR_ADDRESS")
    ):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
