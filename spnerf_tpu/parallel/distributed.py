"""Multi-host (DCN) initialization.

Single-host multi-chip needs nothing: the local mesh covers all devices.
For multi-host sweeps (e.g. COCO-scale homographic-adaptation export
sharded across pod slices), call ``maybe_initialize_distributed()``
before any jax usage; it initializes jax.distributed from the standard
environment (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID, or the TPU pod metadata JAX discovers automatically).

The training mesh then spans ``jax.devices()`` (global), and batch
sharding in parallel/mesh.py places per-host shards from each host's
loader — XLA routes gradient psums over ICI within a slice and DCN
across slices.
"""

from __future__ import annotations

import os


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when a multi-process env is configured.

    Returns True if distributed mode was initialized.
    """
    import jax

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if not coord or not nproc or int(nproc) <= 1:
        return False
    # Sharded exports have no cross-process sync points until exit, so
    # shard-duration skew (stragglers, heterogeneous hosts) lands
    # entirely on the coordination service's shutdown barrier; jax's
    # 300s default kills every process when one shard runs long.
    shutdown_s = int(os.environ.get("JAX_SHUTDOWN_TIMEOUT_SECONDS", 300))
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nproc),
        process_id=int(os.environ.get("JAX_PROCESS_ID", 0)),
        shutdown_timeout_seconds=shutdown_s,
    )
    return True


def process_local_batch_slice(global_batch_size: int) -> tuple[int, int]:
    """(start, size) of this process's slice of the global batch."""
    import jax

    n = jax.process_count()
    i = jax.process_index()
    per = global_batch_size // n
    return i * per, per
