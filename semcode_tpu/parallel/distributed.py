"""Multi-host (multi-process) runtime initialization.

One process per host, one jax.distributed coordinator, a 2-level
``("dcn", "data")`` mesh over the global device set: corpus rows shard over
both axes and per-shard top-k results merge ICI-first
(parallel/mesh.py hierarchical_topk_merge), so only (Q, k) candidate sets
cross DCN. This replaces the reference's scale-out boundary — a gRPC hop to
an external Milvus cluster (reference src/semcode/storage/milvus_store.py:
39-48) — with XLA collectives.

Configuration (settings or env):

    [mesh]
    coordinator = "10.0.0.1:8476"   # SEMCODE_MESH_COORDINATOR
    num_processes = 4                # SEMCODE_MESH_NUM_PROCESSES
    process_id = 0                   # SEMCODE_MESH_PROCESS_ID

On TPU pods, jax.distributed.initialize() can also auto-discover all three
from the TPU metadata server — set num_processes > 1 with no coordinator to
use auto-discovery. Call ``maybe_init_distributed()`` once, before any
device use (the CLI/API entry points do).
"""

from __future__ import annotations

from typing import Optional, Tuple

from ..logger import get_logger

log = get_logger("parallel.distributed")

_initialized = False


def maybe_init_distributed(config=None) -> bool:
    """Initialize jax.distributed when multi-process settings are present.

    Idempotent; returns True if the distributed runtime is (now) active.
    Safe to call in single-process runs: does nothing unless configured.
    """
    global _initialized
    if _initialized:
        return True
    if config is None:
        from ..settings import settings as config  # noqa: PLC0415

    num = int(getattr(config, "mesh_num_processes", 1) or 1)
    if num <= 1:
        return False
    import jax

    coordinator = getattr(config, "mesh_coordinator", None)
    process_id = getattr(config, "mesh_process_id", None)
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = str(coordinator)
        kwargs["num_processes"] = num
        kwargs["process_id"] = int(process_id or 0)
    # else: TPU-pod auto-discovery via the metadata server
    jax.distributed.initialize(**kwargs)
    _initialized = True
    log.info(
        "jax_distributed_initialized",
        processes=jax.process_count(),
        process_index=jax.process_index(),
        global_devices=jax.device_count(),
        local_devices=jax.local_device_count(),
    )
    return True


def multihost_mesh_shape(config=None) -> Optional[Tuple[Tuple[int, int], Tuple[str, str]]]:
    """The 2-level mesh for a multi-process run: hosts x chips-per-host.

    Returns ((n_hosts, chips_per_host), ("dcn", "data")), or None when the
    run is single-process (callers then use the default 1-D data mesh).
    """
    import jax

    if jax.process_count() <= 1:
        return None
    n_hosts = jax.process_count()
    per_host = jax.device_count() // n_hosts
    return (n_hosts, per_host), ("dcn", "data")
