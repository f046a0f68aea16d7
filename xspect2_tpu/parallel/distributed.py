"""Multi-host distributed runtime.

The reference has no distributed communication backend at all — cross-
machine scale is Slurm jobs with file hand-off (SURVEY §5).  Here
multi-host runs use JAX's native distributed runtime: every host calls
:func:`initialize`, builds the same global (data x cls) mesh over all
devices, and feeds its local shard of the read stream; collectives ride
ICI within a slice and DCN across slices.

Typical multi-host launch (same command on every host)::

    from xspect2_tpu.parallel import distributed, make_mesh
    distributed.initialize()                  # env-driven coordinator
    mesh = make_mesh(n_cls=2)                 # global devices
    clf = ShardedClassifier(index, mesh, ...) # identical on every host
"""

import logging
import os

import jax

logger = logging.getLogger("xspect2_tpu.distributed")


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize the JAX distributed runtime (no-op for single process).

    Arguments default to the standard environment variables
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``) or TPU pod auto-detection.  Returns a summary
    dict of the resulting topology.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address or num_processes:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    topology = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
    logger.info("distributed topology: %s", topology)
    return topology


def local_data_shard(items: list, axis_size: int | None = None) -> list:
    """The slice of a global work list owned by this process.

    Round-robin assignment by process index — the host-side input
    pipeline for data-parallel read streaming (each host parses and
    packs only its own shard of the input files).
    """
    count = jax.process_count() if axis_size is None else axis_size
    idx = jax.process_index()
    return [item for i, item in enumerate(items) if i % count == idx]
