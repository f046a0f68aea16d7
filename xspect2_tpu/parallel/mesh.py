"""Device mesh construction for data x class-shard parallelism."""

import numpy as np
import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
CLS_AXIS = "cls"


def make_mesh(
    n_data: int | None = None,
    n_cls: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a (data, cls) mesh over the available devices.

    ``n_data`` defaults to ``len(devices) // n_cls``.  The class axis is
    the inner (fastest-varying) axis so class shards of the same data
    shard sit on neighboring chips (ICI-adjacent on a ring/torus).
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        if len(devices) % n_cls:
            raise ValueError(
                f"{len(devices)} devices not divisible by n_cls={n_cls}"
            )
        n_data = len(devices) // n_cls
    needed = n_data * n_cls
    if needed > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_cls} needs {needed} devices, have {len(devices)}"
        )
    mesh_devices = np.asarray(devices[:needed]).reshape(n_data, n_cls)
    return Mesh(mesh_devices, (DATA_AXIS, CLS_AXIS))
