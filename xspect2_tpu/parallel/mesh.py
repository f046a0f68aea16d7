"""Device mesh construction for data x model-shard parallelism.

Two model-parallel axes exist, used one at a time next to ``data``:

- ``cls`` — shard the index by class word-columns (32 classes per
  word); granularity is limited to ``class_words`` and field-packed
  indices cannot use it at all.
- ``blk`` — shard the index by signature blocks (hash space); any
  geometry splits to arbitrary granularity, at the cost of every block
  shard probing every k-mer of its data shard (masked to its own
  blocks; see parallel/block_sharded.py for when this wins).
"""

import numpy as np
import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
CLS_AXIS = "cls"
BLK_AXIS = "blk"


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


def make_block_mesh(
    n_data: int | None = None,
    n_blk: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a (data, blk) mesh over the available devices.

    The block axis is the inner (fastest-varying) axis so the block
    shards that must ``psum`` each data shard's partial hit counts sit
    on neighboring chips (ICI-adjacent on a ring/torus).
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        if len(devices) % n_blk:
            raise ValueError(
                f"{len(devices)} devices not divisible by n_blk={n_blk}"
            )
        n_data = len(devices) // n_blk
    needed = n_data * n_blk
    if needed > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_blk} needs {needed} devices, have {len(devices)}"
        )
    mesh_devices = np.asarray(devices[:needed]).reshape(n_data, n_blk)
    return Mesh(mesh_devices, (DATA_AXIS, BLK_AXIS))
