"""Multi-chip scale-out: device mesh, sharded classification step.

The reference scales out by launching one process per sample under
Nextflow/Slurm (reference: scripts/benchmark/classify/main.nf:1-24,
maxForks fan-out).  Here the same surface is a first-class SPMD program:

- **data axis**: read batches sharded across chips (replaces process
  fan-out),
- **cls axis**: the index bit-matrix sharded by class word-columns when
  it exceeds one chip's HBM (each chip holds ``class_words/n_cls``
  32-class word columns),
- **blk axis**: the index sharded by signature blocks (hash space) —
  arbitrary granularity for any geometry, the capacity-scaling axis for
  indices beyond one chip's HBM (block_sharded.py),
- per-shard hit partials merged with ``all_gather`` (per-record vectors)
  and ``psum`` (file-level totals / block partials) over ICI before SVM
  scoring.
"""

from xspect2_tpu.parallel.block_sharded import BlockShardedClassifier
from xspect2_tpu.parallel.mesh import make_block_mesh, make_mesh
from xspect2_tpu.parallel.sharded import ShardedClassifier

__all__ = [
    "BlockShardedClassifier",
    "ShardedClassifier",
    "make_block_mesh",
    "make_mesh",
]
