"""Multi-chip scale-out: device mesh, sharded classification step.

The reference scales out by launching one process per sample under
Nextflow/Slurm (reference: scripts/benchmark/classify/main.nf:1-24,
maxForks fan-out).  Here the same surface is a first-class SPMD program:

- **data axis**: read batches sharded across chips (replaces process
  fan-out),
- **cls axis**: the index bit-matrix sharded by class word-columns when
  it exceeds one chip's HBM (each chip holds ``class_words/n_cls``
  32-class word columns),
- per-shard hit partials merged with ``all_gather`` (per-record vectors)
  and ``psum`` (file-level totals) over ICI before SVM scoring.
"""

from xspect2_tpu.parallel.mesh import make_mesh
from xspect2_tpu.parallel.sharded import ShardedClassifier

__all__ = ["make_mesh", "ShardedClassifier"]
