"""Hash-space (block-axis) index sharding.

The index table is a stack of ``num_blocks`` signature blocks addressed
by ``hash % num_blocks``; this classifier shards that stack over the
``blk`` mesh axis so each device holds a contiguous window of blocks.
Reads stay data-sharded (replicated along ``blk``); every block shard
probes all k-mers of its data shard, forcing the AND word of k-mers it
does not own to 0 (ops/query.py::_gather_and_probe block-sharded mode),
and a ``psum`` over ``blk`` reassembles exact per-read hit counts.

When to use which model-parallel axis (measured on v5e —
docs/performance.md "Block-axis sharding"):

- **Replicate + data-shard** whenever the table fits each device's HBM:
  the slow-gather penalty (~2.9x) is smaller than any redundancy or
  routing cost, so pure DP maximizes throughput.
- **Block-shard** when the table does NOT fit one device (pangenome-
  scale indices, BASELINE config 5) or HBM must be shared with other
  resident models: unlike the ``cls`` axis it splits ANY geometry —
  including field-packed (<= 16 class) and single-class genus tables,
  which have no class-word axis — and at <= 108 MB per shard every
  shard gathers in the fast regime, so it strictly dominates
  cls-sharding at equal shard count.
- **Routed block-sharding** (sort k-mers by owning shard, all_to_all):
  rejected — lax.sort moves 17-22 M elem/s on v5e while the gather it
  would save runs at 81-232 M/s; the sort->gather->unsort pipeline
  measures *slower* than random whole-table gathers at every size
  (tools/microbench_sorted_gather.py).

This is the TPU re-expression of scaling the reference's single-process
COBS index ownership past one machine (reference:
src/xspect/models/probabilistic_filter_model.py:196-235 holds the whole
index in one process; scale-out is per-sample process fan-out only).
"""

import math

import jax
import numpy as np

from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex
from xspect2_tpu.models.svm_head import JaxSVMHead
from xspect2_tpu.ops.query import (
    DEFAULT_CHUNK,
    _next_pow2,
    make_query_body,
    make_reads_query_body,
)
from xspect2_tpu.parallel.mesh import BLK_AXIS, DATA_AXIS
from xspect2_tpu.parallel.sharded import ShardedClassifier, _make_global, _round2

import jax.numpy as jnp


class BlockShardedClassifier(ShardedClassifier):
    """Classification step over a (data, blk) mesh.

    Shares the host-side batching, caching and result-assembly machinery
    of :class:`ShardedClassifier`; only the table layout and the SPMD
    step builders differ (block window + psum instead of class-word
    columns + all_gather).
    """

    def __init__(
        self,
        index: BlockedBitSlicedIndex,
        mesh,
        svm_head: JaxSVMHead | None = None,
        chunk: int = DEFAULT_CHUNK,
        replicate_out: bool | None = None,
    ):
        if BLK_AXIS not in mesh.shape:
            raise ValueError(
                f"mesh has no '{BLK_AXIS}' axis: use make_block_mesh"
            )
        self.index = index
        self.mesh = mesh
        self.svm_head = svm_head
        self.chunk = chunk
        self.n_data = mesh.shape[DATA_AXIS]
        self.n_blk = mesh.shape[BLK_AXIS]

        # pad the block stack to a multiple of the blk axis; padding
        # blocks sit past hash % num_blocks and are never addressed
        blocks = index.num_blocks
        self.blocks_pad = math.ceil(blocks / self.n_blk) * self.n_blk
        self.local_blocks = self.blocks_pad // self.n_blk

        table3 = np.ascontiguousarray(
            index.table.reshape(
                blocks, index.rows_per_block, index.class_words
            ).transpose(0, 2, 1)
        )
        if self.blocks_pad != blocks:
            pad = np.zeros(
                (
                    self.blocks_pad - blocks,
                    index.class_words,
                    index.rows_per_block,
                ),
                dtype=np.uint32,
            )
            table3 = np.concatenate([table3, pad], axis=0)

        self.table_sharding = NamedSharding(mesh, P(BLK_AXIS, None, None))
        self.table3 = _make_global(table3, self.table_sharding)
        self._step_cache: dict = {}
        self._replicate_out = (
            jax.process_count() > 1 if replicate_out is None else replicate_out
        )

    # ------------------------------------------------------------------ SPMD steps

    def _build_step(self, num_chunks: int, max_records: int):
        idx = self.index
        qb = make_query_body(
            k=idx.k,
            num_hashes=idx.num_hashes,
            rows_per_block=idx.rows_per_block,
            class_words=idx.class_words,
            num_classes=idx.num_classes,
            chunk=self.chunk,
            num_chunks=num_chunks,
            max_records=max_records,
            fields_per_word=idx.fields_per_word,
            local_blocks=self.local_blocks,
        )
        head = self.svm_head
        num_real_classes = idx.num_classes
        num_blocks = int(idx.num_blocks)  # static: folds the hash modulo
        local_blocks = self.local_blocks
        replicate = self._replicate_out

        def shard_fn(table3_l, codes_l, rec_l, valid_l, num_kmers_l):
            table2d_l = table3_l.reshape(table3_l.shape[0], -1)
            offset = lax.axis_index(BLK_AXIS) * local_blocks
            hits_partial = jax.vmap(
                lambda c, r, v: qb(table2d_l, c, r, v, num_blocks, offset)
            )(codes_l, rec_l, valid_l)
            # complete per-record vectors across block shards (ICI psum)
            hits_full = lax.psum(hits_partial, BLK_AXIS)

            # file-level totals across data shards
            total_hits = lax.psum(hits_full.sum(axis=(0, 1)), DATA_AXIS)
            total_kmers = lax.psum(num_kmers_l.sum(), DATA_AXIS)
            total_scores = _round2(
                total_hits.astype(jnp.float32)
                / jnp.maximum(total_kmers, 1).astype(jnp.float32)
            )

            if head is not None:
                x = total_scores[None, :num_real_classes]
                pred = head.predict_indices(x, xp=jnp)[0]
            else:
                pred = jnp.argmax(total_scores[:num_real_classes])
            if replicate:
                hits_full = lax.all_gather(
                    hits_full, DATA_AXIS, axis=0, tiled=True
                )
            return hits_full, total_scores, pred

        mapped = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(
                P(BLK_AXIS, None, None),  # table3 (block-major)
                P(DATA_AXIS, None),  # codes
                P(DATA_AXIS, None),  # rec_ids
                P(DATA_AXIS, None),  # valid
                P(DATA_AXIS, None),  # num_kmers
            ),
            out_specs=(
                P(None, None, None) if replicate else P(DATA_AXIS, None, None),
                P(),
                P(),
            ),
            check_vma=False,
        )
        return jax.jit(mapped)

    def _build_reads_step(self, read_len: int, step: int, reads_per_chunk: int):
        idx = self.index
        qb = make_reads_query_body(
            read_len=read_len,
            k=idx.k,
            num_hashes=idx.num_hashes,
            rows_per_block=idx.rows_per_block,
            class_words=idx.class_words,
            num_classes=idx.num_classes,
            step=step,
            reads_per_chunk=reads_per_chunk,
            fields_per_word=idx.fields_per_word,
            local_blocks=self.local_blocks,
        )
        num_blocks = int(idx.num_blocks)  # static: folds the hash modulo
        local_blocks = self.local_blocks
        replicate = self._replicate_out

        def shard_fn(table3_l, reads_l):
            table2d_l = table3_l.reshape(table3_l.shape[0], -1)
            offset = lax.axis_index(BLK_AXIS) * local_blocks
            hits_partial = qb(table2d_l, reads_l, num_blocks, offset)
            # complete per-read class vectors across block shards (ICI)
            hits = lax.psum(hits_partial, BLK_AXIS)
            if replicate:
                hits = lax.all_gather(hits, DATA_AXIS, axis=0, tiled=True)
            return hits

        mapped = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P(BLK_AXIS, None, None), P(DATA_AXIS, None)),
            out_specs=P(None, None) if replicate else P(DATA_AXIS, None),
            check_vma=False,
        )
        return jax.jit(mapped)

    # prepare_shard_batches / classify / count_hits_reads /
    # count_hits_reads_local are inherited: they only touch self.n_data,
    # self.table3, the step cache and the mesh's data axis, all of which
    # this class provides.
