"""Sharded SPMD classification step.

One jitted program runs the full species-classification step over a
(data x cls) mesh:

1. each (data, cls) shard hit-counts its read positions against its
   class word-columns of the index (reusing the single-chip query body),
2. per-record hit vectors are completed with ``all_gather`` over the
   cls axis (ICI),
3. file-level totals are reduced with ``psum`` over the data axis,
4. the SVM head scores the total score vector in-program.

This is the TPU re-expression of the reference's scale-out surface
(Nextflow process fan-out + single-process COBS index ownership,
reference: scripts/benchmark/classify/main.nf, SURVEY §2.4).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import NamedSharding, PartitionSpec as P

from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex
from xspect2_tpu.models.svm_head import JaxSVMHead
from xspect2_tpu.ops.query import (
    DEFAULT_CHUNK,
    PreparedBatch,
    _next_pow2,
    make_query_body,
    make_reads_query_body,
    prepare_batch,
)
from xspect2_tpu.parallel.mesh import CLS_AXIS, DATA_AXIS


def _make_global(host_array, sharding):
    """Build a (possibly multi-host) global array from a host copy.

    Every process passes the same full array; each device materializes
    only its own shard (multi-host safe, unlike a plain device_put).
    """
    return jax.make_array_from_callback(
        host_array.shape, sharding, lambda idx: host_array[idx]
    )


def _round2(x):
    """round-half-even to 2 decimals (matches the reference's Python round)."""
    return jnp.round(x * 100.0) / 100.0


class ShardedClassifier:
    """Runs the classification step over a (data, cls) device mesh."""

    def __init__(
        self,
        index: BlockedBitSlicedIndex,
        mesh,
        svm_head: JaxSVMHead | None = None,
        chunk: int = DEFAULT_CHUNK,
        replicate_out: bool | None = None,
    ):
        self.index = index
        self.mesh = mesh
        self.svm_head = svm_head
        self.chunk = chunk
        self.n_data = mesh.shape[DATA_AXIS]
        self.n_cls = mesh.shape[CLS_AXIS]

        if index.fields_per_word > 1 and self.n_cls > 1:
            raise ValueError(
                "field-packed indices (<= 16 classes) interleave several "
                "signature rows per word, so there is no class-word axis to "
                "shard: use n_cls=1 and give every device to the data axis"
            )

        # pad class words to a multiple of the cls-axis size; padding
        # word-columns are all-zero (their classes never hit)
        cw = index.class_words
        self.cw_pad = math.ceil(cw / self.n_cls) * self.n_cls
        self.cw_local = self.cw_pad // self.n_cls
        if self.n_cls > cw:
            import warnings

            warnings.warn(
                f"cls axis ({self.n_cls}) exceeds index class_words ({cw}): "
                f"{self.n_cls - cw} shard(s) query all-zero padding words and "
                "duplicate the probe work. Use n_cls <= class_words (one word "
                "per 32 classes) and give the spare devices to the data axis.",
                stacklevel=2,
            )

        # class-word-major device layout [blocks, cw, rpb] (matches
        # BlockedBitSlicedIndex.device_table), sharded on the cw axis so
        # each cls shard holds whole contiguous class words
        table3 = np.ascontiguousarray(
            index.table.reshape(
                index.num_blocks, index.rows_per_block, cw
            ).transpose(0, 2, 1)
        )
        if self.cw_pad != cw:
            pad = np.zeros(
                (index.num_blocks, self.cw_pad - cw, index.rows_per_block),
                dtype=np.uint32,
            )
            table3 = np.concatenate([table3, pad], axis=1)

        self.table_sharding = NamedSharding(mesh, P(None, CLS_AXIS, None))
        self.table3 = _make_global(table3, self.table_sharding)
        self._step_cache: dict = {}
        # multi-host runs replicate outputs by default (all_gather over
        # the data axis in-program) so every process can fetch the full
        # result; single-process keeps outputs data-sharded (no extra
        # collective).  replicate_out=False on multi-host switches
        # count_hits_reads to return only this process's data-shard rows
        # — the throughput mode for host-local result handling (each
        # host writes its own reads' results, like the reference's
        # per-sample process fan-out)
        self._replicate_out = (
            jax.process_count() > 1 if replicate_out is None else replicate_out
        )

    # ------------------------------------------------------------------ host-side batching

    def prepare_shard_batches(self, records, step: int = 1):
        """Split (name, codes) records across data shards; returns stacked
        arrays [D, ...] plus per-shard record names.

        Records are assigned round-robin by cumulative length so shards
        are base-balanced; all shards are padded to common shapes.
        """
        shards: list[list] = [[] for _ in range(self.n_data)]
        loads = [0] * self.n_data
        for rec in records:
            target = loads.index(min(loads))
            shards[target].append(rec)
            loads[target] += len(rec[1])

        batches = []
        for shard_records in shards:
            if shard_records:
                batches.append(
                    prepare_batch(shard_records, self.index.k, step, self.chunk)
                )
            else:
                batches.append(
                    PreparedBatch(
                        np.full(self.chunk + self.index.k - 1, 255, np.uint8),
                        np.zeros(self.chunk, np.int32),
                        np.zeros(self.chunk, bool),
                    )
                )

        n_pos = max(b.num_positions for b in batches)
        max_records = _next_pow2(
            max(8, max(b.num_records for b in batches) or 1)
        )
        k = self.index.k

        codes = np.full((self.n_data, n_pos + k - 1), 255, dtype=np.uint8)
        rec_ids = np.zeros((self.n_data, n_pos), dtype=np.int32)
        valid = np.zeros((self.n_data, n_pos), dtype=bool)
        num_kmers = np.zeros((self.n_data, max_records), dtype=np.int32)
        for d, b in enumerate(batches):
            codes[d, : len(b.codes)] = b.codes
            rec_ids[d, : b.num_positions] = b.rec_ids
            valid[d, : b.num_positions] = b.valid
            for i, nk in enumerate(b.num_kmers):
                num_kmers[d, i] = nk
        names = [b.record_names for b in batches]
        return codes, rec_ids, valid, num_kmers, names

    # ------------------------------------------------------------------ SPMD step

    def _build_step(self, num_chunks: int, max_records: int):
        idx = self.index
        cw_local = self.cw_local
        num_classes_local = (
            idx.num_classes if idx.fields_per_word > 1 else 32 * cw_local
        )
        qb = make_query_body(
            k=idx.k,
            num_hashes=idx.num_hashes,
            rows_per_block=idx.rows_per_block,
            class_words=cw_local,
            num_classes=num_classes_local,
            chunk=self.chunk,
            num_chunks=num_chunks,
            max_records=max_records,
            fields_per_word=idx.fields_per_word,
        )
        head = self.svm_head
        num_real_classes = idx.num_classes
        num_blocks = int(idx.num_blocks)  # static: folds the hash modulo

        def shard_fn(table3_l, codes_l, rec_l, valid_l, num_kmers_l):
            table2d_l = table3_l.reshape(table3_l.shape[0], -1)
            hits_l = jax.vmap(
                lambda c, r, v: qb(table2d_l, c, r, v, num_blocks)
            )(codes_l, rec_l, valid_l)
            # complete per-record vectors across class shards (ICI all-gather)
            hits_full = jax.lax.all_gather(hits_l, CLS_AXIS, axis=2, tiled=True)

            # file-level totals across data shards (psum)
            total_hits = jax.lax.psum(
                hits_full.sum(axis=(0, 1)), DATA_AXIS
            )
            total_kmers = jax.lax.psum(num_kmers_l.sum(), DATA_AXIS)
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
                hits_full = jax.lax.all_gather(
                    hits_full, DATA_AXIS, axis=0, tiled=True
                )
            return hits_full, total_scores, pred

        replicate = self._replicate_out
        mapped = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(
                P(None, CLS_AXIS, None),  # table3 (cw-major)
                P(DATA_AXIS, None),  # codes
                P(DATA_AXIS, None),  # rec_ids
                P(DATA_AXIS, None),  # valid
                P(DATA_AXIS, None),  # num_kmers
            ),
            out_specs=(
                # per-record hits: data-sharded, or fully replicated on
                # multi-host runs so every process can fetch them
                P(None, None, None) if replicate else P(DATA_AXIS, None, None),
                P(),  # total scores (replicated)
                P(),  # prediction (replicated)
            ),
            check_vma=False,
        )
        return jax.jit(mapped)

    def _build_reads_step(self, read_len: int, step: int, reads_per_chunk: int):
        idx = self.index
        cw_local = self.cw_local
        qb = make_reads_query_body(
            read_len=read_len,
            k=idx.k,
            num_hashes=idx.num_hashes,
            rows_per_block=idx.rows_per_block,
            class_words=cw_local,
            num_classes=(
                idx.num_classes if idx.fields_per_word > 1 else 32 * cw_local
            ),
            step=step,
            reads_per_chunk=reads_per_chunk,
            fields_per_word=idx.fields_per_word,
        )

        num_blocks = int(idx.num_blocks)  # static: folds the hash modulo

        replicate = self._replicate_out

        def shard_fn(table3_l, reads_l):
            table2d_l = table3_l.reshape(table3_l.shape[0], -1)
            hits_l = qb(table2d_l, reads_l, num_blocks)  # [n_local, 32*cw_local]
            # complete per-read class vectors across class shards (ICI)
            hits = jax.lax.all_gather(hits_l, CLS_AXIS, axis=1, tiled=True)
            if replicate:
                hits = jax.lax.all_gather(hits, DATA_AXIS, axis=0, tiled=True)
            return hits

        mapped = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P(None, CLS_AXIS, None), P(DATA_AXIS, None)),
            out_specs=P(None, None) if replicate else P(DATA_AXIS, None),
            check_vma=False,
        )
        return jax.jit(mapped)

    def count_hits_reads(
        self, reads: np.ndarray, step: int = 1, reads_per_chunk: int = 1024
    ) -> np.ndarray:
        """Sharded uniform-read fast path: [N, L] codes -> [N, C] hits.

        Reads are data-parallel over the data axis; the index table is
        sharded by class word-columns over the cls axis; per-read class
        vectors are completed with an ``all_gather`` over ICI.  The
        multi-chip analogue of
        :meth:`~xspect2_tpu.ops.query.DeviceQueryEngine.count_hits_reads`
        (matches it exactly; pinned by tests/test_parallel.py).

        In local-rows mode (``replicate_out=False`` on a multi-process
        mesh) the return value is ``(local_hits, row_start)``: this
        process's contiguous slice of the global [N, C] result (padding
        rows trimmed) plus the global row index of its first row, so
        callers can map rows back to input reads.
        """
        n, read_len = reads.shape
        unit = self.n_data * reads_per_chunk
        n_pad = unit * _next_pow2(max(1, -(-n // unit)))
        if n_pad != n:
            pad = np.full((n_pad - n, read_len), 255, dtype=np.uint8)
            reads = np.concatenate([reads, pad])
        key = ("reads", read_len, step, reads_per_chunk)
        if key not in self._step_cache:
            self._step_cache[key] = self._build_reads_step(
                read_len, step, reads_per_chunk
            )
        step_fn = self._step_cache[key]
        reads_sharded = _make_global(
            reads, NamedSharding(self.mesh, P(DATA_AXIS, None))
        )
        hits = step_fn(self.table3, reads_sharded)

        if not self._replicate_out and jax.process_count() > 1:
            # local-rows mode: assemble only this process's data shards.
            # The output is replicated over the cls axis, so devices
            # differing only in cls coordinate hold identical row blocks
            # — keep one shard per distinct row range
            by_start = {}
            for s in hits.addressable_shards:
                by_start.setdefault(s.index[0].start or 0, s)
            starts = sorted(by_start)
            expected = starts[0] + by_start[starts[0]].data.shape[0]
            for st in starts[1:]:
                if st != expected:
                    raise RuntimeError(
                        "local data shards are not contiguous on this "
                        "process; use replicate_out=True for this mesh"
                    )
                expected += by_start[st].data.shape[0]
            local = np.concatenate(
                [np.asarray(by_start[st].data) for st in starts]
            )
            # trim global padding rows (they sit past row n) so every
            # returned row maps to input read row_start + i
            row_start = starts[0]
            n_valid = max(0, min(n, row_start + local.shape[0]) - row_start)
            local = local[:n_valid, : self.index.num_classes].astype(np.int64)
            return local, row_start
        return np.asarray(hits)[:n, : self.index.num_classes].astype(np.int64)

    def count_hits_reads_local(
        self, reads: np.ndarray, step: int = 1, reads_per_chunk: int = 1024
    ) -> np.ndarray:
        """Host-sharded input: each process passes ONLY its own reads.

        The multi-host data-loading path (SURVEY §2.4: host-side sharded
        input for DP over reads): every process reads its own slice of
        the input (its own FASTQ shard), pads it locally, and places it
        directly onto its addressable devices — no process ever
        materializes, pads, or copies the global read set the way
        :meth:`count_hits_reads` does.  All processes must pass the SAME
        number of rows (pad the tail host's input if uneven).  Returns
        this process's [n_local, C] hit counts (row i = local read i).
        """
        n_local, read_len = reads.shape
        nproc = jax.process_count()
        n_data_local = self.n_data // nproc
        if n_data_local * nproc != self.n_data:
            raise ValueError(
                f"data axis ({self.n_data}) must divide evenly over "
                f"{nproc} processes for host-sharded input"
            )
        unit = n_data_local * reads_per_chunk
        n_local_pad = unit * _next_pow2(max(1, -(-n_local // unit)))
        if n_local_pad != n_local:
            pad = np.full((n_local_pad - n_local, read_len), 255, dtype=np.uint8)
            reads = np.concatenate([reads, pad])

        key = ("reads", read_len, step, reads_per_chunk)
        if key not in self._step_cache:
            self._step_cache[key] = self._build_reads_step(
                read_len, step, reads_per_chunk
            )
        step_fn = self._step_cache[key]

        global_shape = (n_local_pad * nproc, read_len)
        sharding = NamedSharding(self.mesh, P(DATA_AXIS, None))
        row0 = jax.process_index() * n_local_pad
        arrays = []
        for dev, idx in sharding.addressable_devices_indices_map(
            global_shape
        ).items():
            rows = idx[0]
            lo = (rows.start or 0) - row0
            hi = (global_shape[0] if rows.stop is None else rows.stop) - row0
            if lo < 0 or hi > n_local_pad:
                raise RuntimeError(
                    "this process's devices do not own a contiguous "
                    f"[{row0}, {row0 + n_local_pad}) row block; host-sharded "
                    "input requires the default process-major device order"
                )
            arrays.append(jax.device_put(reads[lo:hi], dev))
        reads_sharded = jax.make_array_from_single_device_arrays(
            global_shape, sharding, arrays
        )
        hits = step_fn(self.table3, reads_sharded)

        if self._replicate_out and nproc > 1:
            full = np.asarray(hits)
            local = full[row0 : row0 + n_local_pad]
        else:
            by_start = {}
            for s in hits.addressable_shards:
                by_start.setdefault(s.index[0].start or 0, s)
            local = np.concatenate(
                [np.asarray(by_start[st].data) for st in sorted(by_start)]
            )
        return local[:n_local, : self.index.num_classes].astype(np.int64)

    def classify(self, records, step: int = 1):
        """Full sharded classification of (name, codes) records.

        Returns (per_record_hits dict-of-dicts, total_scores dict,
        prediction-or-None).
        """
        codes, rec_ids, valid, num_kmers, names = self.prepare_shard_batches(
            records, step
        )
        num_chunks = rec_ids.shape[1] // self.chunk
        max_records = num_kmers.shape[1]
        key = (num_chunks, max_records)
        if key not in self._step_cache:
            self._step_cache[key] = self._build_step(num_chunks, max_records)
        step_fn = self._step_cache[key]

        dsh = lambda a: _make_global(
            a, NamedSharding(self.mesh, P(*((DATA_AXIS,) + (None,) * (a.ndim - 1))))
        )
        hits, total_scores, pred = step_fn(
            self.table3, dsh(codes), dsh(rec_ids), dsh(valid), dsh(num_kmers)
        )
        hits = np.asarray(hits)
        total_scores = np.asarray(total_scores)

        class_names = self.index.class_names
        per_record = {}
        for d, shard_names in enumerate(names):
            for i, name in enumerate(shard_names):
                per_record[name] = {
                    class_names[c]: int(hits[d, i, c])
                    for c in range(len(class_names))
                }
        totals = {
            class_names[c]: float(total_scores[c])
            for c in range(len(class_names))
        }
        prediction = None
        if self.svm_head is not None:
            prediction = self.svm_head.classes[int(pred)]
        return per_record, totals, prediction
