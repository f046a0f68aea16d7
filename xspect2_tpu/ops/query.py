"""Batched k-mer membership query as a single jitted XLA computation.

Pipeline (all device-side, per chunk of k-mer positions, inside one
``lax.scan`` so XLA pipelines gather and compute):

1. pack forward and reverse-complement k-mer windows from a flat uint8
   code tensor into (hi, lo) uint32 word pairs (unrolled static slices,
   VPU-only),
2. canonicalize (element-wise lexicographic min),
3. hash to (block, rows) with the same uint32 mixing as host build,
4. gather each k-mer's index block — ONE contiguous transfer per k-mer,
5. select the ``num_hashes`` probe rows in-register, AND them,
6. unpack per-class bits and segment-sum into per-record hit counts.

This replaces the reference's hot loop (COBS ``Search.search`` per
record, reference: src/xspect/models/probabilistic_filter_model.py:196-235)
with a throughput-oriented batched device op.  Per-record semantics
(k-mer windows never span records, per-record sparse-sampling phase)
are encoded in the host-prepared validity mask.
"""

import math
import os
from dataclasses import dataclass, field
from functools import partial

import jax

# Optional backend override (e.g. XSPECT_JAX_PLATFORM=cpu for host-only
# runs).  Needed because some TPU plugins force-override JAX_PLATFORMS;
# config.update after import takes precedence.
_platform = os.environ.get("XSPECT_JAX_PLATFORM")
if _platform:
    jax.config.update("jax_platforms", _platform)

import jax.numpy as jnp
import numpy as np
from jax import lax

from xspect2_tpu import profiling
from xspect2_tpu.core import hashing
from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex

# k-mer positions per scan step / bases per device batch (env-tunable:
# tests use small chunks to keep CPU jit compiles fast)
DEFAULT_CHUNK = int(os.environ.get("XSPECT_QUERY_CHUNK", 1 << 16))
DEFAULT_MAX_BATCH_BASES = int(os.environ.get("XSPECT_MAX_BATCH_BASES", 1 << 23))


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


@dataclass
class PreparedBatch:
    """Host-prepared flat batch of records for one device query call."""

    codes: np.ndarray  # uint8 [num_positions + k - 1]
    rec_ids: np.ndarray  # int32 [num_positions]
    valid: np.ndarray  # bool  [num_positions]  (k-mer start validity)
    record_names: list[str] = field(default_factory=list)
    num_kmers: list[int] = field(default_factory=list)  # per record, ceil((len-k+1)/step)

    @property
    def num_records(self) -> int:
        return len(self.record_names)

    @property
    def num_positions(self) -> int:
        return len(self.rec_ids)


def prepare_batch(records, k: int, step: int = 1, chunk: int = DEFAULT_CHUNK):
    """Flatten records into a :class:`PreparedBatch`.

    ``records`` is a list of (name, codes_uint8) pairs.  Every record must
    be strictly longer than k (reference contract, reference:
    src/xspect/models/probabilistic_filter_model.py:224-225).
    """
    from xspect2_tpu.core.dna import INVALID

    names = []
    num_kmers = []
    code_parts = []
    rec_id_parts = []
    valid_parts = []
    for idx, (name, codes) in enumerate(records):
        n = len(codes)
        if not n > k:
            raise ValueError("Invalid sequence, must be longer than k")
        names.append(name)
        nk = n - k + 1
        num_kmers.append(math.ceil(nk / step))
        code_parts.append(codes)
        rec_id_parts.append(np.full(n, idx, dtype=np.int32))
        v = np.zeros(n, dtype=bool)
        v[0:nk:step] = True
        valid_parts.append(v)

    codes = np.concatenate(code_parts) if code_parts else np.zeros(0, dtype=np.uint8)
    rec_ids = np.concatenate(rec_id_parts) if rec_id_parts else np.zeros(0, np.int32)
    valid = np.concatenate(valid_parts) if valid_parts else np.zeros(0, dtype=bool)

    # pad the position axis to a whole number of chunks (power-of-two count
    # to bound jit-cache size), plus a k-1 halo on the code tensor
    n_pos = len(rec_ids)
    num_chunks = _next_pow2(max(1, -(-n_pos // chunk)))
    n_pad = num_chunks * chunk
    codes_pad = np.full(n_pad + k - 1, INVALID, dtype=np.uint8)
    codes_pad[:n_pos] = codes
    rec_ids_pad = np.zeros(n_pad, dtype=np.int32)
    rec_ids_pad[:n_pos] = rec_ids
    valid_pad = np.zeros(n_pad, dtype=bool)
    valid_pad[:n_pos] = valid

    return PreparedBatch(codes_pad, rec_ids_pad, valid_pad, names, num_kmers)


def prepare_fixed_batch(
    codes_matrix: np.ndarray, k: int, step: int = 1, chunk: int = DEFAULT_CHUNK
) -> PreparedBatch:
    """Vectorized batch prep for N equal-length reads (shape [N, L]).

    Same semantics as :func:`prepare_batch` but built with broadcasting —
    used by the high-throughput read-streaming path where per-record
    Python loops would dominate.
    """
    from xspect2_tpu.core.dna import INVALID

    n, length = codes_matrix.shape
    if not length > k:
        raise ValueError("Invalid sequence, must be longer than k")
    nk = length - k + 1
    num_kmers = math.ceil(nk / step)

    n_pos = n * length
    num_chunks = _next_pow2(max(1, -(-n_pos // chunk)))
    n_pad = num_chunks * chunk

    codes = np.full(n_pad + k - 1, INVALID, dtype=np.uint8)
    codes[:n_pos] = codes_matrix.reshape(-1)
    rec_ids = np.zeros(n_pad, dtype=np.int32)
    rec_ids[:n_pos] = np.repeat(np.arange(n, dtype=np.int32), length)
    valid_row = np.zeros(length, dtype=bool)
    valid_row[0:nk:step] = True
    valid = np.zeros(n_pad, dtype=bool)
    valid[:n_pos] = np.broadcast_to(valid_row, (n, length)).reshape(-1)

    return PreparedBatch(
        codes,
        rec_ids,
        valid,
        [f"read{i}" for i in range(n)],
        [num_kmers] * n,
    )


@partial(
    jax.jit,
    static_argnames=(
        "k",
        "num_hashes",
        "rows_per_block",
        "class_words",
        "num_classes",
        "chunk",
        "num_chunks",
        "max_records",
    ),
)
def query_hits_device(
    table2d,
    codes,
    rec_ids,
    valid,
    num_blocks,
    *,
    k: int,
    num_hashes: int,
    rows_per_block: int,
    class_words: int,
    num_classes: int,
    chunk: int,
    num_chunks: int,
    max_records: int,
):
    """Per-record, per-class hit counts: returns int32 [max_records, num_classes]."""
    return make_query_body(
        k=k,
        num_hashes=num_hashes,
        rows_per_block=rows_per_block,
        class_words=class_words,
        num_classes=num_classes,
        chunk=chunk,
        num_chunks=num_chunks,
        max_records=max_records,
    )(table2d, codes, rec_ids, valid, num_blocks)


def make_query_body(
    *,
    k: int,
    num_hashes: int,
    rows_per_block: int,
    class_words: int,
    num_classes: int,
    chunk: int,
    num_chunks: int,
    max_records: int,
):
    """Build the pure traceable query function for the given static geometry.

    The returned function maps ``(table2d, codes, rec_ids, valid,
    num_blocks) -> int32[max_records, num_classes]`` and is reused both by
    the single-device jit above and by the sharded SPMD path
    (:mod:`xspect2_tpu.parallel`) inside ``shard_map``.
    """
    lo_bases = min(k, 16)
    hi_bases = k - lo_bases

    cls = np.arange(num_classes)
    word_idx = jnp.asarray((cls // 32).astype(np.int32))
    bit_idx = jnp.asarray((cls % 32).astype(np.uint32))

    def query_body(table2d, codes, rec_ids, valid, num_blocks):
        def body(acc, i):
            start = i * chunk
            cchunk = lax.dynamic_slice(codes, (start,), (chunk + k - 1,)).astype(
                jnp.uint32
            )
            rec_chunk = lax.dynamic_slice(rec_ids, (start,), (chunk,))
            valid_chunk = lax.dynamic_slice(valid, (start,), (chunk,))

            zero = jnp.uint32(0)
            f_hi = jnp.zeros((chunk,), jnp.uint32)
            f_lo = jnp.zeros((chunk,), jnp.uint32)
            r_hi = jnp.zeros((chunk,), jnp.uint32)
            r_lo = jnp.zeros((chunk,), jnp.uint32)
            bad = jnp.zeros((chunk,), bool)

            # forward packing: hi = first hi_bases, lo = last lo_bases
            for j in range(k):
                c = cchunk[j : j + chunk]
                cb = c > 3
                bad = bad | cb
                cm = jnp.where(cb, zero, c)
                if j < hi_bases:
                    f_hi = (f_hi << jnp.uint32(2)) | cm
                else:
                    f_lo = (f_lo << jnp.uint32(2)) | cm
            # reverse-complement packing: base t of rc-kmer is comp(code[k-1-t])
            for t in range(k):
                c = cchunk[k - 1 - t : k - 1 - t + chunk]
                cm = jnp.where(c > 3, zero, jnp.uint32(3) - c)
                if t < hi_bases:
                    r_hi = (r_hi << jnp.uint32(2)) | cm
                else:
                    r_lo = (r_lo << jnp.uint32(2)) | cm

            fwd_le = (f_hi < r_hi) | ((f_hi == r_hi) & (f_lo <= r_lo))
            hi = jnp.where(fwd_le, f_hi, r_hi)
            lo = jnp.where(fwd_le, f_lo, r_lo)

            block, rows = hashing.block_and_rows(
                hi, lo, num_blocks, rows_per_block, num_hashes, xp=jnp
            )

            blk = jnp.take(table2d, block.astype(jnp.int32), axis=0)
            # row-select via compare+mask+reduce over the natural minor
            # (lane) axis: take_along_axis here lowers to a serialized
            # ~2GB/s gather (profiled), this formulation stays on the VPU
            rw = rows_per_block * class_words
            lane_row = jax.lax.broadcasted_iota(jnp.int32, (chunk, rw), 1)
            if class_words > 1:
                lane_row = lane_row // class_words
            anded = None
            for h in range(num_hashes):
                m = lane_row == rows[:, h].astype(jnp.int32)[:, None]
                picked = jnp.where(m, blk, jnp.uint32(0))
                if class_words > 1:
                    sel = picked.reshape(
                        chunk, rows_per_block, class_words
                    ).sum(axis=1, dtype=jnp.uint32)
                else:
                    sel = picked.sum(axis=1, dtype=jnp.uint32)[:, None]
                anded = sel if anded is None else (anded & sel)

            # layout-friendly per-class accumulation: every materialized
            # buffer keeps a wide minor dim (chunk / max_records), never
            # the small class dim (TPU pads minor axes to 128 lanes)
            mask = valid_chunk & (~bad)
            planes = []
            for w in range(class_words):
                aw = anded[:, w]
                for c in range(min(32, num_classes - 32 * w)):
                    plane = (aw >> jnp.uint32(c)) & jnp.uint32(1)
                    planes.append(
                        jnp.where(mask, plane, jnp.uint32(0)).astype(jnp.int32)
                    )
            bits_t = jnp.stack(planes, axis=0)  # [C, chunk]
            seg_t = jax.vmap(
                lambda p: jax.ops.segment_sum(
                    p,
                    rec_chunk,
                    num_segments=max_records,
                    indices_are_sorted=True,
                )
            )(bits_t)  # [C, max_records]
            return acc + seg_t, None

        acc0 = jnp.zeros((num_classes, max_records), jnp.int32)
        acc, _ = lax.scan(body, acc0, jnp.arange(num_chunks))
        return acc.T

    return query_body


def pack_reads(reads: np.ndarray):
    """2-bit-pack a [N, L] uint8 code matrix for cheap host->device transfer.

    Returns ``(packed [N, ceil(L/4)] uint8, bad [N, ceil(L/8)] uint8)``:
    4 bases per byte (base i in bits 2*(i%4)) plus a bitmask of invalid
    bases (bit i%8).  Cuts transfer bytes ~4x — important when the host
    link is the bottleneck.
    """
    n, length = reads.shape
    l4 = -(-length // 4) * 4
    l8 = -(-length // 8) * 8
    codes = np.zeros((n, l4), dtype=np.uint8)
    np.minimum(reads, 3, out=codes[:, :length])
    packed = (
        codes.reshape(n, l4 // 4, 4)
        << np.array([0, 2, 4, 6], dtype=np.uint8)[None, None, :]
    )
    packed = np.bitwise_or.reduce(packed, axis=2)
    badbits = np.zeros((n, l8), dtype=np.uint8)
    badbits[:, :length] = reads > 3
    bad = (
        badbits.reshape(n, l8 // 8, 8)
        << np.arange(8, dtype=np.uint8)[None, None, :]
    )
    bad = np.bitwise_or.reduce(bad, axis=2)
    return packed, bad


def _unpack_reads(packed, bad, read_len: int):
    """Device-side inverse of :func:`pack_reads` -> uint32 codes (255=bad)."""
    n = packed.shape[0]
    codes = (
        jnp.repeat(packed, 4, axis=1)
        >> jnp.tile(jnp.asarray([0, 2, 4, 6], jnp.uint8), packed.shape[1])[None, :]
    ) & jnp.uint8(3)
    badb = (
        jnp.repeat(bad, 8, axis=1)
        >> jnp.tile(jnp.arange(8, dtype=jnp.uint8), bad.shape[1])[None, :]
    ) & jnp.uint8(1)
    codes = codes[:, :read_len].astype(jnp.uint32)
    badb = badb[:, :read_len]
    return jnp.where(badb > 0, jnp.uint32(255), codes)


@partial(
    jax.jit,
    static_argnames=(
        "read_len",
        "k",
        "num_hashes",
        "rows_per_block",
        "class_words",
        "num_classes",
        "step",
        "reads_per_chunk",
    ),
)
def query_reads_device(
    table2d,
    packed,
    bad,
    num_blocks,
    *,
    read_len: int,
    k: int,
    num_hashes: int,
    rows_per_block: int,
    class_words: int,
    num_classes: int,
    step: int = 1,
    reads_per_chunk: int = 4096,
):
    """Uniform-read fast path: 2-bit-packed [N, L/4] reads -> int32 [N, C].

    Used by the high-throughput FASTQ streaming path (BASELINE.json
    config 4): no per-position record-id/validity tensors, no
    segment-sum — windows live within one read, so the per-read
    reduction is a plain axis sum.  N must be a multiple of
    ``reads_per_chunk``.
    """
    n = packed.shape[0]
    nk = read_len - k + 1
    num_chunks = n // reads_per_chunk
    lo_bases = min(k, 16)
    hi_bases = k - lo_bases

    cls = np.arange(num_classes)
    word_idx = jnp.asarray((cls // 32).astype(np.int32))
    bit_idx = jnp.asarray((cls % 32).astype(np.uint32))
    step_mask = jnp.asarray(
        (np.arange(nk) % step == 0).astype(np.int32)
    )

    def chunk_fn(_, i):
        packed_c = lax.dynamic_slice(
            packed, (i * reads_per_chunk, 0), (reads_per_chunk, packed.shape[1])
        )
        bad_c = lax.dynamic_slice(
            bad, (i * reads_per_chunk, 0), (reads_per_chunk, bad.shape[1])
        )
        r = _unpack_reads(packed_c, bad_c, read_len)

        zero = jnp.uint32(0)
        shape = (reads_per_chunk, nk)
        f_hi = jnp.zeros(shape, jnp.uint32)
        f_lo = jnp.zeros(shape, jnp.uint32)
        r_hi = jnp.zeros(shape, jnp.uint32)
        r_lo = jnp.zeros(shape, jnp.uint32)
        badw = jnp.zeros(shape, bool)

        for j in range(k):
            c = r[:, j : j + nk]
            cb = c > 3
            badw = badw | cb
            cm = jnp.where(cb, zero, c)
            if j < hi_bases:
                f_hi = (f_hi << jnp.uint32(2)) | cm
            else:
                f_lo = (f_lo << jnp.uint32(2)) | cm
        for t in range(k):
            c = r[:, k - 1 - t : k - 1 - t + nk]
            cm = jnp.where(c > 3, zero, jnp.uint32(3) - c)
            if t < hi_bases:
                r_hi = (r_hi << jnp.uint32(2)) | cm
            else:
                r_lo = (r_lo << jnp.uint32(2)) | cm

        fwd_le = (f_hi < r_hi) | ((f_hi == r_hi) & (f_lo <= r_lo))
        hi = jnp.where(fwd_le, f_hi, r_hi).reshape(-1)
        lo = jnp.where(fwd_le, f_lo, r_lo).reshape(-1)

        block, rows = hashing.block_and_rows(
            hi, lo, num_blocks, rows_per_block, num_hashes, xp=jnp
        )
        blk = jnp.take(table2d, block.astype(jnp.int32), axis=0)
        # compare-select row extraction (see make_query_body for rationale)
        nkm = reads_per_chunk * nk
        rw = rows_per_block * class_words
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (nkm, rw), 1)
        if class_words > 1:
            lane_row = lane_row // class_words
        anded = None
        for h in range(num_hashes):
            m = lane_row == rows[:, h].astype(jnp.int32)[:, None]
            picked = jnp.where(m, blk, jnp.uint32(0))
            if class_words > 1:
                sel = picked.reshape(nkm, rows_per_block, class_words).sum(
                    axis=1, dtype=jnp.uint32
                )
            else:
                sel = picked.sum(axis=1, dtype=jnp.uint32)[:, None]
            anded = sel if anded is None else (anded & sel)

        # per-class popcount with WIDE minor dims only: TPU pads the
        # minor axis to 128 lanes, so materializing [N, C] / [rpc, nk, C]
        # buffers with small C inflates memory traffic up to 16x.  Keep
        # k-mers minor: bit-plane reductions over [rpc, nk] per class.
        mask = (~badw) & (step_mask[None, :] > 0)  # [rpc, nk] bool
        per_class = []
        for w in range(class_words):
            aw = anded[:, w].reshape(reads_per_chunk, nk)  # minor = nk
            for c in range(min(32, num_classes - 32 * w)):
                plane = (aw >> jnp.uint32(c)) & jnp.uint32(1)
                plane = jnp.where(mask, plane, jnp.uint32(0))
                per_class.append(plane.sum(axis=1).astype(jnp.int32))
        hits_t = jnp.stack(per_class, axis=0)  # [C, rpc], minor = rpc
        return None, hits_t

    _, hits_t = lax.scan(chunk_fn, None, jnp.arange(num_chunks))
    # [num_chunks, C, rpc] -> [n, C]
    return jnp.moveaxis(hits_t, 1, 2).reshape(n, num_classes)


class DeviceQueryEngine:
    """Holds a device-resident index table and runs batched queries."""

    def __init__(self, index: BlockedBitSlicedIndex, chunk: int = DEFAULT_CHUNK):
        self.index = index
        self.chunk = chunk
        self.table = jnp.asarray(index.device_table())

    def count_hits(self, batch: PreparedBatch) -> np.ndarray:
        """Hit counts: int64 [batch.num_records, num_classes]."""
        idx = self.index
        if batch.num_records == 0:
            return np.zeros((0, idx.num_classes), dtype=np.int64)
        max_records = _next_pow2(max(8, batch.num_records))
        num_chunks = batch.num_positions // self.chunk
        with profiling.phase("query.dispatch"):
            out = query_hits_device(
                self.table,
                jnp.asarray(batch.codes),
                jnp.asarray(batch.rec_ids),
                jnp.asarray(batch.valid),
                jnp.uint32(idx.num_blocks),
                k=idx.k,
                num_hashes=idx.num_hashes,
                rows_per_block=idx.rows_per_block,
                class_words=idx.class_words,
                num_classes=idx.num_classes,
                chunk=self.chunk,
                num_chunks=num_chunks,
                max_records=max_records,
            )
        with profiling.phase("query.sync"):
            return np.asarray(out)[: batch.num_records].astype(np.int64)

    def count_hits_records(self, records, step: int = 1) -> np.ndarray:
        """Convenience: records = list of (name, codes) -> [n_records, C] hits."""
        batch = prepare_batch(records, self.index.k, step=step, chunk=self.chunk)
        return self.count_hits(batch)

    def count_hits_reads(
        self,
        reads: np.ndarray,
        step: int = 1,
        reads_per_chunk: int = 4096,
        block: bool = True,
    ):
        """Uniform-read fast path: [N, L] uint8 code matrix -> [N, C] hits.

        With ``block=False`` the (possibly padded-to-chunk) device array
        is returned without synchronizing, so callers can pipeline many
        batches and pay the dispatch latency once.
        """
        idx = self.index
        n = len(reads)
        read_len = reads.shape[1]
        n_pad = -(-n // reads_per_chunk) * reads_per_chunk
        if n_pad != n:
            pad = np.full(
                (n_pad - n, read_len), 255, dtype=np.uint8
            )
            reads = np.concatenate([reads, pad])
        packed, badmask = pack_reads(reads)
        out = query_reads_device(
            self.table,
            jnp.asarray(packed),
            jnp.asarray(badmask),
            jnp.uint32(idx.num_blocks),
            read_len=read_len,
            k=idx.k,
            num_hashes=idx.num_hashes,
            rows_per_block=idx.rows_per_block,
            class_words=idx.class_words,
            num_classes=idx.num_classes,
            step=step,
            reads_per_chunk=reads_per_chunk,
        )
        if not block:
            return out
        return np.asarray(out)[:n].astype(np.int64)
