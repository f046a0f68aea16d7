"""Batched k-mer membership query as a single jitted XLA computation.

Pipeline (all device-side, per chunk of k-mer positions, inside one
``lax.scan`` so XLA pipelines gather and compute):

1. pack forward and reverse-complement k-mer windows from a flat uint8
   code tensor into (hi, lo) uint32 word pairs (unrolled static slices,
   VPU-only),
2. canonicalize (element-wise lexicographic min),
3. hash to (block, rows) with the same uint32 mixing as host build,
4. gather each k-mer's index block — ONE contiguous transfer per k-mer
   (512 B = one (1, 128)-lane tile row, the measured gather sweet spot),
5. AND the ``num_hashes`` probe rows in ONE pass: a [n, rows_per_block]
   selected-row mask, unselected rows forced to all-ones, and a single
   AND-reduce along the lane axis (class-word-major block layout),
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

# Persistent XLA compilation cache: the first compile of a query shape
# costs tens of seconds (remote compile on tunneled TPUs); caching makes
# repeat CLI invocations start in milliseconds.  Users override by
# setting any of these before import.
if not os.environ.get("XSPECT_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "XSPECT_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "xspect2-jax"),
    )
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")

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
    # record start positions in the flat code tensor ([num_records + 1],
    # last entry = total real bases): the compact wire derives rec_ids
    # and validity on device from these instead of shipping them
    offsets: np.ndarray | None = None
    # sparse-sampling step baked into ``valid``; the compact wire
    # re-derives the phase mask on device and needs it explicitly.
    # NOTE: the ragged-records path implements step by MASKING (each
    # record's stride restarts at its own offset, so a static slice of
    # the flat position stream cannot express it) — step therefore
    # does not reduce this path's gather work.  The uniform-reads fast
    # path (make_reads_query_body) strides the sampled windows out
    # before the gather and gets the ~step-fold device speedup; route
    # throughput-sensitive sparse queries there.
    step: int = 1
    # lazily cached device-resident compact wire: engines with equal
    # chunk geometry querying the SAME batch (e.g. every MLST locus of
    # one genome) share one host pack + host->device transfer instead
    # of paying it per engine (the transfer dominates through the
    # 25 ms-floor dev tunnel)
    _device_wire: dict = field(
        default_factory=dict, repr=False, compare=False
    )

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

    offsets = np.zeros(len(names) + 1, dtype=np.int32)
    np.cumsum([len(c) for c in code_parts], out=offsets[1:])

    return PreparedBatch(
        codes_pad, rec_ids_pad, valid_pad, names, num_kmers, offsets, step
    )


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
        "num_blocks",
        "k",
        "num_hashes",
        "rows_per_block",
        "class_words",
        "num_classes",
        "chunk",
        "num_chunks",
        "max_records",
        "fields_per_word",
    ),
)
def query_hits_device(
    table2d,
    codes,
    rec_ids,
    valid,
    *,
    num_blocks: int,
    k: int,
    num_hashes: int,
    rows_per_block: int,
    class_words: int,
    num_classes: int,
    chunk: int,
    num_chunks: int,
    max_records: int,
    fields_per_word: int = 1,
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
        fields_per_word=fields_per_word,
    )(table2d, codes, rec_ids, valid, num_blocks)


@partial(
    jax.jit,
    static_argnames=(
        "num_blocks",
        "k",
        "step",
        "num_hashes",
        "rows_per_block",
        "class_words",
        "num_classes",
        "chunk",
        "num_chunks",
        "max_records",
        "fields_per_word",
    ),
)
def query_hits_packed_batch_device(
    table2d,
    packed,
    bad_pos,
    offsets,
    *,
    num_blocks: int,
    k: int,
    step: int,
    num_hashes: int,
    rows_per_block: int,
    class_words: int,
    num_classes: int,
    chunk: int,
    num_chunks: int,
    max_records: int,
    fields_per_word: int = 1,
):
    """Compact-wire batch entry: per-record hit counts from 2-bit codes.

    The raw batch wire ships ~6 bytes per base (uint8 codes + int32
    record ids + bool validity); this entry ships 2-bit packed codes, a
    fixed-size invalid-base patch list, and the [max_records + 1] record
    offsets — everything else is derived on device: record ids by a
    searchsorted over the offsets, window validity from each record's
    k-mer span and the sparse-sampling phase.  ~25x fewer wire bytes on
    the assembly classification path.
    """
    n_pos = chunk * num_chunks
    n_tot = n_pos + k - 1
    shifts = jnp.asarray([0, 2, 4, 6], jnp.uint8)
    codes = ((packed[:, None] >> shifts[None, :]) & jnp.uint8(3)).reshape(-1)[
        :n_tot
    ]
    if bad_pos.shape[0]:
        codes = codes.at[bad_pos].set(jnp.uint8(255), mode="drop")

    pos = jnp.arange(n_pos, dtype=jnp.int32)
    # record r spans [offsets[r], offsets[r+1]); padding positions fall
    # past the last boundary and clamp to the final (empty) record,
    # whose k-mer span is negative -> valid False
    rec_ids = jnp.searchsorted(offsets[1:], pos, side="right").astype(jnp.int32)
    rec_ids = jnp.minimum(rec_ids, jnp.int32(max_records - 1))
    rec_start = jnp.take(offsets, rec_ids)
    rec_end = jnp.take(offsets, rec_ids + 1)
    rel = pos - rec_start
    nk_r = rec_end - rec_start - jnp.int32(k - 1)
    valid = (rel < nk_r) & (rel % jnp.int32(step) == 0)

    codes, rec_ids, valid = lax.optimization_barrier((codes, rec_ids, valid))
    return make_query_body(
        k=k,
        num_hashes=num_hashes,
        rows_per_block=rows_per_block,
        class_words=class_words,
        num_classes=num_classes,
        chunk=chunk,
        num_chunks=num_chunks,
        max_records=max_records,
        fields_per_word=fields_per_word,
    )(table2d, codes, rec_ids, valid, num_blocks)


def _gather_and_probe(
    table2d,
    hi,
    lo,
    *,
    num_blocks: int,
    num_hashes: int,
    rows_per_block: int,
    class_words: int,
    fields_per_word: int,
    local_blocks: int | None = None,
    block_offset=None,
):
    """Gather each k-mer's block and AND its probe rows: [n, cw] uint32.

    One contiguous gather per k-mer (class-word-major block layout, word
    w's rows contiguous), then one masked AND-reduce along the minor
    (lane) axis per *probe slot*: unselected rows are forced to all-ones
    (Kirsch-Mitzenmacher words — base + i*stride, stride odd, rpb a power
    of two — are pairwise distinct within a slot).  With field packing
    (fields_per_word = P > 1; core/blocked_index.py) there are
    ``min(num_hashes, P)`` slots whose reduced words are aligned with a
    cheap per-k-mer variable rotate before the cross-slot AND; with
    P == 1 this is a single AND-reduce pass — measured 2-4x faster than
    per-hash compare+select+sum passes (docs/performance.md).

    Block-sharded mode (``local_blocks``/``block_offset`` set): the
    table holds only the ``local_blocks`` logical blocks starting at
    ``block_offset`` (a traced per-shard scalar).  K-mers owned by other
    shards gather a clamped in-range block and their AND word is forced
    to 0, so a ``psum`` over the block axis reassembles exact hit
    counts (xspect2_tpu.parallel.block_sharded).
    """
    n = hi.shape[0]
    P = fields_per_word
    fb = 32 // P
    F = min(num_hashes, P)
    ones = jnp.uint32(0xFFFFFFFF)

    a, b, c = hashing.kmer_hash_words(hi, lo, xp=jnp)
    block = a % jnp.uint32(num_blocks)
    owned = None
    if local_blocks is not None:
        local = block.astype(jnp.int32) - block_offset.astype(jnp.int32)
        owned = (local >= 0) & (local < local_blocks)
        block = jnp.clip(local, 0, local_blocks - 1)
    blk = jnp.take(table2d, block.astype(jnp.int32), axis=0)
    b3 = blk.reshape(n, class_words, rows_per_block)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (n, rows_per_block), 1)
    if P > 1:
        g = (b >> jnp.uint32(24)) & jnp.uint32(P - 1)

    out = None
    for s in range(F):
        sel = jnp.zeros((n, rows_per_block), bool)
        for i in range(s, num_hashes, P):
            w = (b + jnp.uint32(i) * c) & jnp.uint32(rows_per_block - 1)
            sel = sel | (lane_row == w.astype(jnp.int32)[:, None])
        masked = jnp.where(sel[:, None, :], b3, ones)
        and_s = lax.reduce(masked, ones, lax.bitwise_and, (2,))  # [n, cw]
        if P > 1:
            # probe slot s sits at field (g + s) mod P; rotate it down to
            # field 0 (shift amounts masked &31 so rot=0 stays defined)
            rot = ((g + jnp.uint32(s)) & jnp.uint32(P - 1)) * jnp.uint32(fb)
            v = and_s[:, 0]
            v = (v >> rot) | (v << ((jnp.uint32(32) - rot) & jnp.uint32(31)))
            and_s = v[:, None]
        out = and_s if out is None else out & and_s
    if P > 1:
        out = out & jnp.uint32((1 << fb) - 1)
    if owned is not None:
        out = jnp.where(owned[:, None], out, jnp.uint32(0))
    return out


def _accumulate_reads(
    anded, *, reads_per_chunk: int, nk: int, class_words: int, num_classes: int, lane_bits: int
):
    """Per-read hit counts from AND words: [nkm, cw] -> int32 [C, rpc].

    Lane-packed popcount with WIDE minor dims only: the per-class bit
    planes keep k-mers minor ([cw, rpc, nk]) and several class bits ride
    one pass in independent uint32 lane fields (4 classes/pass in byte
    lanes; per-read counts stay < 2**lane_bits by construction, so lanes
    never carry).  O(lane_bits) program ops regardless of the class
    count — MLST-scale indices (1000+ alleles/locus) trace and compile
    in constant program size.
    """
    cw = class_words
    a3 = anded.T.reshape(cw, reads_per_chunk, nk)
    lane_mask = {8: 0x01010101, 16: 0x00010001, 32: 1}[lane_bits]
    if cw == 1 and num_classes <= lane_bits:
        l0, nlanes = num_classes, 1
    else:
        l0 = lane_bits
        nlanes = (32 // lane_bits) if cw > 1 else -(-num_classes // lane_bits)
    sums = []
    for c0 in range(l0):
        t = (a3 >> jnp.uint32(c0)) & jnp.uint32(lane_mask)
        sums.append(t.sum(axis=2, dtype=jnp.uint32))  # [cw, rpc]
    packed = jnp.stack(sums, axis=1)  # [cw, l0, rpc]
    lane_shift = jnp.arange(nlanes, dtype=jnp.uint32) * jnp.uint32(lane_bits)
    vals = (packed[:, None, :, :] >> lane_shift[None, :, None, None]) & jnp.uint32(
        (1 << lane_bits) - 1
    )
    # class j = 32*w + lane_bits*b + c0  ==  row order of [cw, b, c0]
    return vals.reshape(cw * nlanes * l0, reads_per_chunk)[:num_classes].astype(
        jnp.int32
    )


def _accumulate_segments(
    anded, rec_chunk, *, class_words: int, num_classes: int, max_records: int
):
    """Per-record hit counts from AND words: [chunk, cw] -> int32 [C, max_records].

    Vectorized bit unpack (O(1) program ops in the class count), then
    the per-record reduction as ONE MXU matmul: ``bits[C, chunk] @
    onehot[chunk, R]`` in bf16 with f32 accumulation.  Every term is
    0/1 (exact in bf16) and every cell sums at most ``chunk`` <= 2^24
    of them, so the f32 accumulator is exact.  Replaces a vmapped
    sorted segment-sum over C rows: A/B at the MLST geometry
    ([16384, 32] words -> [1000, 512] counts) measured both ~0.05
    ms/call on v5e — the matmul is the simpler program and scales
    with the MXU rather than the scatter unit at wider class counts;
    bit-exact against the segment-sum path.
    """
    n_shift = 32 if class_words > 1 else num_classes
    shifts = jnp.arange(n_shift, dtype=jnp.uint32)
    a_t = anded.T  # [cw, chunk]
    bits = ((a_t[:, None, :] >> shifts[None, :, None]) & jnp.uint32(1)).astype(
        jnp.bfloat16
    )
    bits = bits.reshape(class_words * n_shift, -1)[:num_classes]  # [C, chunk]
    onehot = (
        rec_chunk[:, None]
        == jnp.arange(max_records, dtype=rec_chunk.dtype)[None, :]
    ).astype(jnp.bfloat16)  # [chunk, R]
    return jnp.matmul(
        bits, onehot, preferred_element_type=jnp.float32
    ).astype(jnp.int32)  # [C, max_records]


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
    fields_per_word: int = 1,
    local_blocks: int | None = None,
):
    """Build the pure traceable query function for the given static geometry.

    The returned function maps ``(table2d, codes, rec_ids, valid,
    num_blocks) -> int32[max_records, num_classes]`` and is reused both by
    the single-device jit above and by the sharded SPMD path
    (:mod:`xspect2_tpu.parallel`) inside ``shard_map``.  ``table2d`` is the
    class-word-major device layout (:meth:`BlockedBitSlicedIndex.device_table`).
    With ``local_blocks`` set the body takes an extra traced
    ``block_offset`` and returns this block shard's partial counts (see
    :func:`_gather_and_probe`).
    """
    lo_bases = min(k, 16)
    hi_bases = k - lo_bases

    def query_body(table2d, codes, rec_ids, valid, num_blocks, block_offset=None):
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

            anded = _gather_and_probe(
                table2d,
                hi,
                lo,
                num_blocks=num_blocks,
                num_hashes=num_hashes,
                rows_per_block=rows_per_block,
                class_words=class_words,
                fields_per_word=fields_per_word,
                local_blocks=local_blocks,
                block_offset=block_offset,
            )

            # invalid/padded positions contribute 0 to every class: zero
            # the whole AND word once instead of masking per class
            mask = valid_chunk & (~bad)
            anded = jnp.where(mask[:, None], anded, jnp.uint32(0))

            seg_t = _accumulate_segments(
                anded,
                rec_chunk,
                class_words=class_words,
                num_classes=num_classes,
                max_records=max_records,
            )
            return acc + seg_t, None

        acc0 = jnp.zeros((num_classes, max_records), jnp.int32)
        acc, _ = lax.scan(body, acc0, jnp.arange(num_chunks))
        return acc.T

    return query_body


def make_reads_query_body(
    *,
    read_len: int,
    k: int,
    num_hashes: int,
    rows_per_block: int,
    class_words: int,
    num_classes: int,
    step: int = 1,
    reads_per_chunk: int = 4096,
    fields_per_word: int = 1,
    local_blocks: int | None = None,
):
    """Traceable uniform-read query: uint8 codes [N, L] -> int32 [N, C].

    The high-throughput path (BASELINE.json config 4): no per-position
    record-id/validity tensors, no segment-sum — k-mer windows live
    within one read, so the per-read reduction is a plain axis sum.
    The chunk body fuses window packing, hashing, the per-k-mer table
    block gather (512 B rows gather at ~230-255 M rows/s for tables
    <~128 MB, ~82 M rows/s beyond — docs/performance.md), the one-pass
    AND-reduce row selection, and byte-packed per-class accumulation
    (4 class bits per pass in independent uint32 byte lanes).  At
    num_hashes=7, k=21, 150 bp reads this sustains ~1.2-1.3 M reads/s
    per chip device-side on a <=100 MB index (~0.55 M at 200 MB).
    Shared by the raw and 2-bit-packed wire entries below.
    """
    nk = read_len - k + 1
    lo_bases = min(k, 16)
    hi_bases = k - lo_bases
    # sparse sampling keeps windows 0, step, 2*step, ... — the SAME
    # positions the reference's COBS `step` parameter samples.  The
    # kept windows are strided OUT of the k-mer axis BEFORE the table
    # gather (round 5): the query is gather-bound, so masking skipped
    # windows after a dense gather made step a no-op on the device
    # rate (measured flat 568-570 k reads/s at step 1/2/4 on the
    # 40-class config); slicing first divides the gather stream by
    # `step` and the rate scales accordingly.
    nk_kept = len(range(0, nk, step))
    # per-read counts are bounded by ceil(nk/step): pick the widest safe
    # lane packing for the per-class accumulation (4 classes/pass in
    # byte lanes, 2 in 16-bit lanes, else one class per pass)
    max_count = -(-nk // step)
    if max_count <= 0xFF:
        lane_bits = 8
    elif max_count <= 0xFFFF:
        lane_bits = 16
    else:
        lane_bits = 32

    def body(table2d, reads, num_blocks, block_offset=None):
        n = reads.shape[0]
        num_chunks = n // reads_per_chunk

        def chunk_fn(_, i):
            r = lax.dynamic_slice(
                reads, (i * reads_per_chunk, 0), (reads_per_chunk, read_len)
            ).astype(jnp.uint32)

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
            # stride out the sampled windows BEFORE the gather (see
            # the factory docstring): [rpc, nk] -> [rpc, nk_kept]
            hi = jnp.where(fwd_le, f_hi, r_hi)[:, ::step].reshape(-1)
            lo = jnp.where(fwd_le, f_lo, r_lo)[:, ::step].reshape(-1)
            badw = badw[:, ::step]

            nkm = reads_per_chunk * nk_kept
            anded = _gather_and_probe(
                table2d,
                hi,
                lo,
                num_blocks=num_blocks,
                num_hashes=num_hashes,
                rows_per_block=rows_per_block,
                class_words=class_words,
                fields_per_word=fields_per_word,
                local_blocks=local_blocks,
                block_offset=block_offset,
            )

            # invalid (N-bearing) windows contribute 0 to every class:
            # zero the AND word once (skipped sparse-sampling phases
            # were already strided out above)
            anded = jnp.where(
                (~badw).reshape(nkm)[:, None], anded, jnp.uint32(0)
            )

            hits_t = _accumulate_reads(
                anded,
                reads_per_chunk=reads_per_chunk,
                nk=nk_kept,
                class_words=class_words,
                num_classes=num_classes,
                lane_bits=lane_bits,
            )  # [C, rpc], minor = rpc
            return None, hits_t

        _, hits_t = lax.scan(chunk_fn, None, jnp.arange(num_chunks))
        # [num_chunks, C, rpc] -> [n, C]
        return jnp.moveaxis(hits_t, 1, 2).reshape(n, num_classes)

    return body


_QUERY_STATICS = (
    "num_blocks",
    "read_len",
    "k",
    "num_hashes",
    "rows_per_block",
    "class_words",
    "num_classes",
    "step",
    "reads_per_chunk",
    "fields_per_word",
)


def _compact_count_dtype(geom):
    """Smallest dtype that holds a per-read count: the device->host
    fetch of [N, C] counts rides the slow link, and per-read counts are
    bounded by ceil(nk/step) (130 at the 150 bp / k=21 geometry), so
    uint8 carries the same information in 1/4 the wire bytes."""
    max_count = -(-(geom["read_len"] - geom["k"] + 1) // geom["step"])
    if max_count <= 0xFF:
        return jnp.uint8
    if max_count <= 0xFFFF:
        return jnp.uint16
    return jnp.int32


@partial(jax.jit, static_argnames=_QUERY_STATICS)
def query_reads_device(table2d, reads, *, num_blocks: int, **geom):
    """Raw-wire entry: uint8 code matrix [N, L] (>3 = invalid) -> [N, C]."""
    out = make_reads_query_body(**geom)(table2d, reads, num_blocks)
    return out.astype(_compact_count_dtype(geom))


@partial(jax.jit, static_argnames=_QUERY_STATICS)
def query_packed_reads_device(
    table2d, packed, bad_rows, bad_cols, *, num_blocks: int, **geom
):
    """Packed-wire entry: 2-bit codes [N, ceil(L/4)] -> [N, C].

    The host->device link is the end-to-end bottleneck (the device
    query itself runs at hundreds of M reads/s), so reads travel 2-bit
    packed (4x fewer wire bytes; packed by native/xs_pack_2bit at
    >1 GB/s).  ``(bad_rows, bad_cols)`` is a fixed-size patch list of
    (read, base) positions whose original byte was an invalid base; they
    are restored to 255 after unpacking.  2-D int32 indices keep the
    patch list overflow-free at any batch size (a flat read*L+base index
    would wrap past 2**31 positions); sentinel entries point one row
    past the end and are dropped by the scatter.  Unpacking happens once
    into a materialized [N, L] uint8 array — trivial HBM traffic — so
    the fused query loop below is identical to the raw-wire path.
    """
    n = packed.shape[0]
    l4 = packed.shape[1]
    read_len = geom["read_len"]
    shifts = jnp.asarray([0, 2, 4, 6], jnp.uint8)
    codes = (
        (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint8(3)
    ).reshape(n, l4 * 4)[:, :read_len]
    if bad_rows.shape[0]:
        codes = codes.at[bad_rows, bad_cols].set(jnp.uint8(255), mode="drop")
    # materialization fence: keeps the scan body byte-identical to the
    # raw-wire path (the [N, L] codes array is tiny HBM traffic)
    codes = lax.optimization_barrier(codes)
    out = make_reads_query_body(**geom)(table2d, codes, num_blocks)
    return out.astype(_compact_count_dtype(geom))


def pack_reads_wire(reads: np.ndarray, k: int, n_pad: int):
    """2-bit-pack a [N, L] code matrix for the packed device wire.

    Returns ``(packed [n_pad, ceil(L/4)], bad_rows, bad_cols)``: the
    native-packed payload padded to ``n_pad`` rows plus the fixed-size
    invalid-base patch list ((read, base) int32 pairs; sentinel entries
    point one row past the end and are dropped by the device scatter).
    Padding rows are poisoned at every k-th base so each k-wide window
    contains at least one invalid base and contributes 0 hits.
    """
    from xspect2_tpu import native

    n, read_len = reads.shape
    packed, bad_flags = native.pack_2bit(reads)
    if n_pad != n:
        pad = np.zeros((n_pad - n, packed.shape[1]), dtype=np.uint8)
        packed = np.concatenate([packed, pad])
    flagged = np.nonzero(bad_flags)[0]
    if len(flagged):
        sub = reads[flagged].astype(np.uint8) > 3
        rr, cc = np.nonzero(sub)
        bad_rows = flagged[rr].astype(np.int32)
        bad_cols = cc.astype(np.int32)
    else:
        bad_rows = np.zeros(0, dtype=np.int32)
        bad_cols = np.zeros(0, dtype=np.int32)
    if n_pad != n:
        pad_rows = np.arange(n, n_pad, dtype=np.int32)
        offs = np.arange(0, read_len, k, dtype=np.int32)
        bad_rows = np.concatenate([bad_rows, np.repeat(pad_rows, len(offs))])
        bad_cols = np.concatenate([bad_cols, np.tile(offs, len(pad_rows))])
    bad_rows, bad_cols = _pad_patch_list((bad_rows, bad_cols), (n_pad, 0))
    return packed, bad_rows, bad_cols


def _pad_patch_list(arrays, sentinels):
    """Pad parallel int32 patch arrays to a power-of-two length.

    Bounds the number of jit shape variants the patch list can create;
    ``sentinels`` fill the tail (pointing past the data so the device
    scatter drops them via ``mode="drop"``).  Empty lists stay empty.
    """
    m = len(arrays[0])
    cap = _next_pow2(max(8, m)) if m else 0
    if not cap:
        return tuple(arrays)
    out = []
    for arr, sentinel in zip(arrays, sentinels):
        padded = np.full(cap, sentinel, dtype=np.int32)
        padded[:m] = arr
        out.append(padded)
    return tuple(out)


def packed_wire_for_batch(batch, max_records: int):
    """Compact device wire for a prepared batch (cached on the batch).

    2-bit packed codes + invalid-base patch list + padded record
    offsets; independent of any particular index, so batches shared
    across several indices (the MLST per-locus case) transfer once.
    """
    dev = batch._device_wire.get(max_records)
    if dev is None:
        from xspect2_tpu import native

        with profiling.phase("query.pack"):
            packed, _bad = native.pack_2bit(batch.codes[None, :])
            packed = packed.reshape(-1)
            n_real = int(batch.offsets[-1])
            # only real in-record invalid bases need patching:
            # padded regions are never read by a valid window
            # (validity is derived from the offsets on device)
            bad_pos = np.nonzero(batch.codes[:n_real].astype(np.uint8) > 3)[
                0
            ].astype(np.int32)
            (bad_pos,) = _pad_patch_list((bad_pos,), (len(batch.codes),))
            offsets = np.full(max_records + 1, n_real, dtype=np.int32)
            offsets[: len(batch.offsets)] = batch.offsets
        dev = (
            jnp.asarray(packed),
            jnp.asarray(bad_pos),
            jnp.asarray(offsets),
        )
        batch._device_wire[max_records] = dev
    return dev


def make_multi_packed_query(
    geoms: tuple,
    step: int,
    reduce_mode: str | None = None,
    threshold: int = 0,
    num_segments: int | None = None,
):
    """ONE jitted program computing per-record hits for SEVERAL indices
    sharing one prepared batch.

    Each dispatch through the tunneled dev runtime costs ~25 ms of RPC
    latency, so querying an MLST genome against 7 per-locus indices as
    7 programs pays 7 round trips; this fuses them into one program
    (one dispatch, one fetch).  ``geoms`` is a tuple of per-index
    geometry item-tuples (the static kwargs of
    :func:`query_hits_packed_batch_device`).

    ``reduce_mode`` moves the host post-processing reduction onto the
    device so the fetch shrinks from [max_records, C] int32 per index
    to [C] — at the MLST scale (7 loci x 1000 alleles x 256 record
    slots) the full counts are 7.2 MB/genome, which through a ~33 MB/s
    tunnel was ~220 ms of pure output transfer (the measured 270
    ms/genome "device time" was all fetch):

    - ``"thresholded_totals"``: per-record counts below ``threshold``
      are zeroed, the rest summed over records (the >=10 kb MLST
      chunk-score rule, models/mlst_model.py).  Padded record slots
      count zero hits, so the sum over all slots equals the sum over
      real pieces.
    - ``"first_record"``: row 0 only (the short-input single-piece
      path, which reports raw unthresholded counts).
    - ``"thresholded_segment_totals"``: the multi-GENOME extension of
      ``"thresholded_totals"`` — the fn takes an extra ``seg_ids``
      operand ([max_records] int32, record slot -> genome) and returns
      [``num_segments``, C] per index: per-record counts below
      ``threshold`` zeroed, then segment-summed per genome.  One
      dispatch then types ``num_segments`` genomes (the per-genome
      cost was dominated by the ~25 ms dispatch floor); padded record
      slots count zero hits, so any segment they map to is unaffected.
      ``threshold=-1`` keeps raw counts (the short-input rule) while
      still reducing per genome.
    """

    if reduce_mode == "thresholded_segment_totals":
        if not num_segments or num_segments < 1:
            raise ValueError(
                "thresholded_segment_totals requires num_segments >= 1"
            )

        def fn_seg(tables, packed, bad_pos, offsets, seg_ids):
            outs = []
            for t, g in zip(tables, geoms):
                h = query_hits_packed_batch_device(
                    t, packed, bad_pos, offsets, step=step, **dict(g)
                )
                hz = jnp.where(h > threshold, h, 0).astype(jnp.int32)
                outs.append(
                    jax.ops.segment_sum(hz, seg_ids, num_segments=num_segments)
                )
            return tuple(outs)

        return jax.jit(fn_seg)

    def fn(tables, packed, bad_pos, offsets):
        outs = []
        for t, g in zip(tables, geoms):
            h = query_hits_packed_batch_device(
                t, packed, bad_pos, offsets, step=step, **dict(g)
            )
            if reduce_mode == "thresholded_totals":
                h = jnp.where(h > threshold, h, 0).sum(
                    axis=0, dtype=jnp.int32
                )
            elif reduce_mode == "first_record":
                h = h[0]
            outs.append(h)
        return tuple(outs)

    return jax.jit(fn)


class DeviceQueryEngine:
    """Holds a device-resident index table and runs batched queries."""

    def __init__(self, index: BlockedBitSlicedIndex, chunk: int = DEFAULT_CHUNK):
        self.index = index
        # wide-class indices (many class words) multiply the per-position
        # accumulation buffers by class_words; shrink the scan chunk so
        # intermediates stay bounded (power of two preserved)
        cw = index.class_words
        self.chunk = min(chunk, max(8192, _next_pow2((1 << 19) // cw + 1) // 2))
        self.table = jnp.asarray(index.device_table())

    def count_hits(
        self, batch: PreparedBatch, block: bool = True, wire: str = "auto"
    ):
        """Hit counts: int64 [batch.num_records, num_classes].

        With ``block=False`` the padded device array is returned without
        synchronizing (slice ``[:num_records]`` after ``np.asarray``);
        callers dispatching several queries (e.g. one per MLST locus)
        pay the device round-trip latency once instead of per call.
        ``wire="packed"`` ships 2-bit codes + record offsets and derives
        per-position metadata on device (~25x fewer wire bytes);
        ``wire="raw"`` ships codes/rec_ids/valid verbatim.  The default
        ``"auto"`` picks packed whenever the batch carries offsets
        (:func:`prepare_batch` does; :func:`prepare_fixed_batch` does
        not); requesting ``"packed"`` explicitly on an offset-less batch
        raises rather than silently shipping the fat wire.
        """
        idx = self.index
        if wire not in ("auto", "packed", "raw"):
            raise ValueError(
                f"unknown wire format {wire!r}: expected 'auto', 'packed' or 'raw'"
            )
        if wire == "packed" and batch.offsets is None:
            raise ValueError(
                "wire='packed' requires a batch with record offsets "
                "(prepare_batch); this batch has none"
            )
        if wire == "auto":
            wire = "packed" if batch.offsets is not None else "raw"
        if batch.num_records == 0:
            return np.zeros((0, idx.num_classes), dtype=np.int64)
        max_records = _next_pow2(max(8, batch.num_records))
        num_chunks = batch.num_positions // self.chunk
        geom = dict(
            num_blocks=int(idx.num_blocks),
            k=idx.k,
            num_hashes=idx.num_hashes,
            rows_per_block=idx.rows_per_block,
            class_words=idx.class_words,
            num_classes=idx.num_classes,
            chunk=self.chunk,
            num_chunks=num_chunks,
            max_records=max_records,
            fields_per_word=idx.fields_per_word,
        )
        if wire == "packed":
            dev = packed_wire_for_batch(batch, max_records)
            with profiling.phase("query.dispatch"):
                out = query_hits_packed_batch_device(
                    self.table,
                    *dev,
                    step=batch.step,
                    **geom,
                )
        else:
            with profiling.phase("query.dispatch"):
                out = query_hits_device(
                    self.table,
                    jnp.asarray(batch.codes),
                    jnp.asarray(batch.rec_ids),
                    jnp.asarray(batch.valid),
                    **geom,
                )
        if not block:
            return out
        with profiling.phase("query.sync"):
            return np.asarray(out)[: batch.num_records].astype(np.int64)

    def count_hits_records(self, records, step: int = 1, block: bool = True):
        """Convenience: records = list of (name, codes) -> [n_records, C] hits."""
        batch = prepare_batch(records, self.index.k, step=step, chunk=self.chunk)
        return self.count_hits(batch, block=block)

    def count_hits_reads(
        self,
        reads: np.ndarray,
        step: int = 1,
        reads_per_chunk: int = 4096,
        block: bool = True,
        wire: str = "packed",
    ):
        """Uniform-read fast path: [N, L] uint8 code matrix -> [N, C] hits.

        With ``block=False`` the (possibly padded-to-chunk) device array
        is returned without synchronizing, so callers can pipeline many
        batches and pay the dispatch latency once.  ``wire`` selects the
        host->device transfer format: "packed" (default; 2-bit via the
        native packer, 4x fewer wire bytes) or "raw" (one byte/base).
        """
        idx = self.index
        if wire not in ("packed", "raw"):
            raise ValueError(
                f"unknown wire format {wire!r}: expected 'packed' or 'raw'"
            )
        n = len(reads)
        read_len = reads.shape[1]
        n_pad = -(-n // reads_per_chunk) * reads_per_chunk
        geom = dict(
            read_len=read_len,
            k=idx.k,
            num_hashes=idx.num_hashes,
            rows_per_block=idx.rows_per_block,
            class_words=idx.class_words,
            num_classes=idx.num_classes,
            step=step,
            reads_per_chunk=reads_per_chunk,
            fields_per_word=idx.fields_per_word,
        )
        if wire == "packed":
            with profiling.phase("query.pack"):
                packed, bad_rows, bad_cols = pack_reads_wire(reads, idx.k, n_pad)
            out = query_packed_reads_device(
                self.table,
                jnp.asarray(packed),
                jnp.asarray(bad_rows),
                jnp.asarray(bad_cols),
                num_blocks=int(idx.num_blocks),
                **geom,
            )
        else:
            if n_pad != n:
                pad = np.full((n_pad - n, read_len), 255, dtype=np.uint8)
                reads = np.concatenate([reads, pad])
            out = query_reads_device(
                self.table,
                jnp.asarray(reads),
                num_blocks=int(idx.num_blocks),
                **geom,
            )
        if not block:
            return out
        return np.asarray(out)[:n].astype(np.int64)
