"""Uniform-read fast path must match the general ragged path exactly."""

import numpy as np

from xspect2_tpu.core import dna
from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex
from xspect2_tpu.ops.query import DeviceQueryEngine
from tests.conftest import random_dna


def _index(rng, k=21, num_classes=40, seq_len=1200):
    names = [f"c{i}" for i in range(num_classes)]
    seqs = {n: random_dna(rng, seq_len) for n in names}
    idx = BlockedBitSlicedIndex.create(k, names, seq_len, fpr=0.01, num_hashes=7)
    for ci, n in enumerate(names):
        hi, lo, v = dna.canonical_kmers(dna.encode(seqs[n]), k)
        idx.insert_kmers(ci, hi, lo, v)
    return idx, seqs


def test_reads_fast_path_matches_general(rng):
    idx, seqs = _index(rng)
    engine = DeviceQueryEngine(idx, chunk=512)

    names = sorted(seqs)
    reads = np.zeros((100, 150), dtype=np.uint8)
    for i in range(100):
        src = seqs[names[int(rng.integers(0, len(names)))]]
        start = int(rng.integers(0, len(src) - 150))
        reads[i] = dna.encode(src[start : start + 150])
    # throw in some invalid bases
    reads[3, 10] = 255
    reads[7, 0] = 255

    for step in (1, 3):
        fast = engine.count_hits_reads(reads, step=step, reads_per_chunk=64)
        general = engine.count_hits_records(
            [(f"r{i}", reads[i]) for i in range(100)], step=step
        )
        np.testing.assert_array_equal(fast, general, err_msg=f"step={step}")
        raw = engine.count_hits_reads(
            reads, step=step, reads_per_chunk=64, wire="raw"
        )
        np.testing.assert_array_equal(raw, general, err_msg=f"raw step={step}")


def test_reads_fast_path_nonblocking(rng):
    idx, seqs = _index(rng, num_classes=3)
    engine = DeviceQueryEngine(idx, chunk=512)
    reads = np.stack(
        [dna.encode(seqs["c0"][i : i + 150]) for i in range(0, 640, 10)]
    )
    dev = engine.count_hits_reads(reads, reads_per_chunk=64, block=False)
    host = np.asarray(dev)[: len(reads)]
    blocking = engine.count_hits_reads(reads, reads_per_chunk=64)
    np.testing.assert_array_equal(host, blocking)
    # every read fully hits its source class
    assert (blocking[:, 0] == 130).all()
