"""Differential tests: device (JAX) query path == host (numpy) reference path."""

import numpy as np

from xspect2_tpu.core import dna
from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex
from xspect2_tpu.ops.query import DeviceQueryEngine, prepare_batch
from tests.conftest import random_dna


def _build_index(rng, k=21, num_classes=3, seq_len=2000, num_hashes=7, fpr=0.01):
    names = [f"c{i}" for i in range(num_classes)]
    seqs = {n: random_dna(rng, seq_len) for n in names}
    idx = BlockedBitSlicedIndex.create(k, names, seq_len, fpr=fpr, num_hashes=num_hashes)
    for ci, n in enumerate(names):
        hi, lo, v = dna.canonical_kmers(dna.encode(seqs[n]), k)
        idx.insert_kmers(ci, hi, lo, v)
    return idx, seqs


def _host_counts(idx, records, step=1):
    out = []
    for _, codes in records:
        hi, lo, valid = dna.canonical_kmers(codes, idx.k, step=step)
        out.append(idx.count_hits_host(hi, lo, valid))
    return np.stack(out)


def test_device_matches_host_basic(rng):
    idx, seqs = _build_index(rng)
    engine = DeviceQueryEngine(idx, chunk=512)
    records = [(n, dna.encode(s)) for n, s in seqs.items()]
    dev = engine.count_hits_records(records)
    host = _host_counts(idx, records)
    np.testing.assert_array_equal(dev, host)
    # training sequences fully hit their own class
    for i in range(len(records)):
        assert dev[i, i] == len(seqs[f"c{i}"]) - idx.k + 1


def test_device_matches_host_with_step_and_invalid(rng):
    idx, seqs = _build_index(rng, k=21)
    engine = DeviceQueryEngine(idx, chunk=256)
    # sequence with Ns and mixed case
    probe = (
        seqs["c0"][:300]
        + "NNNN"
        + seqs["c1"][100:400].lower()
        + "N"
        + random_dna(rng, 250)
    )
    records = [("probe", dna.encode(probe))]
    for step in (1, 3, 500):
        dev = engine.count_hits_records(records, step=step)
        host = _host_counts(idx, records, step=step)
        np.testing.assert_array_equal(dev, host, err_msg=f"step={step}")


def test_device_matches_host_many_records(rng):
    idx, seqs = _build_index(rng, k=31, num_classes=40, seq_len=900, num_hashes=4)
    engine = DeviceQueryEngine(idx, chunk=1024)
    # many short reads from random classes
    records = []
    for i in range(200):
        src = seqs[f"c{int(rng.integers(0, 40))}"]
        start = int(rng.integers(0, len(src) - 150))
        records.append((f"read{i}", dna.encode(src[start : start + 150])))
    dev = engine.count_hits_records(records)
    host = _host_counts(idx, records)
    np.testing.assert_array_equal(dev, host)


def test_prepare_batch_kmer_counts(rng):
    recs = [("a", dna.encode(random_dna(rng, 100))), ("b", dna.encode(random_dna(rng, 57)))]
    b = prepare_batch(recs, k=21, step=5, chunk=128)
    assert b.num_kmers == [int(np.ceil(80 / 5)), int(np.ceil(37 / 5))]
    assert b.num_positions % 128 == 0
    assert len(b.codes) == b.num_positions + 20


def test_prepare_batch_rejects_short():
    import pytest

    with pytest.raises(ValueError, match="longer than k"):
        prepare_batch([("x", dna.encode("ACGT"))], k=21)


def test_device_matches_host_field_packed(rng):
    """Field-packed indices (C <= 16, P = 32/field_bits rows per word):
    device slot-reduce + rotate body == host reference, all paths."""
    for num_classes, num_hashes in [(1, 7), (2, 5), (3, 7), (8, 3), (16, 2)]:
        idx, seqs = _build_index(
            rng, num_classes=num_classes, seq_len=1200, num_hashes=num_hashes
        )
        assert idx.fields_per_word > 1
        engine = DeviceQueryEngine(idx, chunk=512)
        records = []
        for i in range(16):
            src = seqs[f"c{int(rng.integers(0, num_classes))}"]
            start = int(rng.integers(0, len(src) - 150))
            records.append((f"read{i}", dna.encode(src[start : start + 150])))
        host = _host_counts(idx, records)
        dev = engine.count_hits_records(records)
        np.testing.assert_array_equal(dev, host)
        # uniform-reads fast path (both wires)
        mat = np.stack([codes for _n, codes in records])
        for wire in ("packed", "raw"):
            devr = engine.count_hits_reads(mat, reads_per_chunk=8, wire=wire)
            np.testing.assert_array_equal(devr, host, err_msg=wire)


def test_device_matches_host_512_classes(rng):
    """The vectorized accumulation keeps program size O(1) in the class
    count: a 512-class index (MLST-allele scale) traces and matches the
    host reference (VERDICT round 1 item 2)."""
    import time

    k = 21
    num_classes = 512
    names = [f"allele{i:04d}" for i in range(num_classes)]
    codes = {
        n: rng.integers(0, 4, size=420).astype(np.uint8) for n in names
    }
    from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex

    idx = BlockedBitSlicedIndex.create(k, names, 420, fpr=0.001, num_hashes=1)
    for ci, n in enumerate(names):
        hi, lo, v = dna.canonical_kmers(codes[n], k)
        idx.insert_kmers(ci, hi, lo, v)
    assert idx.class_words == 16

    engine = DeviceQueryEngine(idx, chunk=8192)
    picks = [names[int(rng.integers(0, num_classes))] for _ in range(6)]
    records = [(f"q{i}", codes[n]) for i, n in enumerate(picks)]
    t0 = time.time()
    dev = engine.count_hits_records(records)
    trace_s = time.time() - t0
    host = _host_counts(idx, records)
    np.testing.assert_array_equal(dev, host)
    # own-allele kmers all hit
    for i, n in enumerate(picks):
        assert dev[i, names.index(n)] == 420 - k + 1
    # tracing + compile must not blow up with class count (was O(C) ops)
    assert trace_s < 120, f"compile took {trace_s:.0f}s"


def test_wire_validation(rng):
    import pytest

    idx, seqs = _build_index(rng, num_classes=3, seq_len=600)
    engine = DeviceQueryEngine(idx, chunk=512)
    mat = np.stack([dna.encode(seqs["c0"][:150])] * 4)
    with pytest.raises(ValueError, match="wire"):
        engine.count_hits_reads(mat, wire="pack")


def test_packed_batch_wire_matches_raw(rng):
    """The compact batch wire (2-bit codes + offsets, device-derived
    rec_ids/validity/step mask) matches the raw wire exactly, including
    invalid bases and sparse sampling."""
    idx, seqs = _build_index(rng, num_classes=5, seq_len=1500)
    engine = DeviceQueryEngine(idx, chunk=512)
    records = []
    for i in range(9):
        src = seqs[f"c{int(rng.integers(0, 5))}"]
        start = int(rng.integers(0, len(src) - 200))
        codes = dna.encode(src[start : start + 120 + 40 * (i % 3)])
        if i % 2:
            codes = codes.copy()
            codes[int(rng.integers(0, len(codes)))] = 255  # an N base
        records.append((f"r{i}", codes))
    for step in (1, 3):
        batch = prepare_batch(records, idx.k, step=step, chunk=512)
        raw = engine.count_hits(batch, wire="raw")
        packed = engine.count_hits(batch, wire="packed")
        np.testing.assert_array_equal(packed, raw, err_msg=f"step={step}")
        host = _host_counts(idx, records, step=step)
        np.testing.assert_array_equal(packed, host, err_msg=f"step={step}")
