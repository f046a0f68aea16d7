"""Block-axis (hash-space) sharding tests on the 8-virtual-device mesh.

Parity oracle: the block-sharded program must produce exactly the same
hit counts, totals and predictions as the single-device engine, for
every (data, blk) mesh shape and — unlike the cls axis — for every
index geometry, including field-packed (<= 16 class) and single-class
tables that have no class-word axis to shard.
"""

import numpy as np
import pytest

from xspect2_tpu.core import dna
from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex
from xspect2_tpu.models.svm_head import JaxSVMHead, fit_svc
from xspect2_tpu.ops.query import DeviceQueryEngine
from xspect2_tpu.parallel import BlockShardedClassifier, make_block_mesh
from tests.conftest import random_dna


def _build_index(rng, num_classes, genome_len=1500, k=21, num_hashes=7):
    names = [f"c{i:02d}" for i in range(num_classes)]
    seqs = {n: random_dna(rng, genome_len) for n in names}
    idx = BlockedBitSlicedIndex.create(
        k, names, genome_len, fpr=0.01, num_hashes=num_hashes
    )
    for ci, n in enumerate(names):
        hi, lo, v = dna.canonical_kmers(dna.encode(seqs[n]), k)
        idx.insert_kmers(ci, hi, lo, v)
    return idx, seqs


@pytest.fixture(scope="module")
def wide_index():
    """40 classes: 2 class words, the reference-scale geometry."""
    return _build_index(np.random.default_rng(99), 40)


@pytest.fixture(scope="module")
def packed_index():
    """8 classes: field-packed (4 rows/word) — cls-sharding impossible."""
    return _build_index(np.random.default_rng(5), 8)


def _read_matrix(seqs, rng, n=96, length=150):
    names = sorted(seqs)
    reads = np.zeros((n, length), dtype=np.uint8)
    for i in range(n):
        src = seqs[names[int(rng.integers(0, len(names)))]]
        start = int(rng.integers(0, len(src) - length))
        reads[i] = dna.encode(src[start : start + length])
    reads[2, 17] = 255  # N base
    return reads


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2), (8, 1), (1, 3)])
def test_block_sharded_reads_match_single_device(wide_index, rng, mesh_shape):
    idx, seqs = wide_index
    reads = _read_matrix(seqs, rng)
    single = DeviceQueryEngine(idx, chunk=512).count_hits_reads(
        reads, reads_per_chunk=64
    )
    mesh = make_block_mesh(*mesh_shape)
    clf = BlockShardedClassifier(idx, mesh, chunk=512)
    for step in (1, 3):
        want = (
            single
            if step == 1
            else DeviceQueryEngine(idx, chunk=512).count_hits_reads(
                reads, step=step, reads_per_chunk=64
            )
        )
        got = clf.count_hits_reads(reads, step=step, reads_per_chunk=64)
        np.testing.assert_array_equal(got, want, err_msg=f"{mesh_shape} step={step}")


@pytest.mark.parametrize("num_classes", [1, 8])
def test_block_sharded_splits_field_packed_indices(rng, num_classes):
    """Field-packed geometries (no class-word axis) block-shard fine."""
    idx, seqs = _build_index(np.random.default_rng(5), num_classes)
    assert idx.fields_per_word > 1  # the geometry cls-sharding rejects
    reads = _read_matrix(seqs, rng, n=48)
    single = DeviceQueryEngine(idx, chunk=512).count_hits_reads(
        reads, reads_per_chunk=16
    )
    clf = BlockShardedClassifier(idx, make_block_mesh(2, 4), chunk=512)
    got = clf.count_hits_reads(reads, reads_per_chunk=16)
    np.testing.assert_array_equal(got, single)


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (8, 1)])
def test_block_sharded_records_match_single_device(wide_index, mesh_shape):
    idx, seqs = wide_index
    rng = np.random.default_rng(7)
    names = sorted(seqs)
    records = []
    for i in range(48):
        src = seqs[names[int(rng.integers(0, len(names)))]]
        start = int(rng.integers(0, len(src) - 150))
        records.append((f"r{i}", dna.encode(src[start : start + 150])))

    expected = DeviceQueryEngine(idx, chunk=512).count_hits_records(records)
    clf = BlockShardedClassifier(idx, make_block_mesh(*mesh_shape), chunk=512)
    per_record, totals, _ = clf.classify(records)

    for i, (name, _) in enumerate(records):
        for c, cname in enumerate(idx.class_names):
            assert per_record[name][cname] == expected[i, c], (name, cname)

    total_kmers = sum(len(codes) - idx.k + 1 for _, codes in records)
    for c, cname in enumerate(idx.class_names):
        want = round(float(expected[:, c].sum()) / total_kmers, 2)
        assert abs(totals[cname] - want) < 1e-6, cname


def test_block_sharded_svm_prediction(wide_index):
    idx, seqs = wide_index
    rng = np.random.default_rng(13)
    records = [
        (f"r{i}", dna.encode(seqs[sorted(seqs)[i % 40]][j : j + 150]))
        for i, j in enumerate(rng.integers(0, 1000, size=24))
    ]
    x = rng.normal(size=(80, 40))
    y = [idx.class_names[int(rng.integers(0, 40))] for _ in range(80)]
    head = JaxSVMHead.from_sklearn(fit_svc(x, y, "rbf", 1.0))

    clf = BlockShardedClassifier(
        idx, make_block_mesh(2, 4), svm_head=head, chunk=512
    )
    _, totals, prediction = clf.classify(records)
    xvec = np.asarray([[totals[c] for c in sorted(idx.class_names)]])
    assert prediction == head.predict(xvec)[0]


def test_host_sharded_input_matches_global(wide_index, rng):
    idx, seqs = wide_index
    reads = _read_matrix(seqs, rng, n=70)
    clf = BlockShardedClassifier(idx, make_block_mesh(4, 2), chunk=512)
    want = clf.count_hits_reads(reads, reads_per_chunk=8)
    got = clf.count_hits_reads_local(reads, reads_per_chunk=8)
    np.testing.assert_array_equal(got, want)


def test_rejects_mesh_without_blk_axis(wide_index):
    from xspect2_tpu.parallel import make_mesh

    idx, _ = wide_index
    with pytest.raises(ValueError, match="blk"):
        BlockShardedClassifier(idx, make_mesh(4, 2))
