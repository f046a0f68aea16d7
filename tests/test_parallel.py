"""Sharded SPMD classification tests on the 8-virtual-device CPU mesh.

Parity oracle: the sharded program must produce exactly the same hit
counts and totals as the single-device engine, for every mesh shape.
"""

import numpy as np
import pytest

import jax

from xspect2_tpu.core import dna
from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex
from xspect2_tpu.models.svm_head import JaxSVMHead, fit_svc
from xspect2_tpu.ops.query import DeviceQueryEngine
from xspect2_tpu.parallel import ShardedClassifier, make_mesh
from tests.conftest import random_dna


@pytest.fixture(scope="module")
def big_index():
    rng = np.random.default_rng(99)
    k = 21
    num_classes = 40  # spans 2 class words
    names = [f"c{i:02d}" for i in range(num_classes)]
    seqs = {n: random_dna(rng, 1500) for n in names}
    idx = BlockedBitSlicedIndex.create(k, names, 1500, fpr=0.01, num_hashes=7)
    for ci, n in enumerate(names):
        hi, lo, v = dna.canonical_kmers(dna.encode(seqs[n]), k)
        idx.insert_kmers(ci, hi, lo, v)
    return idx, seqs


def _reads(seqs, rng, n=64):
    recs = []
    names = sorted(seqs)
    for i in range(n):
        src = seqs[names[int(rng.integers(0, len(names)))]]
        start = int(rng.integers(0, len(src) - 150))
        recs.append((f"r{i}", dna.encode(src[start : start + 150])))
    return recs


def test_device_count():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("mesh_shape", [(1, 1), (8, 1), (1, 2), (4, 2), (2, 2)])
def test_sharded_matches_single_device(big_index, mesh_shape):
    idx, seqs = big_index
    rng = np.random.default_rng(7)
    records = _reads(seqs, rng)

    engine = DeviceQueryEngine(idx, chunk=512)
    expected = engine.count_hits_records(records)

    n_data, n_cls = mesh_shape
    mesh = make_mesh(n_data=n_data, n_cls=n_cls)
    clf = ShardedClassifier(idx, mesh, chunk=512)
    per_record, totals, _ = clf.classify(records)

    assert set(per_record) == {name for name, _ in records}
    for i, (name, _) in enumerate(records):
        got = per_record[name]
        for c, cname in enumerate(idx.class_names):
            assert got[cname] == expected[i, c], (name, cname, mesh_shape)


def test_sharded_totals_and_svm(big_index):
    idx, seqs = big_index
    rng = np.random.default_rng(13)
    records = _reads(seqs, rng, n=32)

    # an SVM head over the 40-class score space
    x = rng.normal(size=(80, 40))
    y = [idx.class_names[int(rng.integers(0, 40))] for _ in range(80)]
    head = JaxSVMHead.from_sklearn(fit_svc(x, y, "rbf", 1.0))

    mesh = make_mesh(n_data=4, n_cls=2)
    clf = ShardedClassifier(idx, mesh, svm_head=head, chunk=512)
    per_record, totals, prediction = clf.classify(records)

    # totals equal the round(sum hits / sum kmers, 2) over all records
    engine = DeviceQueryEngine(idx, chunk=512)
    hits = engine.count_hits_records(records)
    total_kmers = sum(len(codes) - idx.k + 1 for _, codes in records)
    for c, cname in enumerate(idx.class_names):
        expected = round(float(hits[:, c].sum()) / total_kmers, 2)
        assert abs(totals[cname] - expected) < 1e-6, cname

    # prediction matches applying the head to the same totals on host
    xvec = np.asarray([[totals[c] for c in sorted(idx.class_names)]])
    # class_names are already sorted -> same order
    expected_pred = head.predict(xvec)[0]
    assert prediction == expected_pred


@pytest.mark.parametrize("mesh_shape", [(1, 1), (4, 2), (2, 4), (8, 1)])
def test_sharded_reads_fast_path_matches_single_device(big_index, rng, mesh_shape):
    idx, seqs = big_index
    names = sorted(seqs)
    reads = np.zeros((100, 150), dtype=np.uint8)
    for i in range(100):
        src = seqs[names[int(rng.integers(0, len(names)))]]
        start = int(rng.integers(0, len(src) - 150))
        reads[i] = dna.encode(src[start : start + 150])
    reads[5, 33] = 255  # N base

    single = DeviceQueryEngine(idx, chunk=512).count_hits_reads(
        reads, reads_per_chunk=64
    )
    mesh = make_mesh(*mesh_shape)
    sc = ShardedClassifier(idx, mesh, chunk=512)
    for step in (1, 3):
        want = (
            single
            if step == 1
            else DeviceQueryEngine(idx, chunk=512).count_hits_reads(
                reads, step=step, reads_per_chunk=64
            )
        )
        got = sc.count_hits_reads(reads, step=step, reads_per_chunk=64)
        np.testing.assert_array_equal(got, want, err_msg=f"{mesh_shape} step={step}")


@pytest.mark.parametrize("mesh_shape", [(4, 2), (8, 1)])
def test_host_sharded_input_matches_global(big_index, rng, mesh_shape):
    """count_hits_reads_local == count_hits_reads (single-process case).

    The host-sharded input path places each process's reads directly on
    its own devices instead of routing through a global host array; on
    one process it must be bit-identical to the global-input path.
    """
    idx, seqs = big_index
    names = sorted(seqs)
    reads = np.zeros((70, 150), dtype=np.uint8)
    for i in range(70):
        src = seqs[names[int(rng.integers(0, len(names)))]]
        start = int(rng.integers(0, len(src) - 150))
        reads[i] = dna.encode(src[start : start + 150])
    reads[3, 10] = 255  # N base

    mesh = make_mesh(*mesh_shape)
    sc = ShardedClassifier(idx, mesh, chunk=512)
    want = sc.count_hits_reads(reads, reads_per_chunk=8)
    got = sc.count_hits_reads_local(reads, reads_per_chunk=8)
    np.testing.assert_array_equal(got, want, err_msg=f"{mesh_shape}")
