"""Pipeline tests: benchmark metrics, read benchmark, SVM grid search."""

import numpy as np
import pytest

from xspect2_tpu.core import dna
from xspect2_tpu.pipelines import (
    evaluate_assembly_classifications,
    evaluate_read_classifications,
    grid_search_svm,
    run_assembly_benchmark,
    run_read_benchmark,
)
from xspect2_tpu.io.fasta import SeqRecord, write_fasta
from tests.conftest import random_dna


def test_f1_stats_perfect_and_mixed():
    rows = [("a", "x", "x"), ("b", "y", "y"), ("c", "x", "x")]
    s = evaluate_assembly_classifications(rows)
    assert s["accuracy"] == 1.0 and s["macro_f1"] == 1.0 and s["matches"] == 3

    rows = [("a", "x", "x"), ("b", "y", "x"), ("c", "x", "x"), ("d", "y", "y")]
    s = evaluate_assembly_classifications(rows)
    assert s["accuracy"] == 0.75
    # x: tp=2 fp=1 fn=0 -> f1=0.8; y: tp=1 fp=0 fn=1 -> f1=2/3
    assert abs(s["macro_f1"] - (0.8 + 2 / 3) / 2) < 1e-9
    assert abs(s["weighted_f1"] - (0.8 * 2 + (2 / 3) * 2) / 4) < 1e-9


def test_read_stats_rejection_metrics():
    rows = [
        ("r0", "x", "x"),
        ("r1", "x", "ambiguous"),  # rejected, truly misclassified
        ("r2", "y", "x"),  # wrong, not rejected
        ("r3", "y", "y"),
    ]
    s = evaluate_read_classifications(rows)
    assert s["coverage"] == 0.75
    assert abs(s["selective_accuracy"] - 2 / 3) < 1e-9
    assert s["rejection_precision"] == 1.0
    assert abs(s["rejection_recall"] - 0.5) < 1e-9


def test_assembly_benchmark_on_trained_model(session_data_root, tmp_path):
    root, genomes = session_data_root
    from xspect2_tpu.models.svm_model import ProbabilisticFilterSVMModel

    model = ProbabilisticFilterSVMModel.load(
        root / "models" / "synthetic-species.json"
    )
    samples = []
    for label, seq in genomes.items():
        p = tmp_path / f"{label}_sample.fasta"
        write_fasta([SeqRecord(seq, id=label)], p)
        samples.append((p, label))

    result = run_assembly_benchmark(model, samples, out_dir=tmp_path / "bench")
    assert result.stats["accuracy"] == 1.0
    assert (tmp_path / "bench" / "classifications.tsv").exists()
    assert (tmp_path / "bench" / "stats.json").exists()


def test_read_benchmark_on_trained_model(session_data_root):
    root, genomes = session_data_root
    from xspect2_tpu.models.svm_model import ProbabilisticFilterSVMModel

    model = ProbabilisticFilterSVMModel.load(
        root / "models" / "synthetic-species.json"
    )
    rng = np.random.default_rng(5)
    labels = sorted(genomes)
    reads = np.zeros((64, 150), dtype=np.uint8)
    true = []
    for i in range(64):
        label = labels[i % 2]
        g = genomes[label]
        start = int(rng.integers(0, len(g) - 150))
        reads[i] = dna.encode(g[start : start + 150])
        true.append(label)

    result = run_read_benchmark(model, reads, true, batch_reads=32)
    assert result.stats["total"] == 64
    assert result.stats["accuracy"] > 0.9
    assert 0.0 <= result.stats["coverage"] <= 1.0


def test_mutate_read_codes_error_model():
    from xspect2_tpu.misclassification_detection.simulate_reads import (
        mutate_read_codes,
    )

    rng = np.random.default_rng(3)
    reads = rng.integers(0, 4, size=(2000, 150), dtype=np.uint8)
    reads[0, 10] = 255  # N placeholder must survive untouched

    out = mutate_read_codes(reads, sub_rate=0.01, indel_rate=0.0, seed=7)
    assert out.shape == reads.shape and out is not reads
    assert out[0, 10] == 255
    changed = int((out != reads).sum())
    # binomial(300k, 0.01): ~3000 +- 6 sigma
    assert 2600 < changed < 3400
    # errored bases are always a DIFFERENT valid base
    assert (out[(out != reads) & (reads < 4)] < 4).all()
    # seeded determinism
    again = mutate_read_codes(reads, sub_rate=0.01, indel_rate=0.0, seed=7)
    assert (out == again).all()
    # untouched at zero rates
    clean = mutate_read_codes(reads, sub_rate=0.0, indel_rate=0.0, seed=7)
    assert (clean == reads).all()

    # indels shift the tail but keep length and the ACGT alphabet
    shifted = mutate_read_codes(reads[:50], sub_rate=0.0, indel_rate=0.05, seed=9)
    assert shifted.shape == (50, 150)
    assert (shifted != reads[:50]).any()
    assert (shifted[shifted != 255] < 4).all()


def test_noisy_read_metrics_pipeline_end_to_end():
    """Error-model reads -> device engine -> tie-abstained metrics.

    The read-accuracy bench (tools/bench_read_accuracy.py) at test
    scale: a 3-class ancestor-derived panel whose classes 0/1 are
    near-identical (0.2% divergence — the confusable pair), NovaSeq-
    like noise, and the reference benchmark's tie-rejection rule
    (reference: scripts/benchmark/main.nf:416-430, docs/benchmark.md:69).
    """
    from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex
    from xspect2_tpu.misclassification_detection.simulate_reads import (
        mutate_read_codes,
    )
    from xspect2_tpu.ops.query import DeviceQueryEngine
    from xspect2_tpu.pipelines.benchmark import (
        evaluate_read_classifications,
        evaluate_read_labels,
    )

    rng = np.random.default_rng(21)
    k, glen = 21, 60_000
    ancestor = rng.integers(0, 4, size=glen, dtype=np.uint8)
    genomes = np.empty((3, glen), dtype=np.uint8)
    for ci, d in enumerate((0.002, 0.002, 0.05)):
        g = ancestor.copy()
        mut = rng.random(glen) < d
        g[mut] = (g[mut] + rng.integers(1, 4, size=int(mut.sum()))) % 4
        genomes[ci] = g
    names = ["sp_a", "sp_b", "sp_c"]
    idx = BlockedBitSlicedIndex.create(k, names, glen - k + 1, fpr=0.01)
    for ci in range(3):
        hi, lo, v = dna.canonical_kmers(genomes[ci], k)
        idx.insert_kmers(ci, hi, lo, v)
    engine = DeviceQueryEngine(idx)

    n = 600
    cls = rng.integers(0, 3, size=n)
    pos = rng.integers(0, glen - 150, size=n)
    reads = genomes[cls[:, None], pos[:, None] + np.arange(150)[None, :]]
    noisy = mutate_read_codes(
        reads.astype(np.uint8), sub_rate=0.001, indel_rate=1e-4, seed=5
    )

    hits = np.asarray(engine.count_hits_reads(noisy, reads_per_chunk=256))[:n]
    tie = (hits == hits.max(axis=1)[:, None]).sum(axis=1) > 1
    y_pred = np.where(tie, "ambiguous", np.asarray(names)[hits.argmax(axis=1)])
    y_true = np.asarray(names)[cls]

    s = evaluate_read_labels(y_true, y_pred)
    # the near-identical pair forces abstentions; divergent reads classify
    assert 0.2 < s["coverage"] < 1.0
    assert s["selective_accuracy"] >= s["accuracy"]
    assert s["selective_accuracy"] > 0.9
    # abstained reads would mostly have been wrong -> recall is real
    assert s["rejection_recall"] > 0.5
    assert set(s) >= {
        "accuracy",
        "macro_f1",
        "weighted_f1",
        "coverage",
        "selective_accuracy",
        "rejection_precision",
        "rejection_recall",
    }
    # array form == row-tuple form
    rows = [(f"r{i}", y_true[i], y_pred[i]) for i in range(n)]
    assert evaluate_read_classifications(rows) == s


def test_grid_search_svm(rng):
    x = np.concatenate([rng.normal(0, 1, (15, 3)), rng.normal(4, 1, (15, 3))])
    y = ["a"] * 15 + ["b"] * 15
    results = grid_search_svm(x, y, kernels=("linear", "rbf"), cs=(1.0,))
    assert results[0]["loo_accuracy"] > 0.9
    assert {r["kernel"] for r in results} == {"linear", "rbf"}


def test_mutate_sequence_string_wrapper():
    from xspect2_tpu.misclassification_detection.simulate_reads import (
        mutate_sequence,
    )

    seq = "ACGT" * 50
    out = mutate_sequence(seq, sub_rate=0.05, indel_rate=0.0, seed=1)
    assert len(out) == len(seq) and out != seq
    assert set(out) <= set("ACGT")
    # deterministic and identity at zero rates
    assert out == mutate_sequence(seq, sub_rate=0.05, indel_rate=0.0, seed=1)
    assert mutate_sequence(seq, sub_rate=0.0, indel_rate=0.0, seed=1) == seq
