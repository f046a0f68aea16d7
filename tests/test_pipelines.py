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


def test_grid_search_svm(rng):
    x = np.concatenate([rng.normal(0, 1, (15, 3)), rng.normal(4, 1, (15, 3))])
    y = ["a"] * 15 + ["b"] * 15
    results = grid_search_svm(x, y, kernels=("linear", "rbf"), cs=(1.0,))
    assert results[0]["loo_accuracy"] > 0.9
    assert {r["kernel"] for r in results} == {"linear", "rbf"}
