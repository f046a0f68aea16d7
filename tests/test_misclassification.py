"""Misclassification-detection tests: Ripley's K, seed-and-vote mapper, orchestrator."""

import numpy as np
import pytest

from xspect2_tpu.io.fasta import SeqRecord, write_fasta
from xspect2_tpu.misclassification_detection import detect_misclassification
from xspect2_tpu.misclassification_detection.mapping import MappingHandler
from xspect2_tpu.misclassification_detection.point_pattern_analysis import (
    PointPatternAnalysis,
)
from xspect2_tpu.misclassification_detection.simulate_reads import extract_random_reads
from tests.conftest import random_dna


def test_ripleys_k_uniform_not_clustered():
    rng = np.random.default_rng(3)
    length = 1_000_000
    points = sorted(rng.integers(0, length, size=500).tolist())
    clustered, k, expected = PointPatternAnalysis(points, length).ripleys_k()
    assert not clustered
    clustered, k, expected = PointPatternAnalysis(
        points, length
    ).ripleys_k_edge_corrected()
    assert not clustered


def test_ripleys_k_clustered():
    rng = np.random.default_rng(4)
    length = 1_000_000
    # all points within a 1% window -> strongly clustered
    points = sorted((500_000 + rng.integers(0, 5_000, size=200)).tolist())
    analysis = PointPatternAnalysis(points, length)
    clustered, k, expected = analysis.ripleys_k()
    assert clustered and k > expected
    clustered, k, expected = analysis.ripleys_k_edge_corrected()
    assert clustered


def test_ripleys_needs_two_points():
    with pytest.raises(ValueError):
        PointPatternAnalysis([5], 100)


def test_mapper_recovers_start_coordinates(tmp_path, rng):
    genome = random_dna(rng, 50_000)
    ref_path = tmp_path / "ref.fna"
    write_fasta([SeqRecord(genome, id="chr1")], ref_path)

    true_starts = sorted(int(s) for s in rng.integers(0, 49_850, size=50))
    reads = []
    for i, s in enumerate(true_starts):
        seq = genome[s : s + 150]
        if i % 2:  # half the reads on the reverse strand
            seq = SeqRecord(seq, id="x").reverse_complement().seq
        reads.append(SeqRecord(seq, id=f"r{i}"))
    reads_path = tmp_path / "reads.fasta"
    write_fasta(reads, reads_path)

    handler = MappingHandler(str(ref_path), str(reads_path))
    handler.map_reads_onto_reference()
    handler.extract_starting_coordinates()
    assert handler.get_total_genome_length() == 50_000
    coords = handler.get_start_coordinates()
    # unique starts, all recovered exactly
    assert sorted(coords) == sorted(set(true_starts))


def test_simulate_reads(tmp_path, rng):
    genome = random_dna(rng, 10_000)
    path = tmp_path / "g.fasta"
    write_fasta([SeqRecord(genome, id="g")], path)
    reads = extract_random_reads(path, read_length=150, num_reads=20, seed=1)
    assert len(reads) == 20
    assert all(len(r.seq) == 150 for r in reads)
    assert all(r.seq in genome for r in reads)
    # seeded determinism
    reads2 = extract_random_reads(path, read_length=150, num_reads=20, seed=1)
    assert [r.seq for r in reads] == [r.seq for r in reads2]


def test_detect_misclassification_clustered_group(tmp_path, rng, data_root):
    """A clustered suspect group is moved to hits['misclassified'];
    the largest group is never touched; reference genomes come from the
    local cache (no network)."""
    genome_good = random_dna(rng, 60_000)
    genome_sus = random_dna(rng, 60_000)

    # pre-seed the reference-genome cache for taxon 471 (suspect group)
    tax_dir = data_root / "misclassification" / "471"
    tax_dir.mkdir(parents=True)
    write_fasta([SeqRecord(genome_sus, id="chr")], tax_dir / "471.fna")

    records = []
    hits = {}
    # 30 reads of the majority class 470, spread out
    for i in range(30):
        s = i * 1800
        rec = SeqRecord(genome_good[s : s + 150], id=f"good{i}")
        records.append(rec)
        hits[rec.id] = {"470": 120, "471": 3}
    # 15 suspect reads of class 471 clustered in one 400bp hotspot
    for i in range(15):
        s = 30_000 + i * 20
        rec = SeqRecord(genome_sus[s : s + 150], id=f"sus{i}")
        records.append(rec)
        hits[rec.id] = {"470": 2, "471": 110}

    out = detect_misclassification(hits, records, min_reads=10)
    assert "misclassified" in out
    assert set(out["misclassified"]) == {471}
    assert len(out["misclassified"][471]) == 15
    assert all(f"good{i}" in out for i in range(30))
    assert not any(f"sus{i}" in out for i in range(15))


def test_detect_misclassification_uniform_group_kept(tmp_path, rng, data_root):
    genome_sus = random_dna(rng, 60_000)
    tax_dir = data_root / "misclassification" / "471"
    tax_dir.mkdir(parents=True)
    write_fasta([SeqRecord(genome_sus, id="chr")], tax_dir / "471.fna")

    records, hits = [], {}
    for i in range(30):
        rec = SeqRecord(random_dna(rng, 150), id=f"good{i}")
        records.append(rec)
        hits[rec.id] = {"470": 120, "471": 3}
    # suspect reads spread uniformly -> not clustered -> kept
    for i in range(15):
        s = i * 3900
        rec = SeqRecord(genome_sus[s : s + 150], id=f"sus{i}")
        records.append(rec)
        hits[rec.id] = {"470": 2, "471": 110}

    out = detect_misclassification(hits, records, min_reads=10)
    assert "misclassified" not in out
    assert all(f"sus{i}" in out for i in range(15))
