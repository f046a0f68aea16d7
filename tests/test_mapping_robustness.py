"""Mapper robustness on realistic (mutated, long) reads.

The misclassification scenario maps reads of one species onto another
species' reference, so reads carry SNPs and indels relative to the
reference; long-read inputs (1-10 kb) additionally select the
reference's map-ont preset regime (reference:
src/xspect/misclassification_detection/mapping.py:66-69).  These tests
pin: >= 95% primary-start recovery within a small tolerance under 2-5%
SNPs + indels, the short/long preset split, and the stability of the
downstream Ripley's-K verdict on mutated reads.
"""

import numpy as np
import pytest

from xspect2_tpu.io.fasta import SeqRecord, write_fasta
from xspect2_tpu.misclassification_detection.mapping import (
    LONG_READ_PRESET,
    MappingHandler,
    SHORT_READ_PRESET,
    preset_for_read_length,
)
from xspect2_tpu.misclassification_detection.point_pattern_analysis import (
    PointPatternAnalysis,
)

GENOME_LEN = 120_000
BASES = np.array(list("ACGT"))


def _genome(rng):
    return "".join(rng.choice(BASES, size=GENOME_LEN))


def _mutate(rng, seq: str, snp_rate: float, indel_rate: float) -> str:
    """Apply SNPs and short (1-3 bp) insertions/deletions."""
    out = []
    i = 0
    while i < len(seq):
        r = rng.random()
        if r < indel_rate / 2:  # deletion
            i += int(rng.integers(1, 4))
            continue
        if r < indel_rate:  # insertion
            out.append("".join(rng.choice(BASES, size=int(rng.integers(1, 4)))))
        base = seq[i]
        if rng.random() < snp_rate:
            base = rng.choice(BASES[BASES != base])
        out.append(base)
        i += 1
    return "".join(out)


def _extract_reads(rng, genome, n, length, snp_rate, indel_rate, clustered=None):
    reads, starts = [], []
    for j in range(n):
        if clustered is None:
            start = int(rng.integers(0, len(genome) - length))
        else:
            lo, hi = clustered
            start = int(rng.integers(lo, hi - length))
        raw = genome[start : start + length]
        mutated = _mutate(rng, raw, snp_rate, indel_rate)
        if rng.random() < 0.5:
            comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
            mutated = "".join(comp[b] for b in reversed(mutated))
        reads.append(SeqRecord(mutated, id=f"r{j}"))
        starts.append(start)
    return reads, starts


def _map(tmp_path, genome, reads):
    ref_path = tmp_path / "ref.fasta"
    reads_path = tmp_path / "reads.fasta"
    write_fasta([SeqRecord(genome, id="chr1")], ref_path)
    write_fasta(reads, reads_path)
    handler = MappingHandler(str(ref_path), str(reads_path))
    handler.map_reads_onto_reference()
    handler.extract_starting_coordinates()
    return handler


def _recovery(handler, true_starts, reads, tolerance):
    mapped = {read_id: start for _ci, read_id, start in handler._alignments}
    ok = sum(
        1
        for j, rec in enumerate(reads)
        if rec.id in mapped and abs(mapped[rec.id] - true_starts[j]) <= tolerance
    )
    return ok / len(reads)


def test_preset_split_matches_reference_lengths():
    assert preset_for_read_length(100) is SHORT_READ_PRESET
    assert preset_for_read_length(150) is SHORT_READ_PRESET
    assert preset_for_read_length(151) is LONG_READ_PRESET
    assert preset_for_read_length(10_000) is LONG_READ_PRESET


@pytest.mark.parametrize("snp_rate", [0.02, 0.05])
def test_short_reads_with_snps_and_indels(tmp_path, rng, snp_rate):
    genome = _genome(rng)
    reads, starts = _extract_reads(
        rng, genome, n=120, length=150, snp_rate=snp_rate, indel_rate=0.005
    )
    handler = _map(tmp_path, genome, reads)
    rate = _recovery(handler, starts, reads, tolerance=30)
    assert rate >= 0.95, f"start recovery {rate:.2f} at snp_rate={snp_rate}"


def test_long_reads_with_heavy_errors(tmp_path, rng):
    """1-10 kb reads at ~5% SNPs + 1% indels (ONT-like error regime)."""
    genome = _genome(rng)
    reads, starts = [], []
    for j in range(40):
        length = int(rng.integers(1000, 10_000))
        r, s = _extract_reads(
            rng, genome, n=1, length=length, snp_rate=0.05, indel_rate=0.01
        )
        r[0].id = f"r{j}"
        reads.append(r[0])
        starts.append(s[0])
    handler = _map(tmp_path, genome, reads)
    rate = _recovery(handler, starts, reads, tolerance=250)
    assert rate >= 0.95, f"long-read start recovery {rate:.2f}"


def test_ripleys_verdict_stable_under_mutation(tmp_path, rng):
    """Clustered mutated reads stay 'clustered'; uniform stay not."""
    genome = _genome(rng)

    clustered_reads, _ = _extract_reads(
        rng, genome, n=60, length=150, snp_rate=0.03, indel_rate=0.005,
        clustered=(40_000, 44_000),
    )
    handler = _map(tmp_path, genome, clustered_reads)
    coords = handler.get_start_coordinates()
    ppa = PointPatternAnalysis(coords, handler.get_total_genome_length())
    clustered, _k, _thresh = ppa.ripleys_k_edge_corrected()
    assert clustered is True

    # CSR sits exactly at the K = 2r decision boundary, so a fully
    # random-uniform sample flips by seed (inherent to the reference's
    # K > 2r rule); stratified starts give a stably dispersed pattern
    uniform_reads = []
    for j, base in enumerate(range(0, GENOME_LEN - 2000, 2000)):
        start = base + int(rng.integers(0, 500))
        raw = genome[start : start + 150]
        uniform_reads.append(
            SeqRecord(_mutate(rng, raw, 0.03, 0.005), id=f"u{j}")
        )
    handler2 = _map(tmp_path, genome, uniform_reads)
    coords2 = handler2.get_start_coordinates()
    ppa2 = PointPatternAnalysis(coords2, handler2.get_total_genome_length())
    clustered2, _k2, _thresh2 = ppa2.ripleys_k_edge_corrected()
    assert clustered2 is False
