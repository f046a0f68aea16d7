"""XXH3 reference-hash-family compat path (core/compat.py).

Pins the byte-parity pipeline SURVEY.md §7 flags as the hard part:
reconstructing the exact ASCII canonical-k-mer string the reference's
rbloom filter hashes (reference:
src/xspect/models/probabilistic_single_filter_model.py:88,157,161-180)
from packed 2-bit k-mers, hashing it with the pinned XXH3-64, and
querying a Bloom filter with host hashes + device bit tests.
"""

import random

import numpy as np
import pytest

from xspect2_tpu.core import compat, dna
from xspect2_tpu.core.xxh3 import xxh3_64


def _random_seq(n, seed):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))


def _py_canonical(seq: str, k: int) -> list[str]:
    comp = str.maketrans("ACGT", "TGCA")
    out = []
    for i in range(len(seq) - k + 1):
        kmer = seq[i : i + k]
        rc = kmer.translate(comp)[::-1]
        out.append(min(kmer, rc))
    return out


@pytest.mark.parametrize("k", [5, 16, 21, 31])
def test_ascii_from_packed_matches_string_canonicalization(k):
    seq = _random_seq(300, seed=k)
    hi, lo, valid = dna.canonical_kmers(dna.encode(seq), k)
    assert valid.all()
    rows = compat.ascii_from_packed(hi, lo, k)
    got = [bytes(r).decode("ascii") for r in rows]
    assert got == _py_canonical(seq, k)


def test_kmer_digests_match_reference_hash_input():
    # digest of the packed k-mer == xxh3_64 of the canonical ASCII string:
    # byte-identical input to the reference's xxh3_64_intdigest(str(kmer))
    k = 21
    seq = _random_seq(120, seed=7)
    hi, lo, _ = dna.canonical_kmers(dna.encode(seq), k)
    digests = compat.kmer_digests(hi, lo, k)
    for d, s in zip(digests, _py_canonical(seq, k)):
        assert int(d) == xxh3_64(s.encode("ascii"))


def test_bloom_no_false_negatives_and_bounded_fpr():
    k = 21
    genome = _random_seq(20_000, seed=1)
    filt = compat.XXH3BloomFilter.for_items(len(genome) - k + 1, 0.01, k)
    filt.insert_sequence(genome)

    # every inserted k-mer must hit (the reference's no-false-negative contract)
    hi, lo, valid = dna.canonical_kmers(dna.encode(genome), k)
    n = int(valid.sum())
    assert filt.count_hits_host(hi, lo, valid) == n

    # unrelated k-mers hit at ~fpr
    probe = _random_seq(20_000, seed=2)
    hi2, lo2, valid2 = dna.canonical_kmers(dna.encode(probe), k)
    fp = filt.count_hits_host(hi2, lo2, valid2)
    assert fp / int(valid2.sum()) < 0.03


def test_device_count_equals_host_count():
    k = 21
    genome = _random_seq(5_000, seed=3)
    filt = compat.XXH3BloomFilter.for_items(len(genome) - k + 1, 0.01, k)
    filt.insert_sequence(genome)
    for probe_seed in (3, 4):
        probe = _random_seq(777, seed=probe_seed)
        hi, lo, valid = dna.canonical_kmers(dna.encode(probe), k)
        assert filt.count_hits_device(hi, lo, valid) == filt.count_hits_host(
            hi, lo, valid
        )


def test_invalid_bases_are_skipped():
    k = 21
    filt = compat.XXH3BloomFilter.for_items(100, 0.01, k)
    filt.insert_sequence("ACGT" * 10)
    seq = "ACGT" * 5 + "N" + "ACGT" * 5
    hi, lo, valid = dna.canonical_kmers(dna.encode(seq), k)
    assert not valid.all()
    # windows containing the N are not counted on either path.  NOTE:
    # this is a documented PARITY GAP, not reference behavior — the
    # reference inserts and queries N-bearing windows as literal
    # strings, so the same trained subsequence scores 1.0 there
    # (core/compat.py module docstring "Known parity gap", PARITY.md)
    assert filt.count_hits_host(hi, lo, valid) == int(valid.sum())
    assert filt.count_hits_device(hi, lo, valid) == int(valid.sum())


def test_save_load_roundtrip(tmp_path):
    k = 21
    filt = compat.XXH3BloomFilter.for_items(1000, 0.01, k)
    filt.insert_sequence(_random_seq(1000, seed=5))
    path = tmp_path / "filter.xxh3.npz"
    filt.save(path)
    back = compat.XXH3BloomFilter.load(path)
    assert back.num_bits == filt.num_bits
    assert back.num_hashes == filt.num_hashes
    assert back.k == filt.k
    assert np.array_equal(back.words, filt.words)


def test_genus_model_xxh3_hash_family(tmp_path):
    """Production caller: the genus model trains/loads/predicts in compat mode."""
    from xspect2_tpu.io.fasta import SeqRecord
    from xspect2_tpu.models.single_filter_model import (
        ProbabilisticSingleFilterModel,
    )

    genome = _random_seq(8_000, seed=11)
    meta = tmp_path / "metagenome.fasta"
    meta.write_text(f">g1\n{genome}\n")

    model = ProbabilisticSingleFilterModel(
        21, "CompatGenus", "a", "a@b.c", "Genus", tmp_path, hash_family="xxh3"
    )
    model.fit(meta, "CompatGenus")
    model.save()

    # metadata records the hash family and the artifact is the npz filter
    assert (tmp_path / model.slug() / "filter.xxh3.npz").exists()
    loaded = ProbabilisticSingleFilterModel.load(
        tmp_path / f"{model.slug()}.json"
    )
    assert loaded.hash_family == "xxh3"
    assert loaded.compat_filter is not None

    # a training subsequence scores 1.0; a foreign one scores ~fpr
    sub = genome[1000:1400]
    hits = loaded.calculate_hits(sub)
    assert hits == {"metagenome": len(sub) - 21 + 1}
    res = loaded.predict(
        [
            SeqRecord(sub, id="inside"),
            SeqRecord(_random_seq(400, seed=12), id="outside"),
        ]
    )
    scores = res.get_scores()
    assert scores["inside"]["metagenome"] == 1.0
    assert scores["outside"]["metagenome"] < 0.05

    # sparse sampling step thins the probes exactly like the dense path
    hits_step = loaded.calculate_hits(sub, step=7)
    assert hits_step == {"metagenome": -(-(len(sub) - 21 + 1) // 7)}


def test_classify_genus_facade_with_compat_model(tmp_path, monkeypatch):
    """The compat model flows through the production classify facade
    (registry resolution + model cache + result JSON on disk)."""
    import json

    monkeypatch.setenv("XSPECT_DATA_ROOT", str(tmp_path / "xspect-data"))
    from xspect2_tpu import classify
    from xspect2_tpu.definitions import get_xspect_model_path
    from xspect2_tpu.models.single_filter_model import (
        ProbabilisticSingleFilterModel,
    )

    genome = _random_seq(8_000, seed=21)
    meta = tmp_path / "compatgenus.fasta"
    meta.write_text(f">m\n{genome}\n")

    model = ProbabilisticSingleFilterModel(
        21,
        "CompatX",
        "t",
        "t@x.y",
        "Genus",
        get_xspect_model_path(),
        hash_family="xxh3",
    )
    model.fit(meta, "CompatX")
    model.save()

    sample = tmp_path / "sample.fasta"
    sample.write_text(f">c1\n{genome[2000:5000]}\n")
    out = tmp_path / "genus.json"
    classify.classify_genus("CompatX", sample, out)
    data = json.loads(out.read_text())
    assert data["scores"]["total"]["compatgenus"] == 1.0
    assert data["model_slug"] == "compatx-genus"
