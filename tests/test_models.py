"""Model-layer tests: filter model, single-filter (genus) model, results.

Synthetic-fixture analogues of the reference's golden-number tests
(reference: tests/test_probabilistic_filter_model.py,
tests/test_probabilistic_single_filter_model.py): the environment has no
network access, so instead of NCBI assemblies we use seeded synthetic
genomes with engineered overlap and pin the same *structural* oracles
(own-class total score 1.0, probe hits = num k-mers, hits scale as 1/step).
"""

from pathlib import Path

import numpy as np
import pytest

from xspect2_tpu.io.fasta import SeqRecord, write_fasta
from xspect2_tpu.models.filter_model import ProbabilisticFilterModel
from xspect2_tpu.models.result import ModelResult
from xspect2_tpu.models.single_filter_model import ProbabilisticSingleFilterModel
from tests.conftest import random_dna


@pytest.fixture()
def species_dir(tmp_path, rng):
    """Three synthetic species genomes; species '471' shares 60% of '470'."""
    d = tmp_path / "species"
    d.mkdir()
    g470 = random_dna(rng, 12000)
    g471 = g470[:7200] + random_dna(rng, 4800)  # engineered overlap
    g480 = random_dna(rng, 12000)
    for name, seq in (("470", g470), ("471", g471), ("480", g480)):
        write_fasta([SeqRecord(seq, id=name)], d / f"{name}.fasta")
    return d, {"470": g470, "471": g471, "480": g480}


def _make_model(tmp_path):
    return ProbabilisticFilterModel(
        k=21,
        model_display_name="Synthetic",
        author="t",
        author_email="t@example.com",
        model_type="Species",
        base_path=tmp_path / "models",
        fpr=0.01,
        num_hashes=7,
    )


def test_fit_predict_training_genomes(tmp_path, species_dir):
    d, genomes = species_dir
    model = _make_model(tmp_path)
    model.fit(d)
    assert sorted(model.display_names) == ["470", "471", "480"]

    # own class scores 1.0; engineered overlap lands in between; unrelated ~0
    res = model.predict(d / "470.fasta")
    scores = res.get_scores()["total"]
    assert scores["470"] == 1.0
    assert 0.4 < scores["471"] < 0.8
    assert scores["480"] <= 0.02

    res = model.predict(d / "480.fasta")
    scores = res.get_scores()["total"]
    assert scores["480"] == 1.0
    assert scores["470"] <= 0.02


def test_probe_hits_exact_and_step_scaling(tmp_path, species_dir):
    d, genomes = species_dir
    model = _make_model(tmp_path)
    model.fit(d)

    # 80 bp probe from '470': 60 k-mers, all present (the reference pins
    # exactly this shape: 60 hits, reference: tests/test_probabilistic_filter_model.py:84-94)
    probe = genomes["470"][500:580]
    hits = model.calculate_hits(probe)
    assert hits["470"] == 60
    for step in (2, 3, 10):
        hits_s = model.calculate_hits(probe, step=step)
        assert hits_s["470"] == int(np.ceil(60 / step))

    rec = SeqRecord(probe, id="probe")
    res = model.predict(rec)
    assert res.num_kmers == {"probe": 60}
    assert res.get_scores()["probe"]["470"] == 1.0


def test_exclude_ids_and_display_names(tmp_path, species_dir):
    d, _ = species_dir
    model = _make_model(tmp_path)
    model.fit(d, display_names={"470": "Synthetic baumannii"})
    probe = SeqRecord(random_dna(np.random.default_rng(5), 100), id="p")
    hits = model.calculate_hits(probe.seq, exclude_ids=["471"])
    assert "471" not in hits and "470" in hits

    res = model.predict(probe, display_name=True)
    keys = list(res.hits["p"].keys())
    assert any(k.startswith("470 -") and "baumannii" in k for k in keys)


def test_save_load_roundtrip(tmp_path, species_dir):
    d, genomes = species_dir
    model = _make_model(tmp_path)
    model.fit(d)
    model.save()

    loaded = ProbabilisticFilterModel.load(
        tmp_path / "models" / "synthetic-species.json"
    )
    assert loaded.slug() == model.slug()
    assert loaded.display_names == model.display_names
    probe = genomes["471"][100:400]
    assert loaded.calculate_hits(probe) == model.calculate_hits(probe)


def test_predict_rejects_short_record(tmp_path, species_dir):
    d, _ = species_dir
    model = _make_model(tmp_path)
    model.fit(d)
    with pytest.raises(ValueError, match="longer than k"):
        model.predict(SeqRecord("ACGTACGT", id="short"))


def test_single_filter_model(tmp_path, rng):
    meta = random_dna(rng, 30000)
    meta_path = tmp_path / "Synthgenus.fasta"
    write_fasta([SeqRecord(meta, id="metagenome")], meta_path)

    model = ProbabilisticSingleFilterModel(
        k=21,
        model_display_name="Synthgenus",
        author=None,
        author_email=None,
        model_type="Genus",
        base_path=tmp_path / "models",
    )
    model.fit(meta_path, "Synthgenus")

    # 22-mer probe from the metagenome -> exactly 2 k-mers, both hit
    # (the reference pins this shape, reference:
    # tests/test_probabilistic_single_filter_model.py:41-45)
    probe = meta[1000:1022]
    hits = model.calculate_hits(probe)
    assert hits == {"Synthgenus": 2}

    # full metagenome scores 1.0
    res = model.predict(meta_path)
    assert res.get_scores()["total"]["Synthgenus"] == 1.0

    # unrelated probe ~ fpr
    other = random_dna(np.random.default_rng(1), 5000)
    hits = model.calculate_hits(other)
    assert hits["Synthgenus"] < 0.03 * (5000 - 20)

    model.save()
    loaded = ProbabilisticSingleFilterModel.load(
        tmp_path / "models" / "synthgenus-genus.json"
    )
    assert loaded.calculate_hits(probe) == {"Synthgenus": 2}


def test_model_result_scores_and_masks():
    res = ModelResult(
        "m",
        hits={"r1": {"a": 50, "b": 10}, "r2": {"a": 5, "b": 99}},
        num_kmers={"r1": 100, "r2": 100},
    )
    scores = res.get_scores()
    assert scores["r1"] == {"a": 0.5, "b": 0.1}
    assert scores["total"] == {"a": round(55 / 200, 2), "b": round(109 / 200, 2)}
    assert res.get_total_hits() == {"a": 55, "b": 109}
    assert res.get_filter_mask("a", 0.3) == {"r1": True, "r2": False}
    assert res.get_filtered_subsequence_labels("b", -1) == ["r2"]
    with pytest.raises(ValueError):
        res.get_filter_mask("a", 1.5)


def test_model_result_reserved_total_and_save(tmp_path):
    with pytest.raises(ValueError, match="total"):
        ModelResult("m", {"total": {}}, {})
    res = ModelResult(
        "m", {"r": {"a": 1}}, {"r": 2}, prediction="a", input_source="f.fasta"
    )
    out = tmp_path / "res.json"
    res.save(out)
    import json

    data = json.loads(out.read_text())
    assert data["prediction"] == "a"
    assert data["scores"]["r"]["a"] == 0.5
    assert data["misclassified"] is None
    assert data["input_source"] == "f.fasta"


def test_predict_fastq_fast_route_matches_general(tmp_path, species_dir, rng):
    """Uniform-length FASTQ files route through the native-parse matrix
    path; results must be identical to the general per-record path."""
    d, genomes = species_dir
    model = _make_model(tmp_path)
    model.fit(d)

    n, length = 600, 120
    fq = tmp_path / "reads.fastq"
    names = sorted(genomes)
    with open(fq, "w", encoding="utf-8") as f:
        for i in range(n):
            src = genomes[names[i % 3]]
            start = int(rng.integers(0, len(src) - length))
            seq = src[start : start + length]
            if i == 7:  # an N base must be handled identically
                seq = seq[:50] + "N" + seq[51:]
            f.write(f"@r{i}\n{seq}\n+\n{'I' * length}\n")

    for step in (1, 4):
        fast = model.predict(fq, step=step)
        from xspect2_tpu.io.fasta import get_record_iterator

        general = model.predict(list(get_record_iterator(fq)), step=step)
        assert fast.hits == general.hits, f"step={step}"
        assert fast.num_kmers == general.num_kmers
        assert list(fast.hits) == [f"r{i}" for i in range(n)]
