"""End-to-end orchestration tests: train_from_directory -> registry ->
classify/filter facades, mirroring the reference's CLI-level coverage
(reference: tests/test_cli.py) on synthetic data."""

import json
from pathlib import Path

import numpy as np
import pytest

import xspect2_tpu.model_management as mm
from xspect2_tpu import classify, filter_sequences, train
from xspect2_tpu.io.fasta import SeqRecord, parse_fasta, write_fasta
from tests.conftest import random_dna


@pytest.fixture()
def trained_registry(tmp_path, rng, data_root):
    """Train an SVM species model + genus model from a synthetic directory."""
    train_dir = tmp_path / "train"
    genomes = {}
    for label in ("470", "471"):
        base = random_dna(rng, 8000)
        genomes[label] = base
        (train_dir / "cobs" / label).mkdir(parents=True)
        write_fasta(
            [SeqRecord(base, id=label)], train_dir / "cobs" / label / "a.fasta"
        )
        (train_dir / "svm" / label).mkdir(parents=True)
        for j in range(2):
            variant = list(base)
            variant[500 * (j + 1) : 500 * (j + 1) + 300] = random_dna(rng, 300)
            write_fasta(
                [SeqRecord("".join(variant), id=f"{label}v{j}")],
                train_dir / "svm" / label / f"ACC{j}.fasta",
            )

    train.train_from_directory(
        "Synthetic",
        train_dir,
        meta=True,
        translation_dict={"470": "Synthetic baumannii", "471": "Synthetic pittii"},
        author="tester",
        author_email="t@example.com",
    )
    return genomes


def test_registry_after_training(trained_registry, data_root):
    models = mm.get_models()
    assert "Synthetic" in models["Species"]
    assert "Synthetic" in models["Genus"]
    assert mm.is_svm_model("synthetic-species")
    meta = mm.get_model_metadata("synthetic-species")
    assert meta["model_class"] == "ProbabilisticFilterSVMModel"
    assert meta["display_names"]["470"] == "Synthetic baumannii"
    assert meta["author"] == "tester"
    assert meta["k"] == 21
    assert meta["kernel"] == "rbf" and meta["C"] == 1.0


def test_classify_species_facade(trained_registry, tmp_path, data_root):
    genomes = trained_registry
    sample = tmp_path / "sample.fasta"
    write_fasta([SeqRecord(genomes["471"], id="contig1")], sample)
    out = tmp_path / "result.json"
    classify.classify_species("Synthetic", sample, out)
    data = json.loads(out.read_text())
    assert data["prediction"] == "471"
    assert data["scores"]["total"]["471"] == 1.0
    assert data["input_source"] == "sample.fasta"
    assert data["model_slug"] == "synthetic-species"


def test_classify_genus_facade(trained_registry, tmp_path, data_root):
    genomes = trained_registry
    sample = tmp_path / "sample.fasta"
    write_fasta([SeqRecord(genomes["470"][:3000], id="c1")], sample)
    out = tmp_path / "genus.json"
    classify.classify_genus("Synthetic", sample, out)
    data = json.loads(out.read_text())
    assert data["scores"]["total"]["Synthetic"] == 1.0


def test_classify_directory_fanout(trained_registry, tmp_path, data_root):
    genomes = trained_registry
    in_dir = tmp_path / "inputs"
    in_dir.mkdir()
    for i, label in enumerate(("470", "471")):
        write_fasta(
            [SeqRecord(genomes[label], id=f"s{i}")], in_dir / f"s{i}.fasta"
        )
    out = tmp_path / "res.json"
    classify.classify_species("Synthetic", in_dir, out)
    results = sorted(tmp_path.glob("res_*.json"))
    assert len(results) == 2
    preds = {json.loads(p.read_text())["prediction"] for p in results}
    assert preds == {"470", "471"}


def test_filter_genus_then_species(trained_registry, tmp_path, data_root):
    """Mixed-species read filtering: genus filter keeps genus reads, species
    argmax filter separates the two species (reference: tests/test_cli.py:250-276)."""
    genomes = trained_registry
    rng = np.random.default_rng(77)
    mixed = tmp_path / "mixed.fasta"
    records = []
    for i in range(10):
        records.append(SeqRecord(genomes["470"][i * 700 : i * 700 + 400], id=f"a{i}"))
        records.append(SeqRecord(genomes["471"][i * 700 : i * 700 + 400], id=f"b{i}"))
        records.append(
            SeqRecord("".join(rng.choice(list("ACGT"), size=400)), id=f"junk{i}")
        )
    write_fasta(records, mixed)

    genus_filtered = tmp_path / "genus_filtered.fasta"
    filter_sequences.filter_genus("Synthetic", mixed, genus_filtered, 0.7)
    kept = [r.id for r in parse_fasta(genus_filtered)]
    assert set(kept) == {f"a{i}" for i in range(10)} | {f"b{i}" for i in range(10)}

    species_filtered = tmp_path / "species_filtered.fasta"
    filter_sequences.filter_species(
        "Synthetic", "470", mixed, species_filtered, -1
    )
    kept = [r.id for r in parse_fasta(species_filtered)]
    # argmax (-1) keeps records whose '470' score equals the row max: all
    # a-reads, no b-reads; junk reads tie at 0.00 == 0.00 and pass unless
    # fpr noise nudges the other class to 0.01 — matching the reference's
    # tie semantics (reference: src/xspect/models/result.py:120-123)
    assert {f"a{i}" for i in range(10)} <= set(kept)
    assert not any(r.startswith("b") for r in kept)

    # filtering the genus-filtered file separates the two species cleanly
    species_filtered2 = tmp_path / "species_filtered2.fasta"
    filter_sequences.filter_species(
        "Synthetic", "470", genus_filtered, species_filtered2, -1
    )
    kept2 = [r.id for r in parse_fasta(species_filtered2)]
    assert set(kept2) == {f"a{i}" for i in range(10)}


def test_update_metadata_and_display_name(trained_registry, data_root):
    mm.update_model_metadata("synthetic-species", "alice", "a@b.c")
    meta = mm.get_model_metadata("synthetic-species")
    assert meta["author"] == "alice"
    mm.update_model_display_name("synthetic-species", "470", "Renamed")
    assert mm.get_model_metadata("synthetic-species")["display_names"]["470"] == (
        "Renamed"
    )
    assert "Renamed" in mm.get_model_display_names("synthetic-species")
