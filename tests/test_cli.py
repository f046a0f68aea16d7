"""CLI integration tests via click.testing.CliRunner, mirroring the
reference's CLI coverage (reference: tests/test_cli.py) on the shared
synthetic registry."""

import json
from pathlib import Path

import pytest
from click.testing import CliRunner

from xspect2_tpu.io.fasta import SeqRecord, parse_fasta, write_fasta


@pytest.fixture()
def runner():
    return CliRunner()


@pytest.fixture()
def cli(session_data_root):
    # import after the registry exists so registry-derived choices populate
    import importlib

    import xspect2_tpu.main as main_mod

    importlib.reload(main_mod)
    return main_mod.cli


def test_models_list(cli, runner, session_data_root):
    result = runner.invoke(cli, ["models", "list"])
    assert result.exit_code == 0
    assert "Species" in result.output
    assert "Synthetic" in result.output
    assert "Genus" in result.output


def test_version(cli, runner):
    result = runner.invoke(cli, ["--version"])
    assert result.exit_code == 0


def test_classify_species_cli(cli, runner, session_data_root, tmp_path):
    root, genomes = session_data_root
    sample = tmp_path / "sample.fasta"
    write_fasta([SeqRecord(genomes["470"], id="c1")], sample)
    out = tmp_path / "out.json"
    result = runner.invoke(
        cli,
        [
            "classify",
            "species",
            "-g",
            "Synthetic",
            "-i",
            str(sample),
            "-o",
            str(out),
        ],
    )
    assert result.exit_code == 0, result.output
    data = json.loads(out.read_text())
    assert data["prediction"] == "470"
    assert data["scores"]["total"]["470"] == 1.0


def test_classify_species_display_names_and_exclude(
    cli, runner, session_data_root, tmp_path
):
    root, genomes = session_data_root
    sample = tmp_path / "sample.fasta"
    write_fasta([SeqRecord(genomes["470"], id="c1")], sample)
    out = tmp_path / "out.json"
    result = runner.invoke(
        cli,
        [
            "classify",
            "species",
            "-g",
            "Synthetic",
            "-i",
            str(sample),
            "-o",
            str(out),
            "-n",
            "--exclude-species",
            "471",
        ],
    )
    assert result.exit_code == 0, result.output
    data = json.loads(out.read_text())
    hits = data["hits"]["c1"]
    assert any("baumannii" in k for k in hits)
    assert not any(k.startswith("471") for k in hits)


def test_classify_genus_cli(cli, runner, session_data_root, tmp_path):
    root, genomes = session_data_root
    sample = tmp_path / "s.fasta"
    write_fasta([SeqRecord(genomes["471"][:4000], id="c")], sample)
    out = tmp_path / "g.json"
    result = runner.invoke(
        cli,
        ["classify", "genus", "-g", "Synthetic", "-i", str(sample), "-o", str(out)],
    )
    assert result.exit_code == 0, result.output
    data = json.loads(out.read_text())
    assert data["scores"]["total"]["Synthetic"] == 1.0


def test_filter_species_cli(cli, runner, session_data_root, tmp_path):
    root, genomes = session_data_root
    mixed = tmp_path / "mixed.fasta"
    records = [
        SeqRecord(genomes["470"][i * 700 : i * 700 + 400], id=f"a{i}")
        for i in range(5)
    ] + [
        SeqRecord(genomes["471"][i * 700 : i * 700 + 400], id=f"b{i}")
        for i in range(5)
    ]
    write_fasta(records, mixed)
    out = tmp_path / "filtered.fasta"
    result = runner.invoke(
        cli,
        [
            "filter",
            "species",
            "-g",
            "Synthetic",
            "-s",
            "baumannii",
            "-i",
            str(mixed),
            "-o",
            str(out),
            "-t",
            "-1",
        ],
    )
    assert result.exit_code == 0, result.output
    kept = [r.id for r in parse_fasta(out)]
    assert set(kept) == {f"a{i}" for i in range(5)}


def test_filter_species_cli_bad_threshold(cli, runner, session_data_root, tmp_path):
    result = runner.invoke(
        cli,
        ["filter", "species", "-g", "Synthetic", "-i", ".", "-o", "x.fasta", "-t", "-3"],
    )
    assert result.exit_code != 0
    assert "Threshold" in result.output


def test_all_pipeline_cli(cli, runner, session_data_root, tmp_path):
    root, genomes = session_data_root
    sample = tmp_path / "sample.fasta"
    write_fasta([SeqRecord(genomes["470"], id="c1")], sample)
    out_dir = tmp_path / "results"
    result = runner.invoke(
        cli,
        ["all", "-g", "Synthetic", "-i", str(sample), "-o", str(out_dir)],
    )
    assert result.exit_code == 0, result.output
    # genus filtering + species classification artifacts exist
    assert list(out_dir.glob("genus_classification_*.json"))
    species_results = list(out_dir.glob("species_classification_*.json"))
    assert species_results
    data = json.loads(species_results[0].read_text())
    assert data["prediction"] == "470"
    # prediction 470 triggers the MLST branch, but no scheme is installed
    assert "No MLST schemes available" in result.output
