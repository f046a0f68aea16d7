"""CLI MLST classification against a locally-trained synthetic scheme."""

import json

import pytest
from click.testing import CliRunner

from xspect2_tpu.io.fasta import SeqRecord, write_fasta
from xspect2_tpu.models.mlst_model import ProbabilisticFilterMlstSchemeModel
from tests.conftest import random_dna

K = 31


@pytest.fixture()
def mlst_registry(data_root, tmp_path, rng):
    from xspect2_tpu.definitions import get_xspect_model_path

    scheme = tmp_path / "scheme"
    alleles = {}
    for locus in ("Oxf_cpn60", "Oxf_gltA"):
        locus_dir = scheme / locus
        locus_dir.mkdir(parents=True)
        base = random_dna(rng, 450)
        for n in (1, 2, 3):
            v = list(base)
            for _ in range(n * 3):
                v[int(rng.integers(0, 450))] = "ACGT"[int(rng.integers(0, 4))]
            alleles[(locus, n)] = "".join(v)
            write_fasta(
                [SeqRecord("".join(v), id=f"{locus}_{n}")],
                locus_dir / f"Allele_ID_{n}.fasta",
            )

    model = ProbabilisticFilterMlstSchemeModel(
        K, "Oxford", get_xspect_model_path(), "https://example.org/s/1", "abaumannii"
    )
    model.fit(scheme)
    model.save()
    return alleles


def test_cli_classify_mlst(mlst_registry, tmp_path):
    import importlib

    import xspect2_tpu.main as main_mod

    importlib.reload(main_mod)

    alleles = mlst_registry
    sample = tmp_path / "sample.fasta"
    write_fasta([SeqRecord(alleles[("Oxf_cpn60", 2)], id="probe")], sample)
    out = tmp_path / "mlst.json"

    runner = CliRunner()
    result = runner.invoke(
        main_mod.cli,
        [
            "classify",
            "mlst",
            "-i",
            str(sample),
            "--organism",
            "abaumannii",
            "--mlst-scheme",
            "Oxford",
            "-o",
            str(out),
        ],
    )
    assert result.exit_code == 0, result.output
    data = json.loads(out.read_text())
    assert data["Scheme"] == "Oxford"
    strain = data["Results"]["probe"][0]["Strain type"]
    assert next(iter(strain["Oxf_cpn60"])) == "Allele_ID_2"
    # sufficiency met -> ST lookup attempted; offline -> graceful N/A
    assert "ST_Name" in strain
    assert str(strain["ST_Name"]).startswith("N/A")


def test_cli_classify_mlst_unknown_scheme(mlst_registry, tmp_path):
    import importlib

    import xspect2_tpu.main as main_mod

    importlib.reload(main_mod)
    runner = CliRunner()
    result = runner.invoke(
        main_mod.cli,
        [
            "classify",
            "mlst",
            "-i",
            ".",
            "--organism",
            "abaumannii",
            "--mlst-scheme",
            "NopeScheme",
        ],
    )
    assert result.exit_code != 0
    assert "not found" in result.output
