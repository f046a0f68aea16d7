"""End-to-end NCBI/PubMLST training against the mock services.

Exercises the full train_from_ncbi pipeline (reference behavior:
src/xspect/train.py:187-320) — genus resolution, Candidatus/" sp."
filtering, quality-walked accession selection, batched zip download,
cobs/svm 4+4 split, model training — and train_mlst (allele download +
per-locus index fit + designation lookup), all offline.
"""

import json

import numpy as np
import pytest

from tests.mock_services import (
    MLST_LOCI,
    MLST_ORGANISM,
    MLST_SCHEME,
    MLST_ST_FIELDS,
    MockServices,
    allele_seq,
    genome_for,
)


@pytest.fixture(scope="module")
def services():
    with MockServices() as svc:
        yield svc


def test_train_from_ncbi_end_to_end(services, data_root, monkeypatch):
    monkeypatch.setenv("XSPECT_NCBI_URL", services.url)
    from xspect2_tpu import model_management as mm
    from xspect2_tpu import train
    from xspect2_tpu.models.svm_model import ProbabilisticFilterSVMModel

    # no sleeping in tests: drop the anonymous 5 rps limit
    monkeypatch.setattr(
        "xspect2_tpu.handlers.http.HttpClient._wait_turn", lambda self: None
    )

    train.train_from_ncbi("Testus")

    meta = mm.get_model_metadata(mm.get_species_model_path("Testus"))
    # Candidatus + " sp." species filtered; 101 + 102 trained
    assert sorted(meta["display_names"]) == ["101", "102"]
    assert meta["display_names"]["101"] == "Testus primus"
    # 4+4 accession split recorded as provenance
    assert meta["training_accessions"]["101"] == [
        "GCF_101.1",
        "GCF_101.2",
        "GCF_101.3",
        "GCF_101.4",
    ]
    assert len(meta["svm_accessions"]["101"]) == 4

    # trained model classifies reads from a training genome correctly
    model = ProbabilisticFilterSVMModel.load(mm.get_species_model_path("Testus"))
    genome = genome_for("GCF_102.1")
    hits = model.calculate_hits(genome[100:400])
    assert max(hits, key=hits.get) == "102"

    # genus (metagenome) model trained alongside
    genus_meta = mm.get_model_metadata(mm.get_genus_model_path("Testus"))
    assert genus_meta["model_type"] == "Genus"


def test_train_mlst_end_to_end(services, data_root, monkeypatch):
    monkeypatch.setenv("XSPECT_PUBMLST_URL", f"{services.url}/db")
    from xspect2_tpu import model_management as mm
    from xspect2_tpu import train
    from xspect2_tpu.models.mlst_model import ProbabilisticFilterMlstSchemeModel

    train.train_mlst(MLST_ORGANISM, MLST_SCHEME)

    schemes = mm.get_available_mlst_schemes()
    assert MLST_SCHEME in schemes.get(MLST_ORGANISM, [])

    model_path = mm.get_mlst_model_path(MLST_ORGANISM, MLST_SCHEME)
    model = ProbabilisticFilterMlstSchemeModel.load(model_path)
    assert sorted(model.loci) == sorted(MLST_LOCI)

    # a genome embedding allele 1 of every locus types as ST 1 via the
    # mock designation POST
    rng = np.random.default_rng(0)
    filler = "".join("ACGT"[b] for b in rng.integers(0, 4, size=400))
    genome = filler.join(allele_seq(locus, 1) for locus in MLST_LOCI)
    from xspect2_tpu.io.fasta import SeqRecord

    result = model.predict(SeqRecord(genome, id="g1"))
    strain = result.get_results()["g1"][0]["Strain type"]
    for locus in MLST_LOCI:
        best_allele = next(iter(strain[locus]))
        assert best_allele == f"Allele_ID_1", (locus, strain[locus])
    assert strain["ST_Name"] == MLST_ST_FIELDS
