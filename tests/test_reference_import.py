"""Reference-bundle import: metadata carry-over + provenance rebuild.

Builds a fake reference model bundle (the reference's on-disk layout:
``<slug>.json`` metadata + per-model dirs with binary artifacts and
scores.csv, reference: src/xspect/models/probabilistic_filter_model.py:
333-391) whose recorded training accessions point at the mock NCBI
server, then imports it and checks that the rebuilt framework-native
models classify correctly.
"""

import json
import shutil
import zipfile
from pathlib import Path

import pytest

from tests.mock_services import (
    MLST_LOCI,
    MLST_ORGANISM,
    MLST_SCHEME,
    MockServices,
    genome_for,
)


@pytest.fixture(scope="module")
def services():
    with MockServices() as svc:
        yield svc


def _make_reference_bundle(root: Path) -> Path:
    """A bundle mimicking the reference's model zip layout."""
    bundle = root / "bundle"
    bundle.mkdir()

    svm_meta = {
        "model_slug": "testus-species",
        "k": 21,
        "model_display_name": "Testus",
        "author": "Ref Author",
        "author_email": "ref@example.org",
        "model_type": "Species",
        "model_class": "ProbabilisticFilterSVMModel",
        "display_names": {"101": "Testus primus", "102": "Testus secundus"},
        "fpr": 0.01,
        "num_hashes": 7,
        "training_accessions": {
            "101": ["GCF_101.1", "GCF_101.2"],
            "102": ["GCF_102.1", "GCF_102.2"],
        },
        "kernel": "rbf",
        "C": 1.0,
        "svm_accessions": {
            "101": ["GCF_101.3", "GCF_101.4"],
            "102": ["GCF_102.3", "GCF_102.4"],
        },
    }
    (bundle / "testus-species.json").write_text(json.dumps(svm_meta))
    model_dir = bundle / "testus-species"
    model_dir.mkdir()
    (model_dir / "index.cobs_classic").write_bytes(b"COBS-binary-opaque")
    (model_dir / "scores.csv").write_text("file,101,102,label\nx,1.0,0.1,101\n")

    genus_meta = {
        "model_slug": "testus-genus",
        "k": 21,
        "model_display_name": "Testus",
        "author": None,
        "author_email": None,
        "model_type": "Genus",
        "model_class": "ProbabilisticSingleFilterModel",
        "display_names": {"Testus": "Testus"},
        "fpr": 0.01,
        "num_hashes": 1,
        "training_accessions": ["GCF_101.1", "GCF_102.1"],
    }
    (bundle / "testus-genus.json").write_text(json.dumps(genus_meta))
    (bundle / "testus-genus").mkdir()
    (bundle / "testus-genus" / "filter.bloom").write_bytes(b"rbloom-opaque")

    mlst_meta = {
        "model_slug": "testorg-mlst-oxford-mlst",
        "k": 31,
        "model_display_name": MLST_SCHEME,
        "author": None,
        "author_email": None,
        "model_type": "MLST",
        "model_class": "ProbabilisticFilterMlstSchemeModel",
        "display_names": {},
        "fpr": 0.001,
        "num_hashes": 1,
        "training_accessions": None,
        "organism": MLST_ORGANISM,
        "scheme_url": None,
        "loci": MLST_LOCI,
        "average_locus_base_pair_size": 300,
    }
    (bundle / "testorg-mlst-oxford-mlst.json").write_text(json.dumps(mlst_meta))
    return bundle


def test_import_rebuilds_from_provenance(services, data_root, tmp_path, monkeypatch):
    monkeypatch.setenv("XSPECT_NCBI_URL", services.url)
    monkeypatch.setenv("XSPECT_PUBMLST_URL", f"{services.url}/db")
    monkeypatch.setattr(
        "xspect2_tpu.handlers.http.HttpClient._wait_turn", lambda self: None
    )
    from xspect2_tpu import model_management as mm
    from xspect2_tpu.models.svm_model import ProbabilisticFilterSVMModel
    from xspect2_tpu.reference_import import import_reference_models

    bundle = _make_reference_bundle(tmp_path)
    statuses = import_reference_models(bundle)
    assert statuses == {
        "testus-species": "rebuilt",
        "testus-genus": "rebuilt",
        "testorg-mlst-oxford-mlst": "rebuilt",
    }

    # rebuilt species model preserves reference metadata and classifies
    meta = mm.get_model_metadata(mm.get_species_model_path("Testus"))
    assert meta["author"] == "Ref Author"
    assert meta["display_names"]["102"] == "Testus secundus"
    model = ProbabilisticFilterSVMModel.load(mm.get_species_model_path("Testus"))
    hits = model.calculate_hits(genome_for("GCF_101.1")[50:350])
    assert max(hits, key=hits.get) == "101"

    # genus + MLST present in the registry; genus keeps its provenance
    assert mm.get_genus_model_path("Testus").exists()
    genus_meta = mm.get_model_metadata(mm.get_genus_model_path("Testus"))
    assert genus_meta["training_accessions"] == ["GCF_101.1", "GCF_102.1"]
    assert MLST_SCHEME in mm.get_available_mlst_schemes()[MLST_ORGANISM]


def test_import_zip_and_metadata_only_fallback(data_root, tmp_path, monkeypatch):
    """Without a reachable NCBI the import degrades to metadata-only."""
    monkeypatch.setenv("XSPECT_NCBI_URL", "http://127.0.0.1:1")  # unreachable
    monkeypatch.setenv("XSPECT_PUBMLST_URL", "http://127.0.0.1:1")
    from xspect2_tpu.definitions import get_xspect_model_path
    from xspect2_tpu.reference_import import import_reference_models

    bundle = _make_reference_bundle(tmp_path)
    zip_path = tmp_path / "models.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for p in bundle.rglob("*"):
            zf.write(p, p.relative_to(bundle))
    shutil.rmtree(bundle)

    statuses = import_reference_models(zip_path, rebuild=False)
    assert all(s.startswith("metadata-only") for s in statuses.values())
    # metadata + scores.csv landed; index marked for rebuild
    meta = json.loads(
        (get_xspect_model_path() / "testus-species.json").read_text()
    )
    assert meta["needs_rebuild"] is True
    assert (get_xspect_model_path() / "testus-species" / "scores.csv").exists()


def test_import_sanitizes_hostile_slugs(data_root, tmp_path, monkeypatch):
    """Bundle metadata is untrusted: traversal slugs must stay inside the registry."""
    monkeypatch.setenv("XSPECT_NCBI_URL", "http://127.0.0.1:1")  # unreachable
    from xspect2_tpu.definitions import get_xspect_model_path
    from xspect2_tpu.reference_import import import_reference_models

    bundle = tmp_path / "bundle"
    bundle.mkdir()
    (bundle / "evil.json").write_text(
        json.dumps(
            {
                "model_slug": "../../escape",
                "model_display_name": "../../escape",
                "model_class": "ProbabilisticFilterModel",
                "model_type": "Species",
                "k": 21,
            }
        )
    )
    statuses = import_reference_models(bundle, rebuild=False)
    assert len(statuses) == 1
    # nothing escaped the registry; the sanitized slug landed inside it
    assert not (tmp_path / "escape.json").exists()
    assert not (get_xspect_model_path().parent.parent / "escape.json").exists()
    written = list(get_xspect_model_path().glob("*.json"))
    assert any("escape" in p.name and ".." not in p.name for p in written)


def test_cli_import_command(services, data_root, tmp_path, monkeypatch):
    monkeypatch.setenv("XSPECT_NCBI_URL", services.url)
    monkeypatch.setenv("XSPECT_PUBMLST_URL", f"{services.url}/db")
    monkeypatch.setattr(
        "xspect2_tpu.handlers.http.HttpClient._wait_turn", lambda self: None
    )
    from click.testing import CliRunner

    from xspect2_tpu.main import cli

    bundle = _make_reference_bundle(tmp_path)
    result = CliRunner().invoke(cli, ["models", "import", "-p", str(bundle)])
    assert result.exit_code == 0, result.output
    assert "rebuilt" in result.output


def test_download_detects_native_bundle(data_root, tmp_path, monkeypatch):
    """A zip with .bbsi artifacts unpacks directly (no import layer)."""
    import numpy as np

    from xspect2_tpu import download_models
    from xspect2_tpu.definitions import get_xspect_model_path

    native_dir = tmp_path / "native"
    (native_dir / "m" / "index.bbsi").mkdir(parents=True)
    (native_dir / "m" / "index.bbsi" / "index_meta.json").write_text("{}")
    np.save(native_dir / "m" / "index.bbsi" / "table.npy", np.zeros(4, np.uint32))
    (native_dir / "m.json").write_text(json.dumps({"model_slug": "m"}))
    zip_path = tmp_path / "native.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for p in native_dir.rglob("*"):
            if p.is_file():
                zf.write(p, p.relative_to(native_dir))

    class _Resp:
        status_code = 200

        def raise_for_status(self):
            pass

        def iter_content(self, chunk_size):
            yield zip_path.read_bytes()

    monkeypatch.setattr(
        "requests.get", lambda url, stream=True, timeout=30: _Resp()
    )
    statuses = download_models.download_test_models(url="http://x/native.zip")
    assert statuses == {"bundle": "native"}
    assert (get_xspect_model_path() / "m" / "index.bbsi" / "table.npy").exists()
