"""Handler tests against the local mock NCBI/PubMLST servers.

The reference's handler tests hit the live services (reference:
tests/test_ncbi.py, tests/test_pub_mlst_handler.py — network + API key
required); these cover the same behaviors offline: genus validation,
subtree/name lookup, the reference→…→contig quality walk, N50/ANI
filtering, zip downloads, allele FASTA fan-out, the designation POST,
and the transport retry layer.
"""

import zipfile
from pathlib import Path

import pytest

from tests.mock_services import (
    GENUS_TAX_ID,
    MLST_LOCI,
    MLST_ORGANISM,
    MLST_SCHEME,
    MLST_ST_FIELDS,
    MockServices,
    SPECIES_TAX_IDS,
    genome_for,
)
from xspect2_tpu.handlers.ncbi import (
    AssemblyLevel,
    AssemblySource,
    NCBIHandler,
)
from xspect2_tpu.handlers.pubmlst import PubMLSTHandler


@pytest.fixture(scope="module")
def services():
    with MockServices() as svc:
        yield svc


@pytest.fixture()
def ncbi(services):
    handler = NCBIHandler(base_url=services.url)
    handler.http.min_interval = 0  # tests should not sleep
    return handler


@pytest.fixture()
def pubmlst(services):
    return PubMLSTHandler(base_url=f"{services.url}/db")


# ---------------------------------------------------------------- NCBI


def test_genus_taxon_id(ncbi):
    assert ncbi.get_genus_taxon_id("Testus") == GENUS_TAX_ID


def test_genus_taxon_id_rejects_non_genus(ncbi):
    with pytest.raises(ValueError, match="not a genus"):
        ncbi.get_genus_taxon_id("Notagenus")


def test_genus_taxon_id_rejects_non_bacteria(ncbi):
    with pytest.raises(ValueError, match="bacteria"):
        ncbi.get_genus_taxon_id("Eukaryus")


def test_genus_taxon_id_rejects_unknown(ncbi):
    with pytest.raises(ValueError, match="Invalid genus name"):
        ncbi.get_genus_taxon_id("Nosuchthing")


def test_species_subtree(ncbi):
    assert ncbi.get_species(GENUS_TAX_ID) == SPECIES_TAX_IDS


def test_taxon_names(ncbi):
    names = ncbi.get_taxon_names([101, 103])
    assert names == {101: "Testus primus", 103: "Candidatus Testus tertius"}
    with pytest.raises(ValueError, match="missing"):
        ncbi.get_taxon_names([101, 77777])
    with pytest.raises(ValueError, match="between 1 and 1000"):
        ncbi.get_taxon_names([])


def test_accessions_filters_n50_and_ani(ncbi):
    accs = ncbi.get_accessions(
        101,
        AssemblyLevel.COMPLETE_GENOME,
        AssemblySource.REFSEQ,
        count=10,
        min_n50=10000,
        exclude_atypical=True,
        allow_inconclusive=False,
    )
    assert "GCF_101.low" not in accs  # N50 100 < 10000
    assert "GCF_101.ani" not in accs  # taxonomy check not OK
    assert "GCF_101.2" in accs
    # allow_inconclusive re-admits the ANI-flagged report
    accs2 = ncbi.get_accessions(
        101,
        AssemblyLevel.COMPLETE_GENOME,
        AssemblySource.REFSEQ,
        count=10,
        min_n50=10000,
        exclude_atypical=True,
        allow_inconclusive=True,
    )
    assert "GCF_101.ani" in accs2


def test_quality_walk_collects_best_first(ncbi):
    accs = ncbi.get_highest_quality_accessions(
        101, AssemblySource.REFSEQ, 8, 10000, True, False
    )
    # reference-level accession ranks first, then complete-genome ones
    assert accs[0] == "GCF_101.1"
    assert len(accs) == 8
    assert len(set(accs)) == 8


def test_quality_walk_descends_to_contig(ncbi):
    accs = ncbi.get_highest_quality_accessions(
        102, AssemblySource.REFSEQ, 8, 10000, True, False
    )
    assert accs == [f"GCF_102.{i}" for i in range(1, 9)]


def test_download_assemblies_zip_layout(ncbi, tmp_path):
    ncbi.download_assemblies(["GCF_101.1", "GCF_101.2"], tmp_path)
    zip_path = tmp_path / "ncbi_dataset.zip"
    assert zip_path.exists()
    with zipfile.ZipFile(zip_path) as zf:
        names = zf.namelist()
        assert "ncbi_dataset/data/dataset_catalog.json" in names
        assert any(n.endswith("GCF_101.1_genomic.fna") for n in names)


def test_download_reference_genome(ncbi, tmp_path):
    fna = ncbi.download_reference_genome(101, tmp_path)
    assert fna == tmp_path / "101.fna"
    body = fna.read_text()
    assert genome_for("GCF_101.1") in body
    # zip cleaned up
    assert not (tmp_path / "ncbi_dataset.zip").exists()


def test_download_reference_genome_missing(ncbi, tmp_path):
    assert ncbi.download_reference_genome(103, tmp_path) is None


def test_retry_absorbs_transient_500(tmp_path):
    with MockServices(flaky=True) as svc:
        handler = NCBIHandler(base_url=svc.url)
        handler.http.min_interval = 0
        handler.http.backoff = 0.01
        # every distinct path 500s once; the transport must retry through
        assert handler.get_genus_taxon_id("Testus") == GENUS_TAX_ID
        assert handler.get_species(GENUS_TAX_ID) == SPECIES_TAX_IDS


def test_retry_gives_up_after_budget():
    import requests

    with MockServices(flaky=True) as svc:
        handler = NCBIHandler(base_url=svc.url)
        handler.http.min_interval = 0
        handler.http.backoff = 0.01
        handler.http.retries = 0  # no budget: the first 500 must surface
        with pytest.raises(requests.HTTPError):
            handler.get_genus_taxon_id("Testus")


# ---------------------------------------------------------------- PubMLST


def test_pubmlst_organisms(pubmlst):
    assert pubmlst.get_available_organisms() == [MLST_ORGANISM]


def test_pubmlst_schemes(pubmlst):
    assert MLST_SCHEME in pubmlst.get_available_schemes(MLST_ORGANISM)


def test_pubmlst_scheme_url(pubmlst):
    url = pubmlst.get_scheme_url(MLST_ORGANISM, MLST_SCHEME)
    assert url.endswith("/schemes/1")
    with pytest.raises(ValueError, match="not found"):
        pubmlst.get_scheme_url(MLST_ORGANISM, "nope")


def test_pubmlst_allele_download_and_resume(pubmlst, tmp_path):
    pubmlst.download_alleles(MLST_ORGANISM, MLST_SCHEME, tmp_path)
    for locus in MLST_LOCI:
        files = sorted((tmp_path / locus).glob("Allele_ID_*.fasta"))
        assert [f.name for f in files] == [
            f"Allele_ID_{i}.fasta" for i in range(1, 5)
        ]
    # resume: overwrite one file with a marker, re-download, marker kept
    marker = tmp_path / MLST_LOCI[0] / "Allele_ID_1.fasta"
    marker.write_text(">marker\nACGT\n")
    pubmlst.download_alleles(MLST_ORGANISM, MLST_SCHEME, tmp_path)
    assert marker.read_text() == ">marker\nACGT\n"


def test_pubmlst_designation_post(pubmlst):
    url = pubmlst.get_scheme_url(MLST_ORGANISM, MLST_SCHEME)
    fields = pubmlst.get_strain_type_name(
        {locus: 1 for locus in MLST_LOCI}, url
    )
    assert fields == MLST_ST_FIELDS
    novel = pubmlst.get_strain_type_name(
        {locus: 2 for locus in MLST_LOCI}, url
    )
    assert "novel" in novel.lower()


def test_dns_failure_fails_fast():
    """Unresolvable hosts raise immediately (no retry backoff): callers
    with offline fallbacks (MLST strain-type lookup) must not stall."""
    import time

    import requests

    from xspect2_tpu.handlers.http import HttpClient

    client = HttpClient("https://nonexistent.invalid", retries=3, backoff=2.0)
    t0 = time.time()
    with pytest.raises(requests.ConnectionError):
        client.get_json("/x")
    assert time.time() - t0 < 2.0  # no 2+4+8s backoff sleeps


def test_rate_limit_thread_safe(monkeypatch):
    """Concurrent threads sharing one client never violate min_interval.

    The web layer's background jobs can share an NCBIHandler via cached
    models; slot reservation must be atomic under that concurrency."""
    import threading
    import time

    from xspect2_tpu.handlers import http as http_mod
    from xspect2_tpu.handlers.http import HttpClient

    send_times = []
    times_lock = threading.Lock()

    class _Resp:
        status_code = 200

    def fake_request(method, url, **kwargs):
        with times_lock:
            send_times.append(time.monotonic())
        return _Resp()

    monkeypatch.setattr(http_mod.requests, "request", fake_request)
    interval = 0.02
    client = HttpClient("http://example.invalid", min_interval=interval)

    def worker():
        for _ in range(5):
            client.request("GET", "/x")

    t_start = time.monotonic()
    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert len(send_times) == 20
    # every send happens at or after its reserved slot, and slots are
    # spaced exactly `interval` apart, so the i-th earliest send cannot
    # precede t_start + i*interval: sustained throughput never exceeds
    # the rate even when a delayed sender compresses an individual gap
    for i, ts in enumerate(sorted(send_times)):
        assert ts - t_start >= i * interval - 1e-3, (
            f"send {i} at {ts - t_start:.4f}s < {i * interval:.4f}s"
        )
