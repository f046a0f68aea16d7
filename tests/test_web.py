"""Web API integration tests via werkzeug's test client, mirroring the
reference's FastAPI TestClient coverage (reference: tests/test_web.py)."""

import json
import time
from pathlib import Path

import pytest
from werkzeug.test import Client

from xspect2_tpu.io.fasta import SeqRecord, write_fasta


@pytest.fixture()
def client(session_data_root):
    from xspect2_tpu.web import XspectWebApp

    return Client(XspectWebApp())


def test_index_page(client):
    resp = client.get("/")
    assert resp.status_code == 200
    assert b"XspecT2-TPU" in resp.data


def test_index_page_deep_link_routes(client):
    """The served UI carries the reference SPA's deep-linkable routes
    (reference: src/xspect/xspect-web/src/App.tsx:14-27)."""
    html = client.get("/").data.decode()
    # the router and every route pattern must survive UI refactors
    assert "window.addEventListener('hashchange', route)" in html
    for marker in ("#/result/", "#/filter-result/", "#/models/", "'#/' + b.dataset.v"):
        assert marker in html, marker
    # submitted jobs must write the uuid into the URL
    assert "location.hash = '#/result/' + uuid" in html
    assert "location.hash = '#/filter-result/' + uuid" in html


def test_list_models(client, session_data_root):
    resp = client.get("/api/list-models")
    assert resp.status_code == 200
    data = resp.get_json()
    assert "Synthetic" in data["Species"]


def test_model_metadata_roundtrip(client, session_data_root):
    resp = client.get("/api/model-metadata?model_slug=synthetic-species")
    assert resp.status_code == 200
    assert resp.get_json()["model_class"] == "ProbabilisticFilterSVMModel"

    resp = client.post(
        "/api/model-metadata?model_slug=synthetic-species&author=bob&author_email=b@c.d"
    )
    assert resp.status_code == 200
    assert (
        client.get("/api/model-metadata?model_slug=synthetic-species").get_json()[
            "author"
        ]
        == "bob"
    )

    resp = client.get("/api/model-metadata?model_slug=nonexistent")
    assert resp.status_code == 404


def test_upload_classify_poll(client, session_data_root, tmp_path):
    root, genomes = session_data_root
    sample = tmp_path / "websample.fasta"
    write_fasta([SeqRecord(genomes["470"], id="c1")], sample)

    with open(sample, "rb") as f:
        resp = client.post("/api/upload-file", data={"file": (f, "websample.fasta")})
    assert resp.status_code == 200
    assert resp.get_json()["filename"] == "websample.fasta"

    resp = client.post(
        "/api/classify?classification_type=Species&model=Synthetic&file=websample.fasta"
    )
    assert resp.status_code == 200
    uuid = resp.get_json()["uuid"]

    # poll the background task result (up to 60 s, like the reference test)
    deadline = time.time() + 60
    data = None
    while time.time() < deadline:
        resp = client.get(f"/api/classification-result?uuid={uuid}")
        if resp.status_code == 200:
            data = resp.get_json()
            break
        time.sleep(0.5)
    assert data is not None, "classification did not finish in time"
    assert data["prediction"] == "470"


def test_filter_flow_and_download(client, session_data_root, tmp_path):
    root, genomes = session_data_root
    mixed = tmp_path / "webmixed.fasta"
    records = [
        SeqRecord(genomes["470"][i * 700 : i * 700 + 400], id=f"a{i}")
        for i in range(5)
    ]
    import numpy as np

    rng = np.random.default_rng(9)
    records += [
        SeqRecord("".join(rng.choice(list("ACGT"), size=400)), id=f"junk{i}")
        for i in range(5)
    ]
    write_fasta(records, mixed)

    with open(mixed, "rb") as f:
        client.post("/api/upload-file", data={"file": (f, "webmixed.fasta")})

    resp = client.post(
        "/api/filter?filter_type=Genus&genus=Synthetic&input_file=webmixed.fasta&threshold=0.7"
    )
    assert resp.status_code == 200
    uuid = resp.get_json()["uuid"]

    deadline = time.time() + 60
    done = False
    while time.time() < deadline:
        resp = client.get(f"/api/filtering-result?uuid={uuid}")
        if resp.status_code == 200 and "successfully" in resp.get_json().get(
            "message", ""
        ):
            done = True
            break
        time.sleep(0.5)
    assert done, "filtering did not finish in time"

    resp = client.get(f"/api/download-filtered?uuid={uuid}")
    assert resp.status_code == 200
    assert resp.headers["Content-Disposition"].endswith(f'filtered_{uuid}.fasta"')
    body = resp.data.decode()
    assert ">a0" in body and "junk" not in body


def test_missing_upload_404(client, session_data_root):
    resp = client.post(
        "/api/classify?classification_type=Species&model=Synthetic&file=nope.fasta"
    )
    assert resp.status_code == 404


def test_unknown_classification_type(client, session_data_root, tmp_path):
    root, genomes = session_data_root
    sample = tmp_path / "u.fasta"
    write_fasta([SeqRecord(genomes["470"][:2000], id="c")], sample)
    with open(sample, "rb") as f:
        client.post("/api/upload-file", data={"file": (f, "u.fasta")})
    resp = client.post(
        "/api/classify?classification_type=Wat&model=Synthetic&file=u.fasta"
    )
    assert resp.status_code == 501
