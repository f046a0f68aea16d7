"""Local mock NCBI Datasets v2 + PubMLST REST servers for handler tests.

The reference test suite hits the live services (its tests/test_ncbi.py
and tests/test_pub_mlst_handler.py require network + an API key); this
framework's handler tests run against these canned servers instead so
the whole network layer — rate limiting, quality-level walk, N50/ANI
filters, batch downloads, allele fan-out, designation POST, and the
retry transport — is CI-testable offline.

Behaviors encoded (mirroring the live services' shapes):

- taxonomy: genus validation payloads (GENUS + bacteria lineage; plus a
  species-rank and a non-bacterial genus for the error paths), subtree
  children, bulk name lookup (includes a Candidatus and an " sp." name
  so train_from_ncbi's filtering is exercised).
- dataset reports per (taxon, assembly level) with deliberate traps: a
  low-N50 report and a failed-ANI report that the predicate must drop,
  and a taxon that only has contig-level assemblies so the quality walk
  must descend all levels.
- genome downloads: a zip in the real ncbi_dataset layout
  (data/dataset_catalog.json + per-accession .fna) with deterministic
  synthetic genomes (seeded per accession) so trained models are
  reproducible across test runs.
- PubMLST: organism/scheme listing, scheme detail with locus URLs,
  per-locus alleles_fasta (alleles drawn from the same deterministic
  pool), designation POST returning ST fields on exact match.
- flakiness: when ``flaky=True`` every distinct path fails with a 500
  on its first hit and succeeds afterwards — the HttpClient retry layer
  must absorb this transparently.
"""

import io
import json
import re
import threading
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

GENUS_NAME = "Testus"
GENUS_TAX_ID = 9999
SPECIES_TAX_IDS = [101, 102, 103, 104]
SPECIES_NAMES = {
    101: "Testus primus",
    102: "Testus secundus",
    103: "Candidatus Testus tertius",  # filtered out by default
    104: "Testus sp. XYZ",  # filtered out by default
}
GENOME_LEN = 3000

MLST_ORGANISM = "testorg"
MLST_SCHEME = "MLST (Oxford)"
MLST_LOCI = ["Oxf_locA", "Oxf_locB", "Oxf_locC"]
MLST_ALLELES_PER_LOCUS = 4
MLST_ALLELE_LEN = 300
MLST_ST_FIELDS = {"ST": "1", "clonal_complex": "CC1"}


def _stable_seed(text: str) -> int:
    """Process-independent seed (Python's str hash is salted per run)."""
    import zlib

    return zlib.crc32(text.encode())


def genome_for(accession: str) -> str:
    """Deterministic synthetic genome for an accession."""
    rng = np.random.default_rng(_stable_seed(accession))
    return "".join("ACGT"[b] for b in rng.integers(0, 4, size=GENOME_LEN))


def allele_seq(locus: str, allele_id: int) -> str:
    rng = np.random.default_rng(_stable_seed(f"{locus}/{allele_id}"))
    return "".join("ACGT"[b] for b in rng.integers(0, 4, size=MLST_ALLELE_LEN))


def accessions_for(tax_id: int, level: str) -> list[dict]:
    """Canned dataset reports for one (taxon, assembly level)."""
    def report(acc, n50=50000, ani="OK"):
        return {
            "accession": acc,
            "assembly_stats": {"contig_n50": n50},
            "average_nucleotide_identity": {"taxonomy_check_status": ani},
        }

    if tax_id == 101:
        if level == "reference":
            return [report("GCF_101.1")]
        if level == "complete_genome":
            return [
                report("GCF_101.2"),
                report("GCF_101.low", n50=100),  # dropped: N50 below cutoff
                report("GCF_101.ani", ani="Inconclusive"),  # dropped: ANI
                report("GCF_101.3"),
                report("GCF_101.4"),
                report("GCF_101.5"),
                report("GCF_101.6"),
                report("GCF_101.7"),
                report("GCF_101.8"),
            ]
        return []
    if tax_id == 102:
        # only contig-level assemblies: the walk must descend all levels
        if level == "contig":
            return [report(f"GCF_102.{i}") for i in range(1, 9)]
        return []
    return []


class _Handler(BaseHTTPRequestHandler):
    server_version = "MockNCBIPubMLST/1.0"

    def log_message(self, *args):  # quiet
        pass

    # ------------------------------------------------------------ plumbing

    def _reply(self, body: bytes, status=200, ctype="application/json"):
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _json(self, payload, status=200):
        self._reply(json.dumps(payload).encode(), status=status)

    def _maybe_flake(self, path: str) -> bool:
        srv = self.server
        if not srv.flaky:
            return False
        with srv.lock:
            if path in srv.seen_paths:
                return False
            srv.seen_paths.add(path)
        self._json({"error": "transient"}, status=500)
        return True

    # ------------------------------------------------------------ routes

    def do_GET(self):
        url = urlparse(self.path)
        path, query = url.path, parse_qs(url.query)
        self.server.requests.append(("GET", self.path))
        if self._maybe_flake(url.path):
            return

        # ---- NCBI taxonomy
        m = re.fullmatch(r"/taxonomy/taxon/([^/]+)/filtered_subtree", path)
        if m:
            gid = m.group(1)
            return self._json(
                {"edges": {gid: {"visible_children": SPECIES_TAX_IDS}}}
            )
        m = re.fullmatch(r"/taxonomy/taxon/([^/]+)", path)
        if m:
            key = m.group(1)
            if key == GENUS_NAME:
                node = {
                    "tax_id": GENUS_TAX_ID,
                    "rank": "GENUS",
                    "lineage": [1, 131567, 2, GENUS_TAX_ID],
                }
                return self._json({"taxonomy_nodes": [{"taxonomy": node}]})
            if key == "Notagenus":
                node = {"tax_id": 1234, "rank": "SPECIES", "lineage": [1, 131567, 2]}
                return self._json({"taxonomy_nodes": [{"taxonomy": node}]})
            if key == "Eukaryus":
                node = {
                    "tax_id": 555,
                    "rank": "GENUS",
                    "lineage": [1, 131567, 2759, 555],
                }
                return self._json({"taxonomy_nodes": [{"taxonomy": node}]})
            if re.fullmatch(r"[\d,]+", key):
                ids = [int(t) for t in key.split(",")]
                nodes = [
                    {
                        "taxonomy": {
                            "tax_id": t,
                            "organism_name": SPECIES_NAMES.get(t, f"Testus {t}"),
                        }
                    }
                    for t in ids
                    if t in SPECIES_NAMES
                ]
                return self._json({"taxonomy_nodes": nodes})
            return self._json({"taxonomy_nodes": []})

        # ---- NCBI dataset reports
        m = re.fullmatch(r"/genome/taxon/(\d+)/dataset_report", path)
        if m:
            tax_id = int(m.group(1))
            if query.get("filters.reference_only") == ["true"]:
                level = "reference"
            else:
                level = query.get("filters.assembly_level", ["?"])[0]
            return self._json({"reports": accessions_for(tax_id, level)})

        # ---- NCBI genome download (zip in the real ncbi_dataset layout)
        m = re.fullmatch(r"/genome/accession/([^/]+)/download", path)
        if m:
            accs = m.group(1).split(",")
            buf = io.BytesIO()
            with zipfile.ZipFile(buf, "w") as zf:
                catalog = {
                    "assemblies": [{"files": [{"filePath": "report.jsonl"}]}]
                    + [
                        {
                            "accession": acc,
                            "files": [
                                {"filePath": f"{acc}/{acc}_genomic.fna"}
                            ],
                        }
                        for acc in accs
                    ]
                }
                zf.writestr(
                    "ncbi_dataset/data/dataset_catalog.json", json.dumps(catalog)
                )
                zf.writestr("ncbi_dataset/data/report.jsonl", "{}\n")
                for acc in accs:
                    zf.writestr(
                        f"ncbi_dataset/data/{acc}/{acc}_genomic.fna",
                        f">{acc} mock assembly\n{genome_for(acc)}\n",
                    )
            return self._reply(buf.getvalue(), ctype="application/zip")

        # ---- PubMLST
        base = f"http://127.0.0.1:{self.server.server_port}/db"
        if path == "/db":
            return self._json(
                [
                    {
                        "databases": [
                            {"name": f"pubmlst_{MLST_ORGANISM}_seqdef"},
                            {"name": f"pubmlst_{MLST_ORGANISM}_isolates"},
                        ]
                    }
                ]
            )
        if path == f"/db/pubmlst_{MLST_ORGANISM}_seqdef/schemes":
            return self._json(
                {
                    "schemes": [
                        {
                            "description": MLST_SCHEME,
                            "scheme": f"{base}/pubmlst_{MLST_ORGANISM}_seqdef/schemes/1",
                        },
                        {
                            "description": "cgMLST",
                            "scheme": f"{base}/pubmlst_{MLST_ORGANISM}_seqdef/schemes/2",
                        },
                    ]
                }
            )
        if path == f"/db/pubmlst_{MLST_ORGANISM}_seqdef/schemes/1":
            return self._json(
                {
                    "loci": [
                        f"{base}/pubmlst_{MLST_ORGANISM}_seqdef/loci/{locus}"
                        for locus in MLST_LOCI
                    ]
                }
            )
        m = re.fullmatch(
            rf"/db/pubmlst_{MLST_ORGANISM}_seqdef/loci/([^/]+)/alleles_fasta", path
        )
        if m:
            locus = m.group(1)
            fasta = "".join(
                f">{locus}_{i}\n{allele_seq(locus, i)}\n"
                for i in range(1, MLST_ALLELES_PER_LOCUS + 1)
            )
            return self._reply(fasta.encode(), ctype="text/plain")

        self._json({"error": f"no route {path}"}, status=404)

    def do_POST(self):
        url = urlparse(self.path)
        self.server.requests.append(("POST", self.path))
        if self._maybe_flake("POST:" + url.path):
            return
        length = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(length) or b"{}")
        if url.path == f"/db/pubmlst_{MLST_ORGANISM}_seqdef/schemes/1/designations":
            designations = payload.get("designations", {})
            # ST 1 = allele 1 at every locus
            if all(
                designations.get(locus, [{}])[0].get("allele") == "1"
                for locus in MLST_LOCI
            ) and len(designations) == len(MLST_LOCI):
                return self._json({"fields": MLST_ST_FIELDS})
            return self._json({})
        self._json({"error": f"no route {url.path}"}, status=404)


class MockServices:
    """Context manager running the combined mock server on a free port."""

    def __init__(self, flaky: bool = False):
        self.flaky = flaky
        self.server: ThreadingHTTPServer | None = None
        self.thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.server.server_port}"

    def __enter__(self) -> "MockServices":
        self.server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self.server.flaky = self.flaky
        self.server.seen_paths = set()
        self.server.lock = threading.Lock()
        self.server.requests = []
        self.thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )
        self.thread.start()
        return self

    def __exit__(self, *exc):
        self.server.shutdown()
        self.server.server_close()
        self.thread.join(timeout=5)
        return False
