#!/usr/bin/env python
"""Download the reference's four NCBI fixture assemblies.

The parity oracle (tests/test_parity_oracle.py) trains on the same
assemblies the reference's test suite downloads in its conftest
(reference: tests/conftest.py:12-48).  Run this once in a networked
checkout; files land in tests/test_assemblies/ and are cached.

Usage: python tools/fetch_parity_fixtures.py [--dest DIR]
"""

import argparse
import io
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ACCESSIONS = {
    "GCF_000006945.2": "GCF_000006945.2_ASM694v2_genomic.fna",
    "GCF_000018445.1": "GCF_000018445.1_ASM1844v1_genomic.fna",
    "GCF_000069245.1": "GCF_000069245.1_ASM6924v1_genomic.fna",
    "GCA_900444805.1": "GCA_900444805.1_58932_B01_genomic.fna",
}
DOWNLOAD_URL = (
    "https://api.ncbi.nlm.nih.gov/datasets/v2alpha/genome/accession/"
    "{acc}/download?include_annotation_type=GENOME_FASTA"
)


def fetch(dest: Path) -> int:
    import requests

    dest.mkdir(parents=True, exist_ok=True)
    failures = 0
    for acc, filename in ACCESSIONS.items():
        target = dest / filename
        if target.exists():
            print(f"cached   {filename}")
            continue
        print(f"fetching {acc} ...")
        try:
            resp = requests.get(
                DOWNLOAD_URL.format(acc=acc), timeout=120, allow_redirects=True
            )
            resp.raise_for_status()
            with zipfile.ZipFile(io.BytesIO(resp.content)) as zf:
                member = f"ncbi_dataset/data/{acc}/{filename}"
                target.write_bytes(zf.read(member))
            print(f"saved    {filename} ({target.stat().st_size / 1e6:.1f} MB)")
        except Exception as exc:  # keep going: partial fixture sets activate
            print(f"FAILED   {acc}: {exc}")  # the subset of oracle tests
            failures += 1
    return failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", default=str(REPO / "tests" / "test_assemblies"))
    args = ap.parse_args()
    sys.exit(1 if fetch(Path(args.dest)) else 0)


if __name__ == "__main__":
    main()
