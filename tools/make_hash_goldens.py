#!/usr/bin/env python
"""Dump/verify hash-parity golden vectors against the reference's libs.

The reference's numeric behavior hangs on three native libraries this
framework reimplements (SURVEY.md §7 "hash parity"): xxhash (xxh3-64 of
canonical k-mer ASCII — the genus Bloom hash), rbloom (bit-index
derivation + filter.bloom format), and COBS (internal k-mer hashing +
classic-index scores).  Run this tool in an environment where those
packages are importable to produce `goldens_hash.json`; run it again
anywhere (e.g. this offline checkout) to verify the framework against
whatever sections the file carries.

Usage:
  python tools/make_hash_goldens.py dump   [--out goldens_hash.json]
  python tools/make_hash_goldens.py verify [--in goldens_hash.json]

Sections (each skipped with a notice when its library is missing):
  xxh3    — xxh3_64_intdigest of deterministic ACGT k-mers, k=21/31
  rbloom  — per-kmer membership + serialized filter bytes for a small
            Bloom(num, fpr, hash_func=xxh3_64_intdigest) filter
            (reference: probabilistic_single_filter_model.py:88-96)
  cobs    — classic-index search scores for synthetic 3-doc FASTAs at
            k=21/fpr=0.01/h=7 (reference: probabilistic_filter_model.py:169-235)
"""

import argparse
import base64
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _kmers(k: int, n: int = 64, seed: int = 5):
    rng = np.random.default_rng(seed + k)
    return ["".join(rng.choice(list("ACGT"), k)) for _ in range(n)]


def dump(out_path: Path) -> None:
    goldens = {}

    try:
        import xxhash

        goldens["xxh3"] = {
            str(k): {km: xxhash.xxh3_64_intdigest(km) for km in _kmers(k)}
            for k in (21, 31)
        }
        print(f"xxh3 section: {sum(len(v) for v in goldens['xxh3'].values())} digests")
    except ImportError:
        print("xxhash not importable -- xxh3 section skipped")

    try:
        import xxhash
        from rbloom import Bloom

        kms = _kmers(21, n=256, seed=11)
        bf = Bloom(len(kms), 0.01, hash_func=xxhash.xxh3_64_intdigest)
        for km in kms[:128]:  # half in, half out
            bf.add(km)
        with tempfile.NamedTemporaryFile(suffix=".bloom") as f:
            bf.save(f.name)
            raw = Path(f.name).read_bytes()
        goldens["rbloom"] = {
            "k": 21,
            "fpr": 0.01,
            "num_items": len(kms),
            "kmers": kms,
            "contains": [km in bf for km in kms],
            "filter_bytes_b64": base64.b64encode(raw).decode(),
        }
        print(f"rbloom section: {len(kms)} membership probes + filter bytes")
    except ImportError:
        print("rbloom not importable -- rbloom section skipped")

    try:
        import cobs_index as cobs

        rng = np.random.default_rng(17)
        with tempfile.TemporaryDirectory() as td:
            docs = {}
            for name in ("docA", "docB", "docC"):
                seq = "".join(rng.choice(list("ACGT"), 5000))
                docs[name] = seq
                Path(td, f"{name}.fasta").write_text(f">{name}\n{seq}\n")
            idx = Path(td) / "idx.cobs_classic"
            params = cobs.ClassicIndexParameters()
            params.term_size = 21
            params.num_hashes = 7
            params.false_positive_rate = 0.01
            params.clobber = True
            doclist = cobs.DocumentList(td)
            cobs.classic_construct_list(doclist, str(idx), params)
            search = cobs.Search(str(idx), True)
            probes = {
                "contained_80bp": docs["docA"][100:180],
                "crossdoc_80bp": docs["docB"][100:180],
                "random_80bp": "".join(rng.choice(list("ACGT"), 80)),
            }
            goldens["cobs"] = {
                "k": 21,
                "fpr": 0.01,
                "num_hashes": 7,
                "docs": docs,
                "search": {
                    label: dict(search.search(seq)) for label, seq in probes.items()
                },
            }
        print("cobs section: 3 synthetic docs, 3 probe searches")
    except ImportError:
        print("cobs_index not importable -- cobs section skipped")

    out_path.write_text(json.dumps(goldens, indent=1))
    print(f"wrote {out_path} ({len(goldens)} sections)")


def verify(in_path: Path) -> int:
    goldens = json.loads(in_path.read_text())
    failures = 0

    if "xxh3" in goldens:
        from xspect2_tpu.core.xxh3 import xxh3_64, xxh3_64_batch

        n = 0
        for k, table in goldens["xxh3"].items():
            for km, want in table.items():
                if xxh3_64(km.encode()) != want:
                    print(f"xxh3 FAIL scalar {km}")
                    failures += 1
                n += 1
            arr = np.frombuffer(
                "".join(table).encode(), dtype=np.uint8
            ).reshape(len(table), int(k))
            got = xxh3_64_batch(arr)
            want = np.array(list(table.values()), dtype=np.uint64)
            if not np.array_equal(got, want):
                print(f"xxh3 FAIL batch k={k}")
                failures += 1
        print(f"xxh3: {n} digests checked, {failures} failures")

    if "rbloom" in goldens:
        # verified once a reader for the rbloom on-disk layout exists;
        # until then the section is carried as the target vector
        print(
            "rbloom section present: "
            f"{len(goldens['rbloom']['kmers'])} membership goldens "
            "(reader not implemented offline -- see PARITY.md)"
        )

    if "cobs" in goldens:
        # framework indices use their own layout; score-level check:
        # rebuild from the SAME docs and compare search hit counts
        from xspect2_tpu.core import dna
        from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex
        from xspect2_tpu.ops.query import DeviceQueryEngine

        g = goldens["cobs"]
        names = sorted(g["docs"])
        max_kmers = max(len(s) for s in g["docs"].values())
        idx = BlockedBitSlicedIndex.create(
            g["k"], names, max_kmers, fpr=g["fpr"]
        )
        for ci, name in enumerate(names):
            codes = dna.encode(g["docs"][name])
            hi, lo, valid = dna.canonical_kmers(codes, g["k"])
            idx.insert_kmers(ci, hi, lo, valid)
        eng = DeviceQueryEngine(idx)
        for label, want in g["search"].items():
            seq = {
                "contained_80bp": g["docs"]["docA"][100:180],
                "crossdoc_80bp": g["docs"]["docB"][100:180],
            }.get(label)
            if seq is None:
                continue
            counts = np.asarray(
                eng.count_hits_records([("probe", dna.encode(seq))])
            )[0]
            got = {name: int(counts[ci]) for ci, name in enumerate(names)}
            for doc, score in want.items():
                base = doc.split(".")[0]
                if got.get(base, 0) != score:
                    print(f"cobs {label}/{base}: got {got.get(base)} want {score}")
                    failures += 1
        print("cobs: score comparison done")

    print("PASS" if failures == 0 else f"FAIL ({failures})")
    return 1 if failures else 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["dump", "verify"])
    ap.add_argument("--out", default="goldens_hash.json")
    ap.add_argument("--in", dest="inp", default="goldens_hash.json")
    args = ap.parse_args()
    if args.mode == "dump":
        dump(Path(args.out))
    else:
        sys.exit(verify(Path(args.inp)))


if __name__ == "__main__":
    main()
