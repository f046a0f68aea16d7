#!/usr/bin/env python
"""MLST typing throughput (BASELINE.json config 3).

Builds a synthetic 7-locus Oxford-style scheme (per-locus compact
index: documents = alleles, k=31, fpr=0.001, 1 hash — reference
parameters, reference: src/xspect/train.py:345-363), then times
end-to-end `predict` on assembled-genome-sized inputs, which exercises
the >=10 kb chunk splitting and the batched per-locus device query.

Prints ONE JSON line like bench.py.
Usage: python tools/bench_mlst.py [--loci 7] [--alleles 50] [--genomes 20]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loci", type=int, default=7)
    # real PubMLST Oxford loci carry ~1000-2000 alleles; 50 is a toy
    # scale where the device path is pure tunnel latency
    ap.add_argument("--alleles", type=int, default=1000)
    ap.add_argument("--allele-len", type=int, default=450)
    ap.add_argument("--genomes", type=int, default=20)
    ap.add_argument("--genome-len", type=int, default=100_000)
    args = ap.parse_args()

    import os
    import tempfile

    tmp = tempfile.mkdtemp(prefix="xs_mlst_bench_")
    os.environ.setdefault("XSPECT_DATA_ROOT", tmp)

    from xspect2_tpu.io.fasta import SeqRecord, write_fasta
    from xspect2_tpu.models.mlst_model import ProbabilisticFilterMlstSchemeModel

    rng = np.random.default_rng(0)
    bases = np.array(list("ACGT"))

    def rand_seq(n):
        return "".join(rng.choice(bases, size=n))

    # scheme: per-locus allele FASTAs (Allele_ID_<n>.fasta layout)
    scheme = Path(tmp) / "scheme"
    loci = [f"Oxf_gene{i}" for i in range(args.loci)]
    alleles = {}
    for locus in loci:
        ldir = scheme / locus
        ldir.mkdir(parents=True)
        alleles[locus] = []
        for a in range(1, args.alleles + 1):
            seq = rand_seq(args.allele_len)
            alleles[locus].append(seq)
            write_fasta(
                [SeqRecord(seq, f"{locus}_{a}")],
                ldir / f"Allele_ID_{a}.fasta",
            )

    model = ProbabilisticFilterMlstSchemeModel(
        31,
        "oxford-bench",
        Path(tmp) / "mlst",
        "https://example.org/schemes/1",
        "synthetic",
    )
    (Path(tmp) / "mlst").mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    model.fit(scheme)
    fit_s = time.time() - t0
    print(f"fit ({args.loci} loci x {args.alleles} alleles): {fit_s:.1f}s", file=sys.stderr)

    # assembled genomes embedding one known allele per locus
    genomes = []
    truth = []
    for g in range(args.genomes):
        picks = {
            locus: int(rng.integers(0, args.alleles)) for locus in loci
        }
        seq = rand_seq(args.genome_len)
        pos = 1000
        for locus in loci:
            a = picks[locus]
            seq = seq[:pos] + alleles[locus][a] + seq[pos + args.allele_len :]
            pos += 10_000
        genomes.append(SeqRecord(seq, f"g{g}"))
        truth.append(picks)

    # the multi-genome file path (`classify mlst`): batch_genomes
    # genomes' chunks fused into ONE device program per locus group
    # with on-device per-genome segment reduction — sweep the batch
    # size (the per-genome cost at batch 1 is the ~25 ms dispatch
    # floor; larger groups amortize it).  Each size is warmed on its
    # own group shape first so the timed pass carries no compiles.
    sweep = {}
    res = None
    for bg in (1, 4, 8):
        warm_n = min(len(genomes), max(bg, 1))
        _ = model.predict(iter(genomes[:warm_n]), batch_genomes=bg)
        t0 = time.time()
        r_bg = model.predict(iter(genomes), batch_genomes=bg)
        sweep[bg] = args.genomes / (time.time() - t0)
        print(
            f"batch_genomes={bg}: {sweep[bg]:.2f} genomes/s", file=sys.stderr
        )
        if res is None or sweep[bg] == max(sweep.values()):
            res = r_bg
    best_bg = max(sweep, key=sweep.get)
    gps = sweep[best_bg]
    dt = args.genomes / gps

    correct = total = 0
    for g, rec in enumerate(genomes):
        for locus in loci:
            total += 1
            allres = res.hits[rec.id][1]["All results"]
            r = allres.get(locus, {}) if isinstance(allres, dict) else {}
            if r:
                best = next(iter(r))  # sorted: count desc, then name
                if best == f"Allele_ID_{truth[g][locus] + 1}":
                    correct += 1
    bps = args.genomes * args.genome_len / dt

    # CPU baseline: the identical per-locus chunk queries through the
    # single-core native C++ path — the in-environment stand-in for the
    # reference's per-locus COBS compact-index search (reference:
    # src/xspect/models/probabilistic_filter_mlst_model.py:362-380).
    from xspect2_tpu import native
    from xspect2_tpu.core import dna
    from xspect2_tpu.models.mlst_model import SPLIT_MIN_LENGTH

    n_base = min(args.genomes, 5)
    t0 = time.time()
    for rec in genomes[:n_base]:
        for li, idx in enumerate(model.indices):
            pieces = (
                model.sequence_splitter(rec.seq, model.avg_locus_bp_size[li])
                if len(rec.seq) >= SPLIT_MIN_LENGTH
                else [rec.seq]
            )
            for p in pieces:
                codes = dna.encode(p)
                if native.available():
                    native.count_hits(idx, codes)
                else:
                    hi, lo, valid = dna.canonical_kmers(codes, model.k)
                    idx.count_hits_host(hi, lo, valid)
    cpu_dt = time.time() - t0
    cpu_gps = n_base / cpu_dt
    print(
        f"cpu baseline ({'native C++' if native.available() else 'numpy'}, "
        f"{n_base} genomes): {cpu_gps:.2f} genomes/s",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "MLST typings/sec (synthetic 7-locus scheme, 100kb genomes)",
                "value": round(gps, 2),
                "unit": "genomes/s",
                "vs_baseline": round(gps / cpu_gps, 1),
                "extra": {
                    "bases_per_s": round(bps),
                    "locus_allele_accuracy": round(correct / total, 4),
                    "fit_s": round(fit_s, 1),
                    "cpu_1core_genomes_per_s": round(cpu_gps, 2),
                    "cpu_backend": "native" if native.available() else "numpy",
                    "batch_genomes_best": best_bg,
                    "genomes_per_s_by_batch": {
                        str(bg): round(v, 2) for bg, v in sweep.items()
                    },
                },
            }
        )
    )


if __name__ == "__main__":
    main()
