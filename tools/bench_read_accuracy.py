#!/usr/bin/env python
"""Read-level accuracy under sequencing noise (reference benchmark shape).

The reference publishes read-level accuracy / selective accuracy /
coverage / rejection recall on error-bearing simulated NovaSeq reads
(reference: docs/benchmark.md:58-69 — 121.8 M reads over its 40-species
panel: accuracy 72.55%, selective accuracy 82.80%, coverage 87.63%,
rejection recall 45.09%).  This tool reproduces that statistical
contract in-environment:

- **Panel**: 8 synthetic RELATED species derived from one 4 Mb ancestor
  at per-class divergences 0.2%-10% (independent random genomes share
  no k-mers and would trivialize the task; real congeneric species are
  confusable precisely because some pairs sit within ~1% ANI — the two
  0.2% classes here are the E. coli/Shigella-style hard pair).
- **Reads**: 1 M 150 bp reads, both strands, ~0.2% carrying an N, then
  a seeded NovaSeq-like error model (0.1% substitutions + 0.01%/base
  indels, `misclassification_detection/simulate_reads.py::mutate_read_codes`),
  plus a 250 k-read high-noise variant at 1% substitutions.
- **Pipeline**: the production device engine (`DeviceQueryEngine`),
  per-read unique-argmax with hit-count ties rejected as 'ambiguous' —
  the reference benchmark's own rule (reference:
  scripts/benchmark/main.nf:416-430) — and metrics via
  `pipelines/benchmark.py::evaluate_read_labels`.

Prints ONE JSON line like bench.py.  Genomes and the index are cached
under .bench_cache (deterministic seeds).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import bench
from bench import CACHE_DIR, K, READ_LEN, log

# per-class divergence from the shared ancestor; classes 0/1 form the
# hard near-identical pair (sibling distance ~0.4%)
DIVERGENCES = (0.002, 0.002, 0.005, 0.01, 0.02, 0.05, 0.005, 0.1)
GENOME_LEN = 4_000_000
SEED = 23

REFERENCE_PUBLISHED = {
    # reference docs/benchmark.md:67-69 (121.8M simulated NovaSeq reads,
    # ~40-species Acinetobacter panel)
    "accuracy": 0.7255,
    "macro_f1": 0.21,
    "weighted_f1": 0.81,
    "selective_accuracy": 0.828,
    "coverage": 0.8763,
    "rejection_recall": 0.4509,
}


def build_related_panel():
    """Ancestor-derived genomes + blocked index, disk-cached."""
    from xspect2_tpu import native
    from xspect2_tpu.core import dna
    from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex

    gpath = CACHE_DIR / f"genomes_rel{len(DIVERGENCES)}_m4.0_s{SEED}.npy"
    rng = np.random.default_rng(SEED)
    if gpath.exists():
        genomes = np.load(gpath)
    else:
        ancestor = rng.integers(0, 4, size=GENOME_LEN, dtype=np.uint8)
        genomes = np.empty((len(DIVERGENCES), GENOME_LEN), dtype=np.uint8)
        for ci, d in enumerate(DIVERGENCES):
            g = ancestor.copy()
            mut = rng.random(GENOME_LEN) < d
            g[mut] = (g[mut] + rng.integers(1, 4, size=int(mut.sum()))) % 4
            genomes[ci] = g
        CACHE_DIR.mkdir(exist_ok=True)
        np.save(gpath, genomes)

    idx_dir = CACHE_DIR / f"index_rel{len(DIVERGENCES)}_m4.0_s{SEED}"
    if idx_dir.exists():
        log(f"loading cached related-panel index {idx_dir}")
        return BlockedBitSlicedIndex.load(idx_dir), genomes

    log(f"building related-panel index ({len(DIVERGENCES)} classes)...")
    index = BlockedBitSlicedIndex.create(
        K,
        [f"{1000 + i}" for i in range(len(DIVERGENCES))],
        GENOME_LEN - K + 1,
        fpr=0.01,
    )
    t0 = time.time()
    for ci in range(len(DIVERGENCES)):
        if native.available():
            native.insert_kmers(index, ci, genomes[ci])
        else:
            hi, lo, valid = dna.canonical_kmers(genomes[ci], K)
            index.insert_kmers(ci, hi, lo, valid)
    index.save(idx_dir)
    log(f"index built in {time.time() - t0:.0f}s")
    return index, genomes


def classify_noisy(engine, class_names, reads, batch=131072):
    """(y_pred labels with 'ambiguous' ties, elapsed_s) for [N, L] codes."""
    names = np.asarray(class_names)
    preds = []
    t0 = time.time()
    for start in range(0, len(reads), batch):
        chunk = reads[start : start + batch]
        hits_dev = engine.count_hits_reads(
            chunk, reads_per_chunk=8192, block=False
        )
        hits = np.asarray(hits_dev)[: len(chunk)]
        max_hits = hits.max(axis=1)
        tie = (hits == max_hits[:, None]).sum(axis=1) > 1
        lab = names[hits.argmax(axis=1)]
        lab = np.where(tie, "ambiguous", lab)
        preds.append(lab)
    dt = time.time() - t0
    return np.concatenate(preds), dt


def main():
    from xspect2_tpu.misclassification_detection.simulate_reads import (
        mutate_read_codes,
    )
    from xspect2_tpu.ops.query import DeviceQueryEngine
    from xspect2_tpu.pipelines.benchmark import evaluate_read_labels

    bench._wait_for_device()
    index, genomes = build_related_panel()
    engine = DeviceQueryEngine(index)
    names = np.asarray(index.class_names)

    # ---- main eval: 1M reads, NovaSeq-like 0.1% noise ---------------
    n_reads = 1_000_000
    clean, true_cls = bench.simulate_reads(genomes, n_reads, seed=11)
    noisy = mutate_read_codes(clean, sub_rate=0.001, indel_rate=1e-4, seed=12)
    y_true = names[true_cls]

    y_pred, dt = classify_noisy(engine, index.class_names, noisy)
    stats = evaluate_read_labels(y_true, y_pred)
    stats = {k: round(v, 4) for k, v in stats.items()}
    log(f"1M noisy reads in {dt:.1f}s ({n_reads / dt:,.0f} reads/s e2e)")
    log(f"stats: {json.dumps(stats)}")

    # ---- high-noise variant: 1% substitutions, 250k reads -----------
    n_hi = 250_000
    noisy_hi = mutate_read_codes(
        clean[:n_hi], sub_rate=0.01, indel_rate=1e-4, seed=13
    )
    y_pred_hi, _ = classify_noisy(engine, index.class_names, noisy_hi)
    stats_hi = evaluate_read_labels(y_true[:n_hi], y_pred_hi)
    stats_hi = {k: round(v, 4) for k, v in stats_hi.items()}
    log(f"1%-noise stats: {json.dumps(stats_hi)}")

    print(
        json.dumps(
            {
                "metric": (
                    "read-level accuracy under NovaSeq-like noise "
                    "(8-class related panel, 0.2%-10% divergence)"
                ),
                "value": stats["accuracy"],
                "unit": "accuracy",
                # reference numbers are a DIFFERENT (real, 40-species)
                # panel: reported side-by-side, not as a ratio
                "vs_baseline": None,
                "extra": {
                    "num_reads": n_reads,
                    "error_model": "sub 0.1% + indel 0.01%/base (seeded)",
                    "panel_divergences": list(DIVERGENCES),
                    "stats": stats,
                    "stats_sub1pct": {"num_reads": n_hi, **stats_hi},
                    "classify_reads_per_s": round(n_reads / dt),
                    "reference_published": REFERENCE_PUBLISHED,
                    "caveat": (
                        "synthetic ancestor-derived panel, not the "
                        "reference's real Acinetobacter panel; the "
                        "comparable contract is the metric set + "
                        "tie-abstention rule, not the absolute values"
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
