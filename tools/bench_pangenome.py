#!/usr/bin/env python
"""BASELINE config 5: pangenome-scale index capacity (block-sharded).

Builds a synthetic multi-genus index deliberately larger than one
device's fast-table share (default 256 classes, ~2.1 GB at h=7 —
the scale of the reference's pangenome-train pipeline, reference:
scripts/pangenome-train/), shards it over the block (hash-space) axis
of an 8-virtual-device CPU mesh, and verifies:

  - exactness: BlockShardedClassifier hit counts == the host reference
    query, on two mesh shapes,
  - accuracy: reads drawn from the real probe genomes argmax to their
    class through the sharded path,
  - host-side sharded throughput (a CPU number — the TPU projection is
    measured separately in bench.py from real-chip shard-window rates).

Index construction: the probe classes (default 16) are inserted from
real synthetic genomes via the native path; the remaining columns are
filled with random bits at the ~50% density a loaded Bloom column has
at its design point, so gather traffic and false-positive statistics
match a fully trained pangenome index without paying 256 full inserts.

Prints ONE JSON line.  Usage: python tools/bench_pangenome.py [--gb 2.1]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# must precede any jax import: virtual 8-device CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np

K = 21
READ_LEN = 150


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_index(num_classes, kmers_per_class, probe_classes, seed=23):
    from xspect2_tpu import native
    from xspect2_tpu.core import dna
    from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex

    rng = np.random.default_rng(seed)
    names = [f"{1000 + i}" for i in range(num_classes)]
    idx = BlockedBitSlicedIndex.create(
        K, names, kmers_per_class, fpr=0.01, num_hashes=7, fields_per_word=1
    )
    log(
        f"index geometry: {num_classes} classes, h={idx.num_hashes}, "
        f"{idx.nbytes / 1e9:.2f} GB, {idx.num_blocks} blocks, "
        f"class_words={idx.class_words}"
    )

    t0 = time.time()
    # non-probe columns: random bits at the ~0.5 density of a loaded
    # Bloom column (the design point of fpr=0.01 at the sized geometry)
    idx.table[:] = rng.integers(
        0, 2**32, size=idx.table.shape, dtype=np.uint32
    )
    # clear the probe classes' bit lanes, then insert their genomes for
    # real (fields_per_word=1: class c lives in word c//32, bit c%32)
    assert probe_classes <= 32
    view = idx.table.reshape(-1, idx.class_words)
    mask = np.uint32(0xFFFFFFFF ^ ((1 << probe_classes) - 1))
    view[:, 0] &= mask
    log(f"random fill + lane clear: {time.time() - t0:.0f}s")

    genome_len = kmers_per_class + K - 1
    genomes = rng.integers(
        0, 4, size=(probe_classes, genome_len), dtype=np.uint8
    )
    t0 = time.time()
    for ci in range(probe_classes):
        if native.available():
            native.insert_kmers(idx, ci, genomes[ci])
        else:
            hi, lo, valid = dna.canonical_kmers(genomes[ci], K)
            idx.insert_kmers(ci, hi, lo, valid)
    log(f"{probe_classes} probe classes inserted: {time.time() - t0:.0f}s")
    return idx, genomes


def simulate_reads(genomes, num_reads, seed=7):
    rng = np.random.default_rng(seed)
    num_classes, genome_len = genomes.shape
    cls = rng.integers(0, num_classes, size=num_reads)
    pos = rng.integers(0, genome_len - READ_LEN, size=num_reads)
    reads = genomes[cls[:, None], pos[:, None] + np.arange(READ_LEN)[None, :]]
    return reads.astype(np.uint8), cls


def host_reference_hits(idx, reads):
    from xspect2_tpu.core import dna

    out = np.zeros((len(reads), idx.num_classes), dtype=np.int64)
    for i, row in enumerate(reads):
        hi, lo, valid = dna.canonical_kmers(row, K)
        out[i] = idx.count_hits_host(hi, lo, valid)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--classes", type=int, default=256)
    ap.add_argument("--gb", type=float, default=2.1, help="approx index size")
    ap.add_argument("--probe-classes", type=int, default=16)
    ap.add_argument("--reads", type=int, default=32768)
    ap.add_argument("--exact-sample", type=int, default=192)
    args = ap.parse_args()

    import jax

    # the environment's TPU plugin force-overrides JAX_PLATFORMS, so the
    # env var alone is not enough (same workaround as bench.py)
    jax.config.update("jax_platforms", "cpu")

    from xspect2_tpu.parallel import BlockShardedClassifier, make_block_mesh

    n_dev = len(jax.devices())
    log(f"devices: {n_dev} x {jax.devices()[0].platform}")

    # rows = bytes / (4 * class_words); kmers ~= rows / (1.3 * bits/kmer)
    class_words = (args.classes + 31) // 32
    target_rows = args.gb * 1e9 / (4 * class_words)
    # COBS sizing at fpr=0.01, h=7: ~9.57 signature bits per k-mer, x1.3
    kmers_per_class = int(target_rows / (9.57 * 1.3))
    idx, genomes = build_index(
        args.classes, kmers_per_class, args.probe_classes
    )
    reads, true_cls = simulate_reads(genomes, args.reads)

    sample = reads[: args.exact_sample]
    t0 = time.time()
    want = host_reference_hits(idx, sample)
    log(f"host reference hits on {len(sample)} reads: {time.time() - t0:.0f}s")

    # single-core CPU baseline on this very index (native C++ path):
    # the denominator for the projected-pod vs_baseline
    from xspect2_tpu import native

    cpu_rates = []
    if native.available():
        n = min(256, len(reads))
        for _ in range(9):
            t0 = time.time()
            for row in reads[:n]:
                native.count_hits(idx, row)
            cpu_rates.append(n / (time.time() - t0))
            time.sleep(0.1)
        log(
            f"cpu 1-core native baseline: median "
            f"{np.median(cpu_rates):,.0f} reads/s"
        )

    out = {
        "classes": args.classes,
        "index_gb": round(idx.nbytes / 1e9, 2),
        "num_hashes": idx.num_hashes,
        "kmers_per_class": kmers_per_class,
        "probe_classes": args.probe_classes,
        "shard_mb_at_blk8": round(idx.nbytes / 8 / 1e6, 1),
        "rows_per_block": idx.rows_per_block,
        "class_words": idx.class_words,
        "num_blocks": int(idx.num_blocks),
        "cpu_1core_native_reads_per_s": (
            round(float(np.median(cpu_rates))) if cpu_rates else None
        ),
        "cpu_baseline_samples": [round(r) for r in cpu_rates],
        "meshes": {},
    }

    rpc = 1024
    for n_data, n_blk in ((2, 4), (1, 8)):
        if n_data * n_blk > n_dev:
            continue
        mesh = make_block_mesh(n_data=n_data, n_blk=n_blk)
        clf = BlockShardedClassifier(idx, mesh, replicate_out=True)
        t0 = time.time()
        got = clf.count_hits_reads(sample, reads_per_chunk=rpc)
        compile_s = time.time() - t0
        exact = bool(np.array_equal(got, want))
        log(f"mesh (data={n_data}, blk={n_blk}): exact={exact} "
            f"(first call {compile_s:.0f}s)")
        entry = {"exact": exact, "first_call_s": round(compile_s, 1)}
        if n_data == 2:  # throughput + accuracy on the wider data axis
            t0 = time.time()
            hits = clf.count_hits_reads(reads, reads_per_chunk=rpc)
            dt = time.time() - t0
            preds = np.argmax(hits, axis=1)
            acc = float((preds == true_cls).mean())
            entry["cpu_mesh_reads_per_s"] = round(len(reads) / dt)
            entry["argmax_accuracy"] = round(acc, 4)
            log(f"  {len(reads) / dt:,.0f} reads/s host-side, "
                f"argmax accuracy {acc:.4f}")
        out["meshes"][f"data{n_data}_blk{n_blk}"] = entry
        del clf

    out["all_exact"] = bool(out["meshes"]) and all(
        m["exact"] for m in out["meshes"].values()
    )
    print(json.dumps(out))
    sys.exit(0 if out["all_exact"] else 1)


if __name__ == "__main__":
    main()
