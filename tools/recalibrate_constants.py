#!/usr/bin/env python
"""Re-derive the layout-picker constants for a new TPU generation.

``core/blocked_index.py::pick_num_hashes`` selects each index's probe
count from four chip-measured constants: the per-k-mer body-pass cost
(ns), the fast-regime gather cost (ns), the flat slow-regime gather
cost (ns), and the fast-table HBM budget (bytes) where the gather rate
cliffs.  Those shipped values were measured on v5e; on a new chip
generation run THIS tool once on the target device and it prints the
replacement constants plus the env override:

    python tools/recalibrate_constants.py

Method (same forced-sync methodology as bench.py / docs/performance.md):
  1. Gather-rate scan over table sizes with the production 512 B block
     row -> fast rate, slow rate, and the cliff edge (budget = last
     fast size minus a safety margin).
  2. Real-engine A/B at h=2 vs h=7 on a fast-regime 8-class index ->
     per-k-mer time difference / pass-count difference = body ns/pass.

Paste the printed numbers into pick_num_hashes (or export
XSPECT_FAST_TABLE_BYTES for the budget alone, no code change).
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

READ_LEN = 150
K = 21


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def gather_scan(sizes_mb, n, iters):
    """Gather rate (rows/s) per table size at the production row width."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    rates = {}
    row_words = 128  # 512 B block row, the production target_block_bytes
    f = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0), dtype=jnp.uint32))
    for mb in sizes_mb:
        num_rows = int(mb * 1e6) // (row_words * 4)
        table = jnp.asarray(
            rng.integers(0, 2**32, size=(num_rows, row_words), dtype=np.uint32)
        )
        idx = jnp.asarray(rng.integers(0, num_rows, size=n, dtype=np.int32))
        _ = int(np.asarray(f(table, idx)))  # compile + warm
        t0 = time.time()
        for _ in range(iters):
            out = f(table, idx)
        _ = int(np.asarray(out))
        rates[mb] = n / ((time.time() - t0) / iters)
        log(f"  {mb:6.0f} MB: {rates[mb] / 1e6:8.1f} M rows/s")
        del table, idx
    return rates


def find_cliff(rates):
    """Split the scan into fast/slow regimes at the largest rate drop."""
    sizes = sorted(rates)
    drops = [
        (rates[a] / max(rates[b], 1.0), a, b)
        for a, b in zip(sizes, sizes[1:])
    ]
    ratio, last_fast, first_slow = max(drops)
    if ratio < 1.5:  # no cliff on this chip: everything is one regime
        return None, sizes[-1], None
    fast = [rates[s] for s in sizes if s <= last_fast]
    slow = [rates[s] for s in sizes if s >= first_slow]
    return float(np.median(fast)), last_fast, float(np.median(slow))


def engine_ab(h_values, classes=8, genome_mb=4.0, num_reads=65536):
    """Device reads/s of the REAL query engine at each probe count."""
    import jax
    import jax.numpy as jnp

    from xspect2_tpu.core import dna
    from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex
    from xspect2_tpu.ops.query import DeviceQueryEngine

    rng = np.random.default_rng(1)
    genome_len = int(genome_mb * 1e6)
    genomes = rng.integers(0, 4, size=(classes, genome_len), dtype=np.uint8)
    cls = rng.integers(0, classes, size=num_reads)
    pos = rng.integers(0, genome_len - READ_LEN, size=num_reads)
    reads = genomes[cls[:, None], pos[:, None] + np.arange(READ_LEN)[None, :]]

    results = {}
    for h in h_values:
        index = BlockedBitSlicedIndex.create(
            K,
            [str(i) for i in range(classes)],
            genome_len - K + 1,
            fpr=0.01,
            num_hashes=h,
        )
        from xspect2_tpu import native

        for ci in range(classes):
            if native.available():
                native.insert_kmers(index, ci, genomes[ci])
            else:
                hi, lo, valid = dna.canonical_kmers(genomes[ci], K)
                index.insert_kmers(ci, hi, lo, valid)
        engine = DeviceQueryEngine(index)
        out = engine.count_hits_reads(reads, reads_per_chunk=8192, block=False)
        _ = int(np.asarray(jnp.sum(out)))  # compile + warm
        t0 = time.time()
        for _ in range(3):
            out = engine.count_hits_reads(
                reads, reads_per_chunk=8192, block=False
            )
        _ = int(np.asarray(jnp.sum(out)))
        rps = num_reads / ((time.time() - t0) / 3)
        passes = h + min(h, index.fields_per_word)
        results[h] = (rps, passes, index.nbytes / 1e6)
        log(
            f"  h={h}: {rps:,.0f} reads/s, {passes} body passes, "
            f"{index.nbytes / 1e6:.0f} MB table"
        )
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sizes-mb",
        default="25,50,75,100,110,120,150,200",
        help="gather-scan table sizes",
    )
    ap.add_argument("--n", type=int, default=1 << 21)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    log(f"devices: {jax.devices()}")

    log("gather-rate scan (512 B block rows):")
    sizes = [float(s) for s in args.sizes_mb.split(",")]
    rates = gather_scan(sizes, args.n, args.iters)
    fast_rate, last_fast_mb, slow_rate = find_cliff(rates)
    if fast_rate is None:
        log("no gather cliff found: single regime on this chip")
        fast_rate = float(np.median(list(rates.values())))
        slow_rate = fast_rate
    fast_ns = 1e9 / fast_rate
    slow_ns = 1e9 / slow_rate
    budget_bytes = int(last_fast_mb * 1e6 * 0.98)

    log("engine A/B on a fast-regime 8-class index:")
    ab = engine_ab((2, 7))
    (rps2, p2, _), (rps7, p7, _) = ab[2], ab[7]
    kmers = READ_LEN - K + 1
    # per-k-mer ns at each h; the h=2 index probes 2 rows/k-mer and the
    # h=7 index 7, so subtract each config's own gather share first
    t2 = 1e9 / (rps2 * kmers) - 2 * fast_ns
    t7 = 1e9 / (rps7 * kmers) - 7 * fast_ns
    body_ns = max(0.05, (t7 - t2) / (p7 - p2))
    if t2 < 0 or t7 < 0:
        log(
            "WARNING: engine time is smaller than its gather share — the "
            "chip is likely in a degraded-bandwidth window (the dev tunnel "
            "swings >2x between sessions); the body-pass constant below is "
            "unreliable, re-run when the gather scan reads near its best."
        )

    print()
    print("=== pick_num_hashes constants for this chip ===")
    print(f"body pass cost      : {body_ns:.2f} ns/k-mer   (shipped: 0.42)")
    print(f"fast gather cost    : {fast_ns:.2f} ns/k-mer   (shipped: 3.4)")
    print(f"slow gather cost    : {slow_ns:.2f} ns/k-mer   (shipped: 12.3)")
    print(f"fast-table budget   : {budget_bytes} bytes  (shipped: 108000000)")
    print()
    print("apply: edit core/blocked_index.py::pick_num_hashes cost model")
    print(f"  fast regime: cost = {body_ns:.2f} * passes + {fast_ns:.2f}")
    print(f"  slow regime: cost = {slow_ns:.2f}")
    print("or, for the budget alone (no code change):")
    print(f"  export XSPECT_FAST_TABLE_BYTES={budget_bytes}")


if __name__ == "__main__":
    main()
