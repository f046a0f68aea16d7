#!/usr/bin/env python
"""Microbenchmark: per-device rate of one block shard vs the whole table.

Block-axis sharding gives every device a ``1/n_blk`` window of the
signature blocks and has it probe ALL k-mers of its data shard, masking
non-owned ones (parallel/block_sharded.py).  The per-device cost is one
clamped gather per k-mer into the local window — so the whole question
is the gather rate at the window's size.  This measures, on the real
chip, the reference-scale 40-class/~400 MB geometry:

  - whole-table rate (the single-device / replicated-DP regime),
  - one-shard rate at n_blk in {2, 4, 8} (window 200/100/50 MB),

from which the crossover analysis in docs/performance.md follows:
block-sharded throughput per N devices = N_data * shard_rate where
N = N_data * n_blk, vs replicated DP = N * whole_rate.

Usage: python tools/microbench_blockshard.py [--reads 65536]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=1 << 16)
    ap.add_argument("--classes", type=int, default=40)
    ap.add_argument("--genome-mb", type=float, default=4.0)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import K, READ_LEN, build_or_load_index, simulate_reads
    from xspect2_tpu.ops.query import make_reads_query_body

    print(f"devices: {jax.devices()}", file=sys.stderr)
    index, genomes = build_or_load_index(args.classes, args.genome_mb)
    reads, _cls = simulate_reads(genomes, args.reads)
    reads = np.where(reads > 3, 0, reads)  # keep the body identical across runs
    nk = READ_LEN - K + 1
    rpc = 8192
    n = args.reads // rpc * rpc
    reads = reads[:n]
    print(
        f"index: {index.num_classes} classes, h={index.num_hashes}, "
        f"{index.nbytes / 1e6:.0f} MB, {index.num_blocks} blocks",
        file=sys.stderr,
    )

    def bench(local_blocks: int | None, offset: int):
        qb = make_reads_query_body(
            read_len=READ_LEN,
            k=index.k,
            num_hashes=index.num_hashes,
            rows_per_block=index.rows_per_block,
            class_words=index.class_words,
            num_classes=index.num_classes,
            reads_per_chunk=rpc,
            fields_per_word=index.fields_per_word,
            local_blocks=local_blocks,
        )
        table3 = index.device_table().reshape(
            index.num_blocks, index.class_words * index.rows_per_block
        )
        if local_blocks is None:
            table_dev = jnp.asarray(table3)
            fn = jax.jit(lambda t, r: qb(t, r, index.num_blocks).sum())
            fargs = (table_dev, jnp.asarray(reads))
        else:
            # keep the window fully inside the table: when num_blocks
            # is not divisible by n_blk a mid-table offset could slice
            # short and the clamped gather would silently measure a
            # smaller window
            offset = min(offset, index.num_blocks - local_blocks)
            table_dev = jnp.asarray(table3[offset : offset + local_blocks])
            fn = jax.jit(
                lambda t, r, o: qb(t, r, index.num_blocks, o).sum()
            )
            fargs = (table_dev, jnp.asarray(reads), jnp.int32(offset))
        _ = int(np.asarray(fn(*fargs)))  # compile + warm
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(*fargs)
        _ = int(np.asarray(out))
        dt = (time.time() - t0) / args.iters
        return n / dt, n * nk / dt

    rate, lookups = bench(None, 0)
    print(f"whole table: {rate / 1e3:.0f} k reads/s ({lookups / 1e6:.0f} M lookups/s)")
    for n_blk in (2, 4, 8):
        local = -(-index.num_blocks // n_blk)
        r, lk = bench(local, local)  # middle window: representative clamping
        mb = local * index.rows_per_block * index.class_words * 4 / 1e6
        print(
            f"1/{n_blk} shard ({mb:.0f} MB window): {r / 1e3:.0f} k reads/s "
            f"({lk / 1e6:.0f} M lookups/s) per device",
            flush=True,
        )


if __name__ == "__main__":
    main()
