#!/usr/bin/env python
"""Microbenchmark: does index *order* change the 512 B-row gather rate?

Question this answers (docs/performance.md "gather cliff"): tables over
~110 MB gather at ~80 M rows/s vs ~220 M below.  If the slow regime is
HBM-locality-bound, gathering with *sorted* indices should recover part
of the fast rate — which would make a sort->gather->unsort pipeline (or
block-axis sharding with sorted routing) profitable for reference-scale
(~400 MB, 40-class) indices.  Measures, per table size:

  1. random-index gather (the shipped query's access pattern),
  2. sorted-index gather (upper bound for any routing scheme),
  3. lax.sort throughput with 1..3 u32 payloads (the routing cost),
  4. the full sort -> gather -> sort-back pipeline.

Usage: python tools/microbench_sorted_gather.py [--n 4194304]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def timed(fn, *args, iters=4):
    out = fn(*args)
    _ = np.asarray(out[0] if isinstance(out, tuple) else out).ravel()[:1]
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(out[0] if isinstance(out, tuple) else out).ravel()[:1]
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 22)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--row-bytes", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    n = args.n
    row_words = args.row_bytes // 4

    @jax.jit
    def gather_sum(t, i):
        return jnp.sum(jnp.take(t, i, axis=0), dtype=jnp.uint32)

    @jax.jit
    def sort1(k, p0):
        return jax.lax.sort((k, p0), num_keys=1)

    @jax.jit
    def sort3(k, p0, p1, p2):
        return jax.lax.sort((k, p0, p1, p2), num_keys=1)

    @jax.jit
    def pipeline(t, i, pos):
        # route: sort k-mers by destination row, gather, restore order
        si, spos = jax.lax.sort((i, pos), num_keys=1)
        g = jnp.take(t, si, axis=0)
        payload = jnp.sum(g, axis=1, dtype=jnp.uint32)  # stand-in AND word
        _, back = jax.lax.sort((spos, payload), num_keys=1)
        return jnp.sum(back, dtype=jnp.uint32)

    print("table_mb,random_M/s,sorted_M/s,pipeline_M/s")
    for table_mb in (50, 100, 200, 400, 800):
        num_rows = int(table_mb * 1e6 / args.row_bytes)
        table = jnp.asarray(
            rng.integers(0, 2**32, size=(num_rows, row_words), dtype=np.uint32)
        )
        idx_np = rng.integers(0, num_rows, size=n, dtype=np.int32)
        idx = jnp.asarray(idx_np)
        idx_sorted = jnp.asarray(np.sort(idx_np))
        pos = jnp.arange(n, dtype=np.int32)

        dt_rand = timed(gather_sum, table, idx, iters=args.iters)
        dt_sort = timed(gather_sum, table, idx_sorted, iters=args.iters)
        dt_pipe = timed(pipeline, table, idx, pos, iters=args.iters)
        print(
            f"{table_mb},{n/dt_rand/1e6:.1f},{n/dt_sort/1e6:.1f},"
            f"{n/dt_pipe/1e6:.1f}",
            flush=True,
        )
        del table

    k = jnp.asarray(rng.integers(0, 2**31, size=n, dtype=np.int32))
    p = [jnp.asarray(rng.integers(0, 2**31, size=n, dtype=np.int32)) for _ in range(3)]
    dt1 = timed(sort1, k, p[0], iters=args.iters)
    dt3 = timed(sort3, k, *p, iters=args.iters)
    print(f"sort 1 payload: {n/dt1/1e6:.1f} M elem/s", flush=True)
    print(f"sort 3 payloads: {n/dt3/1e6:.1f} M elem/s", flush=True)


if __name__ == "__main__":
    main()
