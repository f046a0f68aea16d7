#!/usr/bin/env python
"""Microbenchmark: XLA gather issue rate vs row width and table size.

Question this answers: the query engine issues ONE contiguous-block
gather per k-mer probe (docs/performance.md).  If g adjacent k-mers
shared one (g x wider) block, gathers drop g-fold while the table grows
g-fold — a win only if the gather rate is insensitive to row width and
does not degrade too much with table size.  This measures exactly that
grid, with the forced-sync methodology of docs/performance.md.

Usage: python tools/microbench_gather.py [--n 4194304]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 22, help="gathers per timing")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", file=sys.stderr)

    rng = np.random.default_rng(0)

    def bench(table_mb: float, row_bytes: int, n: int):
        row_words = row_bytes // 4
        num_rows = int(table_mb * 1e6 / row_bytes)
        table = jnp.asarray(
            rng.integers(0, 2**32, size=(num_rows, row_words), dtype=np.uint32)
        )
        idx = jnp.asarray(rng.integers(0, num_rows, size=n, dtype=np.int32))

        @jax.jit
        def f(t, i):
            g = jnp.take(t, i, axis=0)
            return jnp.sum(g, dtype=jnp.uint32)

        _ = int(np.asarray(f(table, idx)))  # compile + warm
        t0 = time.time()
        for _ in range(args.iters):
            out = f(table, idx)
        _ = int(np.asarray(out))
        dt = (time.time() - t0) / args.iters
        rate = n / dt
        return rate

    print("table_mb,row_bytes,gathers_per_s,GB_per_s")
    for table_mb in (25, 50, 100, 200, 400):
        for row_bytes in (128, 256, 512, 1024, 2048, 4096):
            n = args.n
            # keep per-timing gathered bytes bounded (~4 GB max)
            while n * row_bytes > 4e9:
                n //= 2
            r = bench(table_mb, row_bytes, n)
            print(
                f"{table_mb},{row_bytes},{r / 1e6:.1f}M,{r * row_bytes / 1e9:.1f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
