#!/usr/bin/env python
"""Does splitting a big table into <=100MB halves beat the gather cliff?

512B-row gathers run ~232-256M rows/s on tables <= ~100MB but ~82M/s at
>= 200MB (tools/microbench_gather.py).  This measures whether 2 clamped
gathers (one per half, every k-mer probing both, wrong-half index
clamped to row 0) beat 1 gather on the whole table.

Usage: python tools/microbench_split.py [--table-mb 200] [--splits 2]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--table-mb", type=float, default=200)
    ap.add_argument("--n", type=int, default=1 << 22)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    row_words = 128
    num_rows = int(args.table_mb * 1e6 / 512)
    table = jnp.asarray(
        rng.integers(0, 2**32, size=(num_rows, row_words), dtype=np.uint32)
    )
    idx = jnp.asarray(rng.integers(0, num_rows, size=args.n, dtype=np.int32))

    @jax.jit
    def whole(t, i):
        return jnp.sum(jnp.take(t, i, axis=0), dtype=jnp.uint32)

    def make_split(n_splits):
        bound = num_rows // n_splits

        @jax.jit
        def f(t, i):
            acc = jnp.uint32(0)
            for s in range(n_splits):
                sub = jax.lax.slice_in_dim(t, s * bound, (s + 1) * bound, axis=0)
                li = i - s * bound
                inside = (li >= 0) & (li < bound)
                li = jnp.clip(li, 0, bound - 1)
                g = jnp.take(sub, li, axis=0)
                g = jnp.where(inside[:, None], g, jnp.uint32(0))
                acc = acc + jnp.sum(g, dtype=jnp.uint32)
            return acc

        return f

    def bench(f, label):
        out = int(np.asarray(f(table, idx)))
        t0 = time.time()
        for _ in range(args.iters):
            o = f(table, idx)
        _ = int(np.asarray(o))
        dt = (time.time() - t0) / args.iters
        print(f"{label}: {args.n / dt / 1e6:.1f} M gathers/s (checksum {out})")
        return out

    c1 = bench(whole, "whole   ")
    for s in (2, 3, 4):
        cs = bench(make_split(s), f"split x{s}")
        assert cs == c1, "split result mismatch"


if __name__ == "__main__":
    main()
