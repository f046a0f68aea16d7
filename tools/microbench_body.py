#!/usr/bin/env python
"""A/B microbenchmark of the reads-query body formulations.

Variants (same math, same result, different XLA programs):
  current   — 7x (compare + where + segment-sum) row-select, bit-plane
              per-class accumulation (ops/query.py today)
  reduceand — one-pass row-select: build a [m, rpb] selected-row mask
              once, OR unselected rows to all-ones, single reduce_and
              over the row axis
  gatheronly— the block gather + trivial sum (roofline)

Forced-sync methodology (docs/performance.md).
Usage: python tools/microbench_body.py [--table-mb 50] [--classes 8]
"""

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

READ_LEN = 150
K = 21


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--table-mb", type=float, default=50)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--num-hashes", type=int, default=7)
    ap.add_argument("--reads", type=int, default=65536)
    ap.add_argument("--reads-per-chunk", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from xspect2_tpu.core import hashing

    print(f"devices: {jax.devices()}", file=sys.stderr)

    num_classes = args.classes
    class_words = max(1, (num_classes + 31) // 32)
    rows_per_block = max(8, 128 // class_words)
    rw = rows_per_block * class_words  # words per block row
    num_blocks = int(args.table_mb * 1e6 / (rw * 4))
    num_hashes = args.num_hashes
    nk = READ_LEN - K + 1
    rpc = args.reads_per_chunk

    rng = np.random.default_rng(0)
    table2d = jnp.asarray(
        rng.integers(0, 2**32, size=(num_blocks, rw), dtype=np.uint32)
    )
    reads = jnp.asarray(
        rng.integers(0, 4, size=(args.reads, READ_LEN), dtype=np.uint8)
    )
    lo_bases = min(K, 16)
    hi_bases = K - lo_bases

    def pack_and_hash(r):
        """windows -> canonical (hi,lo) -> (block, rows); shared prologue."""
        r = r.astype(jnp.uint32)
        zero = jnp.uint32(0)
        shape = (rpc, nk)
        f_hi = jnp.zeros(shape, jnp.uint32)
        f_lo = jnp.zeros(shape, jnp.uint32)
        r_hi = jnp.zeros(shape, jnp.uint32)
        r_lo = jnp.zeros(shape, jnp.uint32)
        for j in range(K):
            c = r[:, j : j + nk]
            cm = jnp.where(c > 3, zero, c)
            if j < hi_bases:
                f_hi = (f_hi << jnp.uint32(2)) | cm
            else:
                f_lo = (f_lo << jnp.uint32(2)) | cm
        for t in range(K):
            c = r[:, K - 1 - t : K - 1 - t + nk]
            cm = jnp.where(c > 3, zero, jnp.uint32(3) - c)
            if t < hi_bases:
                r_hi = (r_hi << jnp.uint32(2)) | cm
            else:
                r_lo = (r_lo << jnp.uint32(2)) | cm
        fwd_le = (f_hi < r_hi) | ((f_hi == r_hi) & (f_lo <= r_lo))
        hi = jnp.where(fwd_le, f_hi, r_hi).reshape(-1)
        lo = jnp.where(fwd_le, f_lo, r_lo).reshape(-1)
        return hashing.block_and_rows(
            hi, lo, num_blocks, rows_per_block, num_hashes, xp=jnp
        )

    def accum_planes(anded):
        per_class = []
        for w in range(class_words):
            aw = anded[:, w].reshape(rpc, nk)
            for c in range(min(32, num_classes - 32 * w)):
                plane = (aw >> jnp.uint32(c)) & jnp.uint32(1)
                per_class.append(plane.sum(axis=1).astype(jnp.int32))
        return jnp.stack(per_class, axis=0)

    def body_current(r):
        block, rows = pack_and_hash(r)
        blk = jnp.take(table2d, block.astype(jnp.int32), axis=0)
        nkm = rpc * nk
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (nkm, rw), 1)
        if class_words > 1:
            lane_row = lane_row // class_words
        anded = None
        for h in range(num_hashes):
            m = lane_row == rows[:, h].astype(jnp.int32)[:, None]
            picked = jnp.where(m, blk, jnp.uint32(0))
            if class_words > 1:
                sel = picked.reshape(nkm, rows_per_block, class_words).sum(
                    axis=1, dtype=jnp.uint32
                )
            else:
                sel = picked.sum(axis=1, dtype=jnp.uint32)[:, None]
            anded = sel if anded is None else (anded & sel)
        return accum_planes(anded)

    def body_reduceand(r):
        block, rows = pack_and_hash(r)
        blk = jnp.take(table2d, block.astype(jnp.int32), axis=0)
        nkm = rpc * nk
        # one [nkm, rpb] selected-row mask (h compares on the row axis),
        # then a single AND-reduce with unselected rows forced to ~0
        lane_row = jax.lax.broadcasted_iota(
            jnp.int32, (nkm, rows_per_block), 1
        )
        sel = jnp.zeros((nkm, rows_per_block), bool)
        for h in range(num_hashes):
            sel = sel | (lane_row == rows[:, h].astype(jnp.int32)[:, None])
        if class_words > 1:
            selw = jnp.repeat(sel, class_words, axis=1)
        else:
            selw = sel
        ones = jnp.uint32(0xFFFFFFFF)
        masked = jnp.where(selw, blk, ones)
        if class_words > 1:
            m3 = masked.reshape(nkm, rows_per_block, class_words)
            anded = lax.reduce(
                m3, ones, lax.bitwise_and, (1,)
            )
        else:
            anded = lax.reduce(masked, ones, lax.bitwise_and, (1,))[:, None]
        return accum_planes(anded)

    def body_gatheronly(r):
        block, rows = pack_and_hash(r)
        blk = jnp.take(table2d, block.astype(jnp.int32), axis=0)
        s = blk.sum(dtype=jnp.uint32) + rows.sum(dtype=jnp.uint32)
        return s[None, None] + jnp.zeros((num_classes, rpc), jnp.uint32)

    # class-word-major table: block row = [cw, rpb] so the AND-reduce
    # runs along the lane axis in rpb-sized segments
    table_cwm = jnp.asarray(
        np.ascontiguousarray(
            np.asarray(table2d)
            .reshape(num_blocks, rows_per_block, class_words)
            .transpose(0, 2, 1)
            .reshape(num_blocks, rw)
        )
    )

    def _sel_mask(rows):
        nkm = rpc * nk
        lane_row = jax.lax.broadcasted_iota(
            jnp.int32, (nkm, rows_per_block), 1
        )
        sel = jnp.zeros((nkm, rows_per_block), bool)
        for h in range(num_hashes):
            sel = sel | (lane_row == rows[:, h].astype(jnp.int32)[:, None])
        return sel

    def body_cwmajor(r):
        block, rows = pack_and_hash(r)
        blk = jnp.take(table_cwm, block.astype(jnp.int32), axis=0)
        nkm = rpc * nk
        sel = _sel_mask(rows)
        ones = jnp.uint32(0xFFFFFFFF)
        b3 = blk.reshape(nkm, class_words, rows_per_block)
        masked = jnp.where(sel[:, None, :], b3, ones)
        anded3 = lax.reduce(masked, ones, lax.bitwise_and, (2,))
        return accum_planes(anded3.reshape(nkm, class_words))

    def body_noplanes(r):
        block, rows = pack_and_hash(r)
        blk = jnp.take(table2d, block.astype(jnp.int32), axis=0)
        nkm = rpc * nk
        sel = _sel_mask(rows)
        if class_words > 1:
            selw = jnp.repeat(sel, class_words, axis=1)
        else:
            selw = sel
        ones = jnp.uint32(0xFFFFFFFF)
        masked = jnp.where(selw, blk, ones)
        if class_words > 1:
            m3 = masked.reshape(nkm, rows_per_block, class_words)
            anded = lax.reduce(m3, ones, lax.bitwise_and, (1,))
        else:
            anded = lax.reduce(masked, ones, lax.bitwise_and, (1,))[:, None]
        s = anded.sum(dtype=jnp.uint32)
        return s[None, None] + jnp.zeros((num_classes, rpc), jnp.uint32)

    def accum_planes4(anded):
        """4 classes per pass: bits {c, c+8, c+16, c+24} extracted with one
        shift+mask into independent byte lanes; per-read sums over nk stay
        < 256 so byte lanes never carry."""
        per_class = [None] * num_classes
        for w in range(class_words):
            aw = anded[:, w].reshape(rpc, nk)
            nbits = min(32, num_classes - 32 * w)
            for c0 in range(min(8, nbits)):
                t = (aw >> jnp.uint32(c0)) & jnp.uint32(0x01010101)
                s = t.sum(axis=1, dtype=jnp.uint32)  # [rpc]
                for b in range(4):
                    c = 32 * w + c0 + 8 * b
                    if c < num_classes and c0 + 8 * b < nbits:
                        per_class[c] = (
                            (s >> jnp.uint32(8 * b)) & jnp.uint32(0xFF)
                        ).astype(jnp.int32)
        return jnp.stack(per_class, axis=0)

    def body_cwmajor_p4(r):
        block, rows = pack_and_hash(r)
        blk = jnp.take(table_cwm, block.astype(jnp.int32), axis=0)
        nkm = rpc * nk
        sel = _sel_mask(rows)
        ones = jnp.uint32(0xFFFFFFFF)
        b3 = blk.reshape(nkm, class_words, rows_per_block)
        masked = jnp.where(sel[:, None, :], b3, ones)
        anded3 = lax.reduce(masked, ones, lax.bitwise_and, (2,))
        return accum_planes4(anded3.reshape(nkm, class_words))

    def body_cwmajor_noplanes(r):
        block, rows = pack_and_hash(r)
        blk = jnp.take(table_cwm, block.astype(jnp.int32), axis=0)
        nkm = rpc * nk
        sel = _sel_mask(rows)
        ones = jnp.uint32(0xFFFFFFFF)
        b3 = blk.reshape(nkm, class_words, rows_per_block)
        masked = jnp.where(sel[:, None, :], b3, ones)
        anded3 = lax.reduce(masked, ones, lax.bitwise_and, (2,))
        s = anded3.sum(dtype=jnp.uint32)
        return s[None, None] + jnp.zeros((num_classes, rpc), jnp.uint32)

    def make_scan(body):
        @jax.jit
        def f(reads_all):
            n = reads_all.shape[0]
            num_chunks = n // rpc

            def chunk_fn(_, i):
                r = lax.dynamic_slice(reads_all, (i * rpc, 0), (rpc, READ_LEN))
                return None, body(r)

            _, hits_t = lax.scan(chunk_fn, None, jnp.arange(num_chunks))
            return jnp.moveaxis(hits_t, 1, 2).reshape(n, num_classes)

        return f

    fns = {
        "current": make_scan(body_current),
        "reduceand": make_scan(body_reduceand),
        "cwmajor": make_scan(body_cwmajor),
        "cwmajor_p4": make_scan(body_cwmajor_p4),
        "noplanes": make_scan(body_noplanes),
        "cwm_noplanes": make_scan(body_cwmajor_noplanes),
        "gatheronly": make_scan(body_gatheronly),
    }

    outs = {}
    for name, f in fns.items():
        out = f(reads)
        outs[name] = np.asarray(out)
        t0 = time.time()
        for _ in range(args.iters):
            out = f(reads)
        _ = int(np.asarray(jnp.sum(out.astype(jnp.uint32))))
        dt = (time.time() - t0) / args.iters
        rps = args.reads / dt
        print(
            f"{name:10s} {rps:>12,.0f} reads/s  "
            f"({rps * nk / 1e6:.1f} M kmers/s)",
            flush=True,
        )

    for name in ("reduceand", "cwmajor", "cwmajor_p4"):
        same = np.array_equal(outs["current"], outs[name])
        print(f"current == {name}: {same}")
        if not same:
            d = np.argwhere(outs["current"] != outs[name])[:5]
            print("first diffs:", d, file=sys.stderr)


if __name__ == "__main__":
    main()
