#!/usr/bin/env python
"""A/B microbenchmark: field-packed table words vs the shipped layout.

With C <= 16 classes a uint32 table word uses only C of its 32 bits, so
the shipped layout stores a table 32/C times larger than its information
content.  Field packing stores P = 32 // field_bits signature rows per
word (field_bits = smallest power of two >= C); for the headline 8-class
config this shrinks the table 4x — from ~200 MB (above the measured
100->200 MB gather cliff, docs/performance.md) to ~50 MB (fast regime).

Probe i of a k-mer lives in field (g + i) % P (g = hash-derived field
base so all fields fill uniformly) of word (b + i*c) & (rpb-1).  The
query body runs min(h, P) masked AND-reduce passes (one per probe slot)
and aligns fields with a cheap variable rotate on the reduced vector.

Variants:
  shipped      — today's cwmajor_p4 body on the UNPACKED table (table-mb)
  fields       — field-packed body on the table-mb/P packed table
  fields_big   — field-packed body on a table-mb packed table (same bytes
                 as shipped: isolates body cost from the gather-cliff win)
  gather_small — gather-only roofline at table-mb/P

Usage: python tools/microbench_fields.py [--table-mb 200] [--classes 8]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

READ_LEN = 150
K = 21


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--table-mb", type=float, default=200)
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

    C = args.classes
    assert C <= 16
    fb = 1
    while fb < C:
        fb *= 2
    P = 32 // fb
    rpb = 128  # 512 B blocks
    h = args.num_hashes
    nk = READ_LEN - K + 1
    rpc = args.reads_per_chunk
    nkm = rpc * nk
    num_blocks_big = int(args.table_mb * 1e6 / (rpb * 4))
    num_blocks_small = num_blocks_big // P

    rng = np.random.default_rng(0)
    reads = jnp.asarray(
        rng.integers(0, 4, size=(args.reads, READ_LEN), dtype=np.uint8)
    )
    lo_bases = min(K, 16)
    hi_bases = K - lo_bases

    def pack_canonical(r):
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
        return hi, lo

    def accum_planes4(anded_word):
        """[nkm] uint32 -> [C, rpc]; 4 classes/pass in byte lanes."""
        per_class = [None] * C
        aw = anded_word.reshape(rpc, nk)
        for c0 in range(min(8, C)):
            t = (aw >> jnp.uint32(c0)) & jnp.uint32(0x01010101)
            s = t.sum(axis=1, dtype=jnp.uint32)
            for b in range(4):
                c = c0 + 8 * b
                if c < C:
                    per_class[c] = (
                        (s >> jnp.uint32(8 * b)) & jnp.uint32(0xFF)
                    ).astype(jnp.int32)
        return jnp.stack(per_class, axis=0)

    ones = jnp.uint32(0xFFFFFFFF)

    def lane_row_iota():
        return jax.lax.broadcasted_iota(jnp.int32, (nkm, rpb), 1)

    def make_shipped(nb):
        def body(table, r):
            lane_row = lane_row_iota()
            hi, lo = pack_canonical(r)
            block, rows = hashing.block_and_rows(hi, lo, nb, rpb, h, xp=jnp)
            blk = jnp.take(table, block.astype(jnp.int32), axis=0)
            sel = jnp.zeros((nkm, rpb), bool)
            for i in range(h):
                sel = sel | (lane_row == rows[:, i].astype(jnp.int32)[:, None])
            masked = jnp.where(sel, blk, ones)
            anded = lax.reduce(masked, ones, lax.bitwise_and, (1,))
            return accum_planes4(anded)

        return body

    def make_fields(nb, nh=None, rpb_v=None, i8cmp=False):
        nh = h if nh is None else nh
        rpb_v = rpb if rpb_v is None else rpb_v
        F = min(nh, P)
        mC = jnp.uint32((1 << fb) - 1) if fb < 32 else ones

        def body(table, r):
            if i8cmp:
                lane_row = jax.lax.broadcasted_iota(
                    jnp.uint8, (nkm, rpb_v), 1
                )
            else:
                lane_row = jax.lax.broadcasted_iota(
                    jnp.int32, (nkm, rpb_v), 1
                )
            hi, lo = pack_canonical(r)
            a, b, c = hashing.kmer_hash_words(hi, lo, xp=jnp)
            block = a % jnp.uint32(nb)
            g = (b >> jnp.uint32(24)) % jnp.uint32(P)
            blk = jnp.take(table, block.astype(jnp.int32), axis=0)
            out = None
            for s in range(F):
                sel = jnp.zeros((nkm, rpb_v), bool)
                for i in range(s, nh, P):
                    w = (b + jnp.uint32(i) * c) & jnp.uint32(rpb_v - 1)
                    wc = w.astype(jnp.uint8 if i8cmp else jnp.int32)
                    sel = sel | (lane_row == wc[:, None])
                masked = jnp.where(sel, blk, ones)
                and_s = lax.reduce(masked, ones, lax.bitwise_and, (1,))
                rot = (((g + jnp.uint32(s)) % jnp.uint32(P)) * jnp.uint32(fb))
                a_s = ((and_s >> rot) | (and_s << (jnp.uint32(32) - rot))) & mC
                out = a_s if out is None else (out & a_s)
            return accum_planes4(out)

        return body

    def make_gatheronly(nb):
        def body(table, r):
            hi, lo = pack_canonical(r)
            a, _, _ = hashing.kmer_hash_words(hi, lo, xp=jnp)
            block = a % jnp.uint32(nb)
            blk = jnp.take(table, block.astype(jnp.int32), axis=0)
            s = blk.sum(dtype=jnp.uint32)
            return s[None, None] + jnp.zeros((C, rpc), jnp.uint32)

        return body

    def make_scan(body):
        @jax.jit
        def f(table, reads_all):
            n = reads_all.shape[0]
            num_chunks = n // rpc

            def chunk_fn(_, i):
                r = lax.dynamic_slice(reads_all, (i * rpc, 0), (rpc, READ_LEN))
                return None, body(table, r)

            _, hits_t = lax.scan(chunk_fn, None, jnp.arange(num_chunks))
            return jnp.moveaxis(hits_t, 1, 2).reshape(n, C)

        return f

    table_big = jnp.asarray(
        rng.integers(0, 2**32, size=(num_blocks_big, rpb), dtype=np.uint32)
    )
    table_small = jnp.asarray(
        rng.integers(0, 2**32, size=(num_blocks_small, rpb), dtype=np.uint32)
    )

    # variant tables: h=4 formula sizing (fpr still 0.01) is 10.5/9.58
    # bigger bits; rpb=64 keeps the same bytes in 256 B blocks
    nb_h4 = int(num_blocks_small * 10.5 / 9.58)
    table_h4 = jnp.asarray(
        rng.integers(0, 2**32, size=(nb_h4, rpb), dtype=np.uint32)
    )
    nb_h5 = int(num_blocks_small * 9.86 / 9.58)
    table_h5 = jnp.asarray(
        rng.integers(0, 2**32, size=(nb_h5, rpb), dtype=np.uint32)
    )
    table_r64 = table_small.reshape(num_blocks_small * 2, 64)

    fns = {
        "shipped": (make_scan(make_shipped(num_blocks_big)), table_big),
        "fields": (make_scan(make_fields(num_blocks_small)), table_small),
        "fields_h4": (make_scan(make_fields(nb_h4, nh=4)), table_h4),
        "fields_h4i8": (
            make_scan(make_fields(nb_h4, nh=4, i8cmp=True)),
            table_h4,
        ),
        "fields_h3i8": (
            make_scan(make_fields(int(num_blocks_small * 12.4 / 9.58), nh=3, i8cmp=True)),
            jnp.asarray(
                rng.integers(
                    0,
                    2**32,
                    size=(int(num_blocks_small * 12.4 / 9.58), rpb),
                    dtype=np.uint32,
                )
            ),
        ),
        "fields_h3": (
            make_scan(make_fields(int(num_blocks_small * 12.4 / 9.58), nh=3)),
            jnp.asarray(
                rng.integers(
                    0,
                    2**32,
                    size=(int(num_blocks_small * 12.4 / 9.58), rpb),
                    dtype=np.uint32,
                )
            ),
        ),
        "fields_h2i8": (
            make_scan(make_fields(int(num_blocks_small * 18.96 / 9.58), nh=2, i8cmp=True)),
            jnp.asarray(
                rng.integers(
                    0,
                    2**32,
                    size=(int(num_blocks_small * 18.96 / 9.58), rpb),
                    dtype=np.uint32,
                )
            ),
        ),
        "fields_h5": (make_scan(make_fields(nb_h5, nh=5)), table_h5),
        "fields_r64": (
            make_scan(make_fields(num_blocks_small * 2, rpb_v=64)),
            table_r64,
        ),
        "fields_i8": (
            make_scan(make_fields(num_blocks_small, i8cmp=True)),
            table_small,
        ),
        "fields_big": (make_scan(make_fields(num_blocks_big)), table_big),
        "gather_small": (
            make_scan(make_gatheronly(num_blocks_small)),
            table_small,
        ),
        "gather_big": (make_scan(make_gatheronly(num_blocks_big)), table_big),
    }

    print(
        f"C={C} fb={fb} P={P} big={num_blocks_big * rpb * 4 / 1e6:.0f}MB "
        f"small={num_blocks_small * rpb * 4 / 1e6:.0f}MB",
        file=sys.stderr,
    )
    for name, (f, table) in fns.items():
        out = f(table, reads)
        _ = int(np.asarray(jnp.sum(out.astype(jnp.uint32))))
        t0 = time.time()
        for _ in range(args.iters):
            out = f(table, reads)
        _ = int(np.asarray(jnp.sum(out.astype(jnp.uint32))))
        dt = (time.time() - t0) / args.iters
        rps = args.reads / dt
        print(
            f"{name:12s} {rps:>12,.0f} reads/s  "
            f"({rps * nk / 1e6:.1f} M kmers/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
