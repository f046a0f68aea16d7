#!/usr/bin/env python
"""Pallas fused probe-select/AND kernel vs the shipped XLA formulation.

The shipped reads-query body gathers each k-mer's 512 B block with XLA
(`jnp.take`, the measured-fastest primitive) and then does the
selected-row AND-reduce as jnp ops.  This prototypes moving that
post-gather pass into a Pallas kernel that streams the gathered blocks
through VMEM exactly once: selbits (a 128-bit row mask per k-mer,
packed by XLA into rpb/32 uint32 words) expand in-register, unselected
lanes force to all-ones, and a log2(rpb) roll-AND tree reduces each
class word's lane segment.

Usage: python tools/microbench_pallas.py [--table-mb 50] [--classes 8]
"""

import argparse
import functools
import sys
import time
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
    ap.add_argument("--tile", type=int, default=2080)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from xspect2_tpu.core import hashing
    from xspect2_tpu.ops import query as q

    print(f"devices: {jax.devices()}", file=sys.stderr)

    num_classes = args.classes
    class_words = max(1, (num_classes + 31) // 32)
    rows_per_block = max(8, 128 // class_words)
    rw = rows_per_block * class_words
    num_blocks = int(args.table_mb * 1e6 / (rw * 4))
    num_hashes = args.num_hashes
    nk = READ_LEN - K + 1
    rpc = args.reads_per_chunk
    nkm = rpc * nk
    W = max(1, rows_per_block // 32)  # selbits words per k-mer

    rng = np.random.default_rng(0)
    table2d = jnp.asarray(
        rng.integers(0, 2**32, size=(num_blocks, rw), dtype=np.uint32)
    )
    reads_np = rng.integers(0, 4, size=(args.reads, READ_LEN), dtype=np.uint8)
    reads = jnp.asarray(reads_np)

    # tile size: multiple of 8 sublanes dividing nkm
    T = args.tile
    assert nkm % T == 0, (nkm, T)

    def sel_kernel(sb_ref, blk_ref, out_ref):
        blk = blk_ref[...]  # [T, 128] uint32
        sb = sb_ref[...]  # [T, W] uint32
        # expand row mask to lanes: lane l -> row (l % rpb)
        parts = [
            jnp.repeat(sb[:, w : w + 1], 32, axis=1) for w in range(W)
        ]
        rep = parts[0] if W == 1 else jnp.concatenate(parts, axis=1)  # [T, rpb]
        if class_words > 1:
            rep = jnp.tile(rep, (1, class_words))  # [T, 128]
        lane = lax.broadcasted_iota(jnp.uint32, (T, 128), 1)
        shift = (lane % jnp.uint32(rows_per_block)) % jnp.uint32(32)
        selbit = (rep >> shift) & jnp.uint32(1)
        x = jnp.where(selbit == 1, blk, jnp.uint32(0xFFFFFFFF))
        # segmented AND-reduce over rpb-lane windows via roll tree
        sh = rows_per_block // 2
        while sh >= 1:
            x = x & pltpu.roll(x, 128 - sh, 1)  # rotate-left by sh
            sh //= 2
        # lane w*rpb holds the AND of class word w's segment
        outs = [x[:, w * rows_per_block] for w in range(class_words)]
        out_ref[...] = jnp.stack(outs, axis=1)  # [T, cw]

    grid = (nkm // T,)
    pallas_sel = pl.pallas_call(
        sel_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (T, class_words), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nkm, class_words), jnp.uint32),
    )

    lo_bases = min(K, 16)
    hi_bases = K - lo_bases

    def prologue(r):
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

    def planes(anded):
        per_class = [None] * num_classes
        for w in range(class_words):
            aw = anded[:, w].reshape(rpc, nk)
            nbits = min(32, num_classes - 32 * w)
            for c0 in range(min(8, nbits)):
                t = (aw >> jnp.uint32(c0)) & jnp.uint32(0x01010101)
                s = t.sum(axis=1, dtype=jnp.uint32)
                for b in range(4):
                    j = c0 + 8 * b
                    if j < nbits:
                        per_class[32 * w + j] = (
                            (s >> jnp.uint32(8 * b)) & jnp.uint32(0xFF)
                        ).astype(jnp.int32)
        return jnp.stack(per_class, axis=0)

    def body_pallas(r):
        block, rows = prologue(r)
        blk = jnp.take(table2d, block.astype(jnp.int32), axis=0)
        # pack the row mask into W uint32 words per k-mer
        sb = []
        for w in range(W):
            acc = jnp.zeros((nkm,), jnp.uint32)
            for h in range(num_hashes):
                rh = rows[:, h]
                in_w = (rh >> jnp.uint32(5)) == jnp.uint32(w)
                acc = acc | jnp.where(
                    in_w, jnp.uint32(1) << (rh & jnp.uint32(31)), jnp.uint32(0)
                )
            sb.append(acc)
        selbits = jnp.stack(sb, axis=1)  # [nkm, W]
        anded = pallas_sel(selbits, blk)
        return planes(anded)

    @jax.jit
    def f_pallas(reads_all):
        n = reads_all.shape[0]

        def chunk_fn(_, i):
            r = lax.dynamic_slice(reads_all, (i * rpc, 0), (rpc, READ_LEN))
            return None, body_pallas(r)

        _, hits_t = lax.scan(chunk_fn, None, jnp.arange(n // rpc))
        return jnp.moveaxis(hits_t, 1, 2).reshape(n, num_classes)

    # shipped XLA body for comparison
    xla_body = q.make_reads_query_body(
        read_len=READ_LEN,
        k=K,
        num_hashes=num_hashes,
        rows_per_block=rows_per_block,
        class_words=class_words,
        num_classes=num_classes,
        step=1,
        reads_per_chunk=rpc,
    )
    f_xla = jax.jit(lambda r: xla_body(table2d, r, jnp.uint32(num_blocks)))

    def bench(f, label):
        out = np.asarray(f(reads))
        t0 = time.time()
        for _ in range(args.iters):
            o = f(reads)
        _ = int(np.asarray(jnp.sum(o)))
        dt = (time.time() - t0) / args.iters
        print(
            f"{label}: {args.reads / dt:,.0f} reads/s "
            f"({args.reads / dt * nk / 1e6:.1f} M kmers/s)",
            flush=True,
        )
        return out

    o_xla = bench(f_xla, "xla   ")
    o_pal = bench(f_pallas, "pallas")
    print("pallas == xla:", np.array_equal(o_xla, o_pal))


if __name__ == "__main__":
    main()
