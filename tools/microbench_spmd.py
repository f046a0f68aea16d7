#!/usr/bin/env python
"""SPMD program overhead on a virtual CPU mesh.

Real multi-chip hardware is not available in this environment, so true
scaling efficiency cannot be measured here.  What CAN be measured: the
sharded (data x cls) program's overhead versus the single-device query
for the same total work on the same silicon — all virtual devices share
one host CPU, so with zero SPMD overhead (collectives, padding,
per-shard dispatch) wall time would be identical.  The gap bounds the
non-compute cost the mesh program adds.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu XSPECT_JAX_PLATFORM=cpu \
       python tools/microbench_spmd.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XSPECT_JAX_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np


def main():
    import jax

    from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex
    from xspect2_tpu.ops.query import DeviceQueryEngine
    from xspect2_tpu.parallel import ShardedClassifier, make_mesh
    from xspect2_tpu import native

    devices = jax.devices()
    print(f"{len(devices)} virtual devices on one host CPU", file=sys.stderr)

    rng = np.random.default_rng(0)
    # 64 classes = 2 class words, so a 2-way cls axis splits REAL work
    # (with class_words < n_cls the padding word-columns duplicate all
    # work per extra cls shard — never shard classes finer than
    # class_words)
    k, num_classes, glen = 21, 64, 100_000
    genomes = rng.integers(0, 4, size=(num_classes, glen), dtype=np.uint8)
    idx = BlockedBitSlicedIndex.create(
        k, [str(i) for i in range(num_classes)], glen, fpr=0.01, num_hashes=7
    )
    for ci in range(num_classes):
        if native.available():
            native.insert_kmers(idx, ci, genomes[ci])
        else:
            from xspect2_tpu.core import dna

            hi, lo, v = dna.canonical_kmers(genomes[ci], k)
            idx.insert_kmers(ci, hi, lo, v)

    n = 32768
    cls = rng.integers(0, num_classes, size=n)
    pos = rng.integers(0, glen - 150, size=n)
    reads = genomes[cls[:, None], pos[:, None] + np.arange(150)[None, :]]
    reads = reads.astype(np.uint8)
    rpc = 2048

    def timeit(fn, label, iters=3):
        out = fn()  # warm/compile
        t0 = time.time()
        for _ in range(iters):
            out = fn()
        dt = (time.time() - t0) / iters
        print(f"{label}: {n / dt:,.0f} reads/s")
        return out, dt

    engine = DeviceQueryEngine(idx)
    single, t_single = timeit(
        lambda: engine.count_hits_reads(reads, reads_per_chunk=rpc, wire="raw"),
        "single-device        ",
    )

    for n_data, n_cls in ((4, 2), (8, 1)):
        mesh = make_mesh(
            n_data=n_data, n_cls=n_cls, devices=devices[: n_data * n_cls]
        )
        clf = ShardedClassifier(idx, mesh)
        sharded, t_shard = timeit(
            lambda: clf.count_hits_reads(reads, reads_per_chunk=rpc // n_data),
            f"sharded mesh {n_data}x{n_cls} (SPMD)",
        )
        assert np.array_equal(single, sharded), "sharded result mismatch"
        print(
            f"  overhead vs single-device program: "
            f"{(t_shard / t_single - 1) * 100:+.1f}% "
            f"(same total work, same silicon)"
        )


if __name__ == "__main__":
    main()
