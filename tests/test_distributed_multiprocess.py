"""True multi-process distributed run: 2 processes x 4 CPU devices.

The reference has no distributed runtime at all (SURVEY §2.4/§5 —
scale-out is Slurm jobs with file hand-off); this framework uses JAX's
native distributed runtime.  Here two OS processes form one 8-device
global mesh over localhost, each feeds the same global inputs (each
process materializes only its addressable shards), and the sharded
classification step's collectives run across the process boundary.
Every process must see the full, identical hit matrix (outputs are
replicated over the data axis on multi-host runs).
"""

import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent(
    """
    import json, os, sys
    sys.path.insert(0, os.environ["XS_ROOT"])

    from xspect2_tpu.parallel import distributed  # noqa: F401 (jax config)
    import jax

    jax.config.update("jax_platforms", "cpu")
    topo = distributed.initialize(
        coordinator_address=os.environ["XS_COORD"],
        num_processes=2,
        process_id=int(os.environ["XS_PID"]),
    )
    assert topo["process_count"] == 2, topo
    assert topo["global_devices"] == 8, topo

    import numpy as np
    from xspect2_tpu.core import dna
    from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex
    from xspect2_tpu.parallel import ShardedClassifier, make_mesh

    rng = np.random.default_rng(5)
    k, C, glen = 21, 64, 4000
    names = [f"c{i:02d}" for i in range(C)]
    genomes = rng.integers(0, 4, size=(C, glen), dtype=np.uint8)
    idx = BlockedBitSlicedIndex.create(k, names, glen, fpr=0.01, num_hashes=7)
    for ci in range(C):
        hi, lo, v = dna.canonical_kmers(genomes[ci], k)
        idx.insert_kmers(ci, hi, lo, v)

    n = 64
    cls = rng.integers(0, C, size=n)
    pos = rng.integers(0, glen - 150, size=n)
    reads = genomes[cls[:, None], pos[:, None] + np.arange(150)[None, :]]
    reads = reads.astype(np.uint8)

    mesh = make_mesh(n_data=4, n_cls=2)  # global: spans both processes
    clf = ShardedClassifier(idx, mesh, chunk=1024)
    hits = clf.count_hits_reads(reads, reads_per_chunk=16)

    out = os.environ["XS_OUT"] + f".p{os.environ['XS_PID']}.npy"
    np.save(out, hits)

    # local-rows mode: each process keeps only its own data-shard rows
    # and reports their global offset; 50 reads pad to 64 so the tail
    # process must trim the padding rows from its slice
    clf_local = ShardedClassifier(idx, mesh, chunk=1024, replicate_out=False)
    local, row_start = clf_local.count_hits_reads(reads[:50], reads_per_chunk=16)
    np.savez(
        os.environ["XS_OUT"] + f".local{os.environ['XS_PID']}.npz",
        hits=local,
        row_start=row_start,
    )

    # host-sharded input: each process passes ONLY its half of the reads
    # (the multi-host data-loading path); reuses clf_local's compiled step
    pid = int(os.environ["XS_PID"])
    mine = reads[pid * 32 : (pid + 1) * 32]
    hs = clf_local.count_hits_reads_local(mine, reads_per_chunk=16)
    np.save(os.environ["XS_OUT"] + f".hostshard{pid}.npy", hs)
    print(json.dumps({"ok": True, "pid": pid}))
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_workers(tmp_path, attempt):
    port = _free_port()
    out_base = str(tmp_path / f"hits{attempt}")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            XS_ROOT=str(ROOT),
            XS_COORD=f"127.0.0.1:{port}",
            XS_PID=str(pid),
            XS_OUT=out_base,
            JAX_PLATFORMS="cpu",
            XSPECT_JAX_PLATFORM="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    failure = None
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            failure = failure or "timeout"
            continue
        if p.returncode != 0:
            failure = failure or f"worker failed:\n{stdout}\n{stderr}"
            continue
        outs.append(json.loads(stdout.strip().splitlines()[-1]))
    if failure is not None:
        # kill any sibling still spinning against a dead coordinator so
        # the retry attempt gets both host cores
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
        return None, failure
    return out_base, outs


def test_two_process_global_mesh(tmp_path):
    # the 2-core dev host occasionally stalls a worker when the rest of
    # the suite loads both cores; one retry filters that out (the
    # reference leans on pytest-retry for the same class of flake)
    last_err = None
    for attempt in range(2):
        out_base, outs = _launch_workers(tmp_path, attempt)
        if out_base is not None:
            break
        last_err = outs
    assert out_base is not None, last_err
    assert all(o["ok"] for o in outs)

    h0 = np.load(f"{out_base}.p0.npy")
    h1 = np.load(f"{out_base}.p1.npy")
    # both processes fetched the full replicated result
    np.testing.assert_array_equal(h0, h1)

    # single-process reference on this process's own 8 virtual devices
    from xspect2_tpu.core import dna
    from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex
    from xspect2_tpu.ops.query import DeviceQueryEngine

    rng = np.random.default_rng(5)
    k, C, glen = 21, 64, 4000
    names = [f"c{i:02d}" for i in range(C)]
    genomes = rng.integers(0, 4, size=(C, glen), dtype=np.uint8)
    idx = BlockedBitSlicedIndex.create(k, names, glen, fpr=0.01, num_hashes=7)
    for ci in range(C):
        hi, lo, v = dna.canonical_kmers(genomes[ci], k)
        idx.insert_kmers(ci, hi, lo, v)
    n = 64
    cls = rng.integers(0, C, size=n)
    pos = rng.integers(0, glen - 150, size=n)
    reads = genomes[cls[:, None], pos[:, None] + np.arange(150)[None, :]]
    reads = reads.astype(np.uint8)
    ref = DeviceQueryEngine(idx, chunk=1024).count_hits_reads(
        reads, reads_per_chunk=16, wire="raw"
    )
    np.testing.assert_array_equal(h0, ref)

    # local-rows pieces tile the (50-read) global result exactly once,
    # with padding rows trimmed by the tail process
    assembled = np.full_like(ref[:50], -1)
    for pid in range(2):
        part = np.load(f"{out_base}.local{pid}.npz")
        rows, start = part["hits"], int(part["row_start"])
        assert (assembled[start : start + len(rows)] == -1).all()
        assembled[start : start + len(rows)] = rows
    np.testing.assert_array_equal(assembled, ref[:50])

    # host-sharded input: each process fed its own half and got its own rows
    for pid in range(2):
        hs = np.load(f"{out_base}.hostshard{pid}.npy")
        np.testing.assert_array_equal(hs, ref[pid * 32 : (pid + 1) * 32])
