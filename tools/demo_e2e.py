#!/usr/bin/env python
"""End-to-end product demo: train via the CLI, then run `xspect2 all`.

Builds a synthetic 3-species registry (SVM species model + genus
metagenome model) through the real CLI, classifies a mixed read file
through the full pipeline (genus filter -> species classification ->
conditional MLST), and asserts the species prediction matches the
dominant read source.  The same flow the CPU test suite pins
(tests/test_cli.py), packaged to run against the real TPU with
representative genome sizes — run it after engine changes to confirm
the shipped product path works on hardware, not just the kernels.

Usage: python tools/demo_e2e.py [--genome-mb 2.0] [--keep]
"""

import argparse
import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=2.0)
    ap.add_argument("--reads", type=int, default=600)
    ap.add_argument("--keep", action="store_true", help="keep the tmp registry")
    args = ap.parse_args()

    import os

    tmp = Path(tempfile.mkdtemp(prefix="xs_demo_"))
    os.environ["XSPECT_DATA_ROOT"] = str(tmp)

    from click.testing import CliRunner

    from xspect2_tpu.io.fasta import SeqRecord, write_fasta

    rng = np.random.default_rng(5)
    bases = np.array(list("ACGT"))
    glen = int(args.genome_mb * 1e6)
    root = tmp / "train"
    genomes = {}
    for label in ("470", "471", "472"):
        g = "".join(rng.choice(bases, size=glen))
        genomes[label] = g
        (root / "cobs" / label).mkdir(parents=True)
        write_fasta([SeqRecord(g, label)], root / "cobs" / label / f"{label}.fasta")
        (root / "svm" / label).mkdir(parents=True)
        for i in range(2):  # noisy copies as SVM training genomes
            arr = np.frombuffer(g.encode(), dtype=np.uint8).copy()
            pos = rng.integers(0, len(arr), size=len(arr) // 200)
            arr[pos] = np.frombuffer(b"ACGT", dtype=np.uint8)[
                rng.integers(0, 4, size=len(pos))
            ]
            write_fasta(
                [SeqRecord(arr.tobytes().decode(), f"{label}_svm{i}")],
                root / "svm" / label / f"{label}_svm{i}.fasta",
            )

    reads = []
    for n, label in ((args.reads // 2, "470"), (args.reads // 3, "471")):
        g = genomes[label]
        for i in range(n):
            p = int(rng.integers(0, glen - 150))
            reads.append(SeqRecord(g[p : p + 150], f"{label}_r{i}"))
    for i in range(args.reads // 6):  # off-genus noise the filter drops
        reads.append(SeqRecord("".join(rng.choice(bases, size=150)), f"rand_{i}"))
    sample = tmp / "sample.fasta"
    write_fasta(reads, sample)

    from xspect2_tpu.main import cli

    runner = CliRunner()
    print("training (CLI: models train directory)...", flush=True)
    r = runner.invoke(
        cli, ["models", "train", "directory", "-g", "Testus", "-i", str(root), "--meta"]
    )
    assert r.exit_code == 0, r.output

    # the CLI derives -g choices from the registry at import time (like
    # the reference CLI); re-import so the freshly trained model appears
    import importlib

    import xspect2_tpu.main as main_mod

    cli = importlib.reload(main_mod).cli

    out_dir = tmp / "out"
    print("running the full pipeline (CLI: all)...", flush=True)
    r = runner.invoke(
        cli,
        ["all", "-g", "Testus", "-i", str(sample), "-o", str(out_dir), "-t", "0.5"],
    )
    print(r.output)
    assert r.exit_code == 0, r.output

    predictions = [
        json.load(f.open()).get("prediction")
        for f in sorted(out_dir.glob("species_classification*.json"))
    ]
    assert predictions and predictions[0] == "470", predictions
    print(f"OK: species prediction {predictions[0]} (dominant read source)")
    if not args.keep:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
