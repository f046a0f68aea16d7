"""Read simulation test utility.

Length-weighted uniform extraction of fixed-length reads from a genome
with a seeded RNG (reference:
src/xspect/misclassification_detection/simulate_reads.py).
"""

import numpy as np

from xspect2_tpu.io.fasta import SeqRecord, get_record_iterator


def extract_random_reads(
    genome_path,
    read_length: int = 150,
    num_reads: int = 1000,
    seed: int = 42,
) -> list[SeqRecord]:
    """Extract ``num_reads`` random fixed-length reads from a genome file."""
    rng = np.random.default_rng(seed)
    records = [
        rec for rec in get_record_iterator(genome_path) if len(rec.seq) >= read_length
    ]
    if not records:
        raise ValueError("No contigs long enough for the requested read length")

    lengths = np.array([len(rec.seq) - read_length + 1 for rec in records], dtype=float)
    probs = lengths / lengths.sum()

    reads = []
    for i in range(num_reads):
        ri = int(rng.choice(len(records), p=probs))
        start = int(rng.integers(0, len(records[ri].seq) - read_length + 1))
        reads.append(
            SeqRecord(
                records[ri].seq[start : start + read_length],
                id=f"read_{i}_{records[ri].id}_{start}",
                description="",
            )
        )
    return reads
