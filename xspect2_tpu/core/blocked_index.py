"""Blocked bit-sliced signature index — the TPU-native COBS/Bloom equivalent.

Layout
------
A dense bit matrix of shape ``[num_blocks, rows_per_block, C]`` bits,
stored as uint32 words ``[num_blocks, rows_per_block * class_words]``
(``class_words = ceil(C / 32)``).  One *column* per class (document),
exactly like COBS's bit-sliced layout, but rows are grouped into
fixed-size *blocks* (typically 512 bytes) and all ``num_hashes`` probes
of a k-mer are constrained to one block.  A membership query for a k-mer
therefore costs a single contiguous gather of one block, followed by
in-register row selection, AND across hashes, and per-class bit
accumulation — ideal for TPU HBM bandwidth and the VPU.

Semantics match the reference's index contract (reference:
src/xspect/models/probabilistic_filter_model.py:196-235): per class, the
hit count of a query sequence is the number of its k-mers whose probe
bits are all set in that class's column; k-mers are canonicalized before
hashing; there are no false negatives.

Sizing uses the COBS signature-size formula per class (for the largest
class) with a configurable oversizing factor that compensates for the
slightly higher false-positive rate of blocked addressing.  With
``num_hashes == 1`` blocking is exact (no penalty).
"""

import json
import math
from pathlib import Path

import numpy as np

from xspect2_tpu.core import hashing


def cobs_signature_bits(num_kmers: int, fpr: float, num_hashes: int) -> int:
    """COBS/Bloom signature size in bits for ``num_kmers`` items.

    m = ceil(-h * n / ln(1 - fpr^(1/h)))  (arXiv:1905.09624, §COBS Index).
    """
    if num_kmers <= 0:
        return 1
    return int(
        math.ceil(
            -num_hashes * num_kmers / math.log(1.0 - fpr ** (1.0 / num_hashes))
        )
    )


def default_rows_per_block(class_words: int, target_block_bytes: int = 512) -> int:
    """Rows per block so one block is ~target_block_bytes (power of two, >= 8)."""
    rows = target_block_bytes // (class_words * 4)
    rows = max(8, rows)
    # round down to power of two
    return 1 << (rows.bit_length() - 1)


class BlockedBitSlicedIndex:
    """Dense blocked bit-sliced signature index over C classes."""

    FORMAT_VERSION = 1

    def __init__(
        self,
        k: int,
        class_names: list[str],
        num_blocks: int,
        rows_per_block: int,
        num_hashes: int,
        fpr: float,
        table: np.ndarray | None = None,
    ):
        if rows_per_block & (rows_per_block - 1):
            raise ValueError("rows_per_block must be a power of two")
        self.k = k
        self.class_names = list(class_names)
        self.num_classes = len(self.class_names)
        self.class_words = max(1, (self.num_classes + 31) // 32)
        self.num_blocks = int(num_blocks)
        self.rows_per_block = int(rows_per_block)
        self.num_hashes = int(num_hashes)
        self.fpr = float(fpr)
        words = self.num_blocks * self.rows_per_block * self.class_words
        if table is None:
            self.table = np.zeros(words, dtype=np.uint32)
        else:
            if table.size != words:
                raise ValueError("table size mismatch")
            self.table = table.reshape(-1).astype(np.uint32, copy=False)

    # ------------------------------------------------------------------ build

    @classmethod
    def create(
        cls,
        k: int,
        class_names: list[str],
        max_kmers_per_class: int,
        fpr: float = 0.01,
        num_hashes: int = 7,
        size_factor: float | None = None,
        target_block_bytes: int = 512,
    ) -> "BlockedBitSlicedIndex":
        """Allocate an empty index sized for ``max_kmers_per_class`` items/class."""
        if size_factor is None:
            size_factor = 1.0 if num_hashes == 1 else 1.3
        class_words = max(1, (len(class_names) + 31) // 32)
        rows_per_block = default_rows_per_block(class_words, target_block_bytes)
        bits = cobs_signature_bits(max_kmers_per_class, fpr, num_hashes)
        bits = int(math.ceil(bits * size_factor))
        num_blocks = max(16, (bits + rows_per_block - 1) // rows_per_block)
        return cls(k, class_names, num_blocks, rows_per_block, num_hashes, fpr)

    def insert_kmers(
        self,
        class_idx: int,
        hi: np.ndarray,
        lo: np.ndarray,
        valid: np.ndarray | None = None,
    ) -> None:
        """Set the probe bits of the given packed canonical k-mers for one class."""
        if valid is not None:
            hi = hi[valid]
            lo = lo[valid]
        if hi.size == 0:
            return
        block, rows = hashing.block_and_rows(
            hi, lo, self.num_blocks, self.rows_per_block, self.num_hashes, xp=np
        )
        word_of_class = np.uint32(class_idx // 32)
        bit = np.uint32(1) << np.uint32(class_idx % 32)
        base = (
            block.astype(np.int64) * self.rows_per_block + 0
        )  # block base row index
        flat = (
            (base[:, None] + rows.astype(np.int64)) * self.class_words
            + int(word_of_class)
        ).reshape(-1)
        np.bitwise_or.at(self.table, flat, bit)

    # ------------------------------------------------------------------ query (host reference)

    def membership_host(self, hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
        """Reference (numpy) membership query: [n, C] uint8 bit matrix."""
        if hi.size == 0:
            return np.zeros((0, self.num_classes), dtype=np.uint8)
        block, rows = hashing.block_and_rows(
            hi, lo, self.num_blocks, self.rows_per_block, self.num_hashes, xp=np
        )
        base_row = block.astype(np.int64) * self.rows_per_block
        # gather words for each (kmer, hash) probe: [n, h, class_words]
        word_idx = (
            (base_row[:, None] + rows.astype(np.int64))[:, :, None] * self.class_words
            + np.arange(self.class_words, dtype=np.int64)[None, None, :]
        )
        probes = self.table[word_idx]
        anded = probes[:, 0, :]
        for h in range(1, self.num_hashes):
            anded = anded & probes[:, h, :]
        cls = np.arange(self.num_classes)
        bits = (anded[:, cls // 32] >> (cls % 32).astype(np.uint32)) & np.uint32(1)
        return bits.astype(np.uint8)

    def count_hits_host(
        self, hi: np.ndarray, lo: np.ndarray, valid: np.ndarray | None = None
    ) -> np.ndarray:
        """Reference hit counts per class for one sequence's packed k-mers."""
        if valid is not None:
            hi = hi[valid]
            lo = lo[valid]
        bits = self.membership_host(hi, lo)
        return bits.sum(axis=0, dtype=np.int64)

    # ------------------------------------------------------------------ persistence

    def meta_dict(self) -> dict:
        return {
            "format_version": self.FORMAT_VERSION,
            "k": self.k,
            "class_names": self.class_names,
            "num_blocks": self.num_blocks,
            "rows_per_block": self.rows_per_block,
            "class_words": self.class_words,
            "num_hashes": self.num_hashes,
            "fpr": self.fpr,
        }

    def save(self, dir_path: Path) -> None:
        dir_path = Path(dir_path)
        dir_path.mkdir(parents=True, exist_ok=True)
        np.save(dir_path / "table.npy", self.table)
        (dir_path / "index_meta.json").write_text(
            json.dumps(self.meta_dict(), indent=2), encoding="utf-8"
        )

    @classmethod
    def load(cls, dir_path: Path, mmap: bool = False) -> "BlockedBitSlicedIndex":
        dir_path = Path(dir_path)
        meta = json.loads((dir_path / "index_meta.json").read_text(encoding="utf-8"))
        table = np.load(dir_path / "table.npy", mmap_mode="r" if mmap else None)
        return cls(
            meta["k"],
            meta["class_names"],
            meta["num_blocks"],
            meta["rows_per_block"],
            meta["num_hashes"],
            meta["fpr"],
            table=table,
        )

    # ------------------------------------------------------------------ info

    @property
    def nbytes(self) -> int:
        return self.table.nbytes

    def device_table(self):
        """The table shaped for the device query op: [num_blocks, class_words * R].

        Device layout is *class-word-major* within a block (word w's rows
        are contiguous), unlike the row-major logical/on-disk layout: the
        query's AND-reduce over probe rows then runs along the minor
        (lane) axis in R-sized segments, which measures ~1.5-2x faster
        than a row-major strided reduce (docs/performance.md).  The
        one-time transpose here costs a single pass over the table.
        """
        t3 = self.table.reshape(
            self.num_blocks, self.rows_per_block, self.class_words
        )
        return np.ascontiguousarray(t3.transpose(0, 2, 1)).reshape(
            self.num_blocks, self.class_words * self.rows_per_block
        )
