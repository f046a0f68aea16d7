"""Blocked bit-sliced signature index — the TPU-native COBS/Bloom equivalent.

Layout
------
A dense bit matrix of ``[num_blocks * rows_per_block * fields_per_word]``
signature rows x ``C`` class-bit columns, stored as uint32 words
``[num_blocks, rows_per_block * class_words]``:

- With ``C > 16`` (``fields_per_word == 1``) one word per row per 32
  classes (``class_words = ceil(C / 32)``), exactly COBS's bit-sliced
  layout grouped into fixed-size blocks.
- With ``C <= 16`` a plain word would waste ``32 - C`` of its bits, so
  ``fields_per_word = 32 // field_bits`` signature rows pack into each
  word (``field_bits`` = smallest power of two >= C).  For the typical
  8-class species model this makes the resident table 4x smaller — which
  is the difference between the fast and slow regime of the TPU's
  row-gather path (the measured ~100→200 MB cliff, docs/performance.md)
  — and 32x smaller for single-class genus Bloom filters.

All ``num_hashes`` probes of a k-mer live in one block (typically 512 B
= one (1, 128) lane-tile row), so a membership query costs a single
contiguous gather per k-mer followed by in-register row selection, AND
across probes, and per-class bit accumulation.  Probe ``i`` sits in word
``(b + i*c) & (rows_per_block-1)`` at field ``(g + i) & (P-1)`` (see
core/hashing.py::block_words_fieldbase), so the device query aligns
fields with ``min(num_hashes, P)`` static-shift AND-reduce passes plus
one cheap variable rotate per pass.

Semantics match the reference's index contract (reference:
src/xspect/models/probabilistic_filter_model.py:196-235): per class, the
hit count of a query sequence is the number of its k-mers whose probe
bits are all set in that class's column; k-mers are canonicalized before
hashing; there are no false negatives.

Sizing uses the COBS signature-size formula per class (for the largest
class) with a configurable oversizing factor that compensates for the
slightly higher false-positive rate of blocked addressing.  With
``num_hashes=None`` the probe count is chosen automatically: fewer
probes mean fewer device passes but a larger table at equal fpr, so the
picker minimizes a measured-constant cost model that penalizes tables
above the fast-gather budget (docs/performance.md).
"""

import json
import math
import os
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
    """Words per block per class-word so one block is ~target_block_bytes."""
    rows = target_block_bytes // (class_words * 4)
    rows = max(8, rows)
    # round down to power of two
    return 1 << (rows.bit_length() - 1)


def default_fields_per_word(num_classes: int) -> int:
    """Signature rows per uint32 word: 32 // (smallest pow2 >= C), min 1."""
    if num_classes > 16:
        return 1
    fb = 1
    while fb < num_classes:
        fb *= 2
    return 32 // fb


def pick_num_hashes(
    num_kmers: int,
    fpr: float,
    num_classes: int,
    target_block_bytes: int = 512,
    size_factor: float = 1.3,
    budget_bytes: int | None = None,
    fields_per_word: int | None = None,
) -> int:
    """Choose the probe count that minimizes estimated per-k-mer cost.

    At a fixed fpr the signature size m(h) is minimal at the classic
    optimum (h=7 for fpr=0.01) and grows as h shrinks, while the device
    query body runs ``h`` row-select compares plus ``min(h, P)``
    AND-reduce passes over the gathered block.  Constants are measured
    on v5e (tools/microbench_fields.py, tools/microbench_sorted_gather.py):
    ~0.42 ns/k-mer per body pass; ~3.4 ns/k-mer gather below the
    fast-table budget; a FLAT ~12.3 ns (81 M rows/s) beyond it — the
    slow regime is a hard mode switch, not size-graded (200/400/800 MB
    all measure 80-83 M rows/s, and index order does not matter).  The
    budget default comes from a direct scan of the gather-rate cliff:
    ~210-220 M rows/s up to 110 MB, ~79 M from 120 MB (sharp edge
    between 110 and 120 MB, docs/performance.md), so 108 MB keeps a
    small safety margin.  E.g. the 8-class headline config picks h=2
    (99 MB, 1.63 M reads/s) over h=3 (65 MB, 1.41 M) and h=7 (50 MB,
    0.97 M).  When EVERY candidate exceeds the budget the measured rate
    is h-independent (520-539 k reads/s at h in {2,3,4,7} on the
    40-class geometry — the body hides behind the gather stream), so
    the picker takes the smallest table (the classic optimum, h=7):
    same speed, least HBM, and the finest block-sharding granularity.
    """
    if budget_bytes is None:
        budget_bytes = int(os.environ.get("XSPECT_FAST_TABLE_BYTES", 108_000_000))
    class_words = max(1, (num_classes + 31) // 32)
    if fields_per_word is None:
        fields_per_word = (
            default_fields_per_word(num_classes) if class_words == 1 else 1
        )
    P = fields_per_word
    rpb = default_rows_per_block(class_words, target_block_bytes)
    best = None  # (cost, nbytes, h): bytes break cost ties
    for h in (2, 3, 4, 5, 7):
        bits = int(math.ceil(cobs_signature_bits(num_kmers, fpr, h) * size_factor))
        num_blocks = max(16, -(-bits // (rpb * P)))
        nbytes = num_blocks * rpb * class_words * 4
        if nbytes <= budget_bytes:
            passes = h + min(h, P)
            cost = 0.42 * passes + 3.4
        else:
            cost = 12.3  # flat slow regime: h-independent, prefer small
        if best is None or (cost, nbytes) < (best[0], best[1]):
            best = (cost, nbytes, h)
    return best[2]


class BlockedBitSlicedIndex:
    """Dense blocked bit-sliced signature index over C classes."""

    FORMAT_VERSION = 2

    def __init__(
        self,
        k: int,
        class_names: list[str],
        num_blocks: int,
        rows_per_block: int,
        num_hashes: int,
        fpr: float,
        table: np.ndarray | None = None,
        fields_per_word: int = 1,
    ):
        if rows_per_block & (rows_per_block - 1):
            raise ValueError("rows_per_block must be a power of two")
        if fields_per_word & (fields_per_word - 1):
            raise ValueError("fields_per_word must be a power of two")
        self.k = k
        self.class_names = list(class_names)
        self.num_classes = len(self.class_names)
        self.class_words = max(1, (self.num_classes + 31) // 32)
        if fields_per_word > 1:
            if self.class_words != 1:
                raise ValueError("fields_per_word > 1 requires <= 32 classes")
            if self.num_classes * fields_per_word > 32:
                raise ValueError(
                    "fields_per_word * num_classes must fit one uint32 word"
                )
        self.fields_per_word = int(fields_per_word)
        self.field_bits = 32 // self.fields_per_word
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
        num_hashes: int | None = 7,
        size_factor: float | None = None,
        target_block_bytes: int = 512,
        fields_per_word: int | None = None,
    ) -> "BlockedBitSlicedIndex":
        """Allocate an empty index sized for ``max_kmers_per_class`` items/class.

        ``num_hashes=None`` picks the probe count automatically (see
        :func:`pick_num_hashes`); ``fields_per_word=None`` packs as many
        signature rows per word as the class count allows.
        """
        num_classes = len(class_names)
        class_words = max(1, (num_classes + 31) // 32)
        if fields_per_word is None:
            fields_per_word = (
                default_fields_per_word(num_classes) if class_words == 1 else 1
            )
        if num_hashes is None:
            # the picker must model the geometry actually built: an
            # explicit fields_per_word override changes table bytes up
            # to 32x and with it the speed-optimal probe count
            num_hashes = pick_num_hashes(
                max_kmers_per_class,
                fpr,
                num_classes,
                target_block_bytes=target_block_bytes,
                size_factor=1.3 if size_factor is None else size_factor,
                fields_per_word=fields_per_word,
            )
        if size_factor is None:
            size_factor = 1.0 if num_hashes == 1 else 1.3
        rows_per_block = default_rows_per_block(class_words, target_block_bytes)
        bits = cobs_signature_bits(max_kmers_per_class, fpr, num_hashes)
        bits = int(math.ceil(bits * size_factor))
        num_blocks = max(16, -(-bits // (rows_per_block * fields_per_word)))
        return cls(
            k,
            class_names,
            num_blocks,
            rows_per_block,
            num_hashes,
            fpr,
            fields_per_word=fields_per_word,
        )

    def _probe_words_bits(self, hi: np.ndarray, lo: np.ndarray, class_idx: int):
        """Flat word indices [n, h] and per-probe bit masks for one class."""
        block, words, g = hashing.block_words_fieldbase(
            hi,
            lo,
            self.num_blocks,
            self.rows_per_block,
            self.num_hashes,
            self.fields_per_word,
            xp=np,
        )
        base = block.astype(np.int64) * self.rows_per_block
        if self.fields_per_word == 1:
            word_of_class = class_idx // 32
            flat = (
                (base[:, None] + words.astype(np.int64)) * self.class_words
                + word_of_class
            )
            bits = np.broadcast_to(
                np.uint32(1) << np.uint32(class_idx % 32), flat.shape
            )
            return flat, bits
        i = np.arange(self.num_hashes, dtype=np.uint32)
        fields = (g[:, None] + i) & np.uint32(self.fields_per_word - 1)
        flat = base[:, None] + words.astype(np.int64)  # class_words == 1
        bits = np.uint32(1) << (
            fields * np.uint32(self.field_bits) + np.uint32(class_idx)
        )
        return flat, bits

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
        flat, bits = self._probe_words_bits(hi, lo, class_idx)
        np.bitwise_or.at(self.table, flat.reshape(-1), bits.reshape(-1))

    # ------------------------------------------------------------------ query (host reference)

    def membership_host(self, hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
        """Reference (numpy) membership query: [n, C] uint8 bit matrix."""
        if hi.size == 0:
            return np.zeros((0, self.num_classes), dtype=np.uint8)
        block, words, g = hashing.block_words_fieldbase(
            hi,
            lo,
            self.num_blocks,
            self.rows_per_block,
            self.num_hashes,
            self.fields_per_word,
            xp=np,
        )
        base_row = block.astype(np.int64) * self.rows_per_block
        if self.fields_per_word == 1:
            # gather words for each (kmer, hash) probe: [n, h, class_words]
            word_idx = (
                (base_row[:, None] + words.astype(np.int64))[:, :, None]
                * self.class_words
                + np.arange(self.class_words, dtype=np.int64)[None, None, :]
            )
            probes = self.table[word_idx]
            anded = probes[:, 0, :]
            for h in range(1, self.num_hashes):
                anded = anded & probes[:, h, :]
            cls = np.arange(self.num_classes)
            bits = (anded[:, cls // 32] >> (cls % 32).astype(np.uint32)) & np.uint32(1)
            return bits.astype(np.uint8)
        # field-packed: align each probe's field before the AND
        i = np.arange(self.num_hashes, dtype=np.uint32)
        fields = (g[:, None] + i) & np.uint32(self.fields_per_word - 1)
        probes = self.table[base_row[:, None] + words.astype(np.int64)]  # [n, h]
        field_mask = np.uint32((1 << self.field_bits) - 1)
        aligned = (probes >> (fields * np.uint32(self.field_bits))) & field_mask
        anded = aligned[:, 0]
        for h in range(1, self.num_hashes):
            anded = anded & aligned[:, h]
        cls = np.arange(self.num_classes, dtype=np.uint32)
        bits = (anded[:, None] >> cls[None, :]) & np.uint32(1)
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
            "fields_per_word": self.fields_per_word,
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
            # format v1 predates field packing
            fields_per_word=meta.get("fields_per_word", 1),
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
        (With class_words == 1 — always the case when fields_per_word
        > 1 — the transpose is the identity.)
        """
        t3 = self.table.reshape(
            self.num_blocks, self.rows_per_block, self.class_words
        )
        return np.ascontiguousarray(t3.transpose(0, 2, 1)).reshape(
            self.num_blocks, self.class_words * self.rows_per_block
        )
