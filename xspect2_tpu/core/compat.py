"""XXH3 reference-hash-family compatibility path (genus Bloom filter).

The reference's genus model inserts the ASCII string of each canonical
k-mer into an rbloom Bloom filter keyed by ``xxh3_64_intdigest``
(reference: src/xspect/models/probabilistic_single_filter_model.py:88,
155-158).  This module is the production caller for the pinned XXH3-64
implementation in :mod:`xspect2_tpu.core.xxh3`:

1. :func:`ascii_from_packed` reconstructs the exact ASCII byte stream of
   each canonical k-mer from its packed 2-bit ``(hi, lo)`` words — the
   byte-parity hard part flagged in SURVEY.md §7 ("rbloom hashes the
   ASCII string of the canonical k-mer").
2. :func:`kmer_digests` hashes those byte rows with the vectorized
   XXH3-64 (bit-identical to the real xxhash C library,
   tests/test_xxh3.py).
3. :func:`derive_probe_positions` maps a digest to Bloom bit positions.
   This is the ONE remaining unverifiable-offline piece: rbloom derives
   its probe indexes inside Rust and neither rbloom nor a golden dump is
   available in this environment (PARITY.md "Parity oracle status").
   The default here is Kirsch-Mitzenmacher double hashing over the
   64-bit digest; it is a module-level hook so the real mapping can be
   dropped in the moment ``tools/make_hash_goldens.py`` can run.

:class:`XXH3BloomFilter` packages these into a filter with host-side
insert (index build is a host job) and a device-side membership count
(host hashes, device gathers words and tests bits) so compat-mode
queries still run through the chip.  This is a verification/parity
mode, not the throughput path — the blocked bit-sliced index stays the
production default (docs/performance.md "Index geometry").

Known parity gap — ambiguous bases ('N').  The reference's
``_generate_kmers`` yields EVERY window, including ones containing
non-ACGT bases: an 'N'-bearing k-mer string is inserted at fit and
looked up at query as a literal string (reference:
src/xspect/models/probabilistic_single_filter_model.py:161-180), so a
training subsequence containing N still scores 1.0 there.  This filter
packs k-mers 2-bit and therefore skips invalid windows on BOTH insert
and query (the denominator still counts all windows, matching the
reference's ``_count_kmers``), so the same input scores <1.0 here.
Real genome queries are unaffected in practice (an N-window miss is
indistinguishable from an ordinary non-member k-mer); for golden
score comparison on N-containing inputs a host-side raw-byte-string
hash path would be needed.  Recorded in PARITY.md (compat row).
"""

import json
import math
from pathlib import Path

import numpy as np

from xspect2_tpu.core import dna
from xspect2_tpu.core.xxh3 import xxh3_64_batch

_U64 = np.uint64
_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def ascii_from_packed(hi: np.ndarray, lo: np.ndarray, k: int) -> np.ndarray:
    """ASCII bytes ``[n, k]`` of packed big-endian 2-bit k-mers.

    Inverts :func:`xspect2_tpu.core.dna.pack_kmers`'s layout: ``lo``
    holds the last ``min(k, 16)`` bases, ``hi`` the leading ones.
    """
    if not 1 <= k <= 32:
        raise ValueError("k must be in [1, 32]")
    hi = np.asarray(hi, dtype=np.uint32)
    lo = np.asarray(lo, dtype=np.uint32)
    lo_bases = min(k, 16)
    hi_bases = k - lo_bases
    out = np.empty((len(hi), k), dtype=np.uint8)
    for j in range(hi_bases):
        shift = np.uint32(2 * (hi_bases - 1 - j))
        out[:, j] = dna.DECODE_LUT[(hi >> shift) & np.uint32(3)]
    for j in range(lo_bases):
        shift = np.uint32(2 * (lo_bases - 1 - j))
        out[:, hi_bases + j] = dna.DECODE_LUT[(lo >> shift) & np.uint32(3)]
    return out


def kmer_digests(hi: np.ndarray, lo: np.ndarray, k: int) -> np.ndarray:
    """XXH3-64 digests (uint64 ``[n]``) of the ASCII canonical k-mers.

    Byte-identical input to the reference's
    ``xxh3_64_intdigest(str(kmer))`` call.
    """
    return xxh3_64_batch(ascii_from_packed(hi, lo, k))


def derive_probe_positions(
    digests: np.ndarray, num_bits: int, num_hashes: int
) -> np.ndarray:
    """Bloom bit positions ``[n, num_hashes]`` from 64-bit digests.

    Kirsch-Mitzenmacher double hashing: ``pos_i = (h1 + i*h2) % m`` with
    ``h1`` the digest and ``h2`` an odd value mixed from its high bits.
    Self-consistent between insert and query; pending replacement by
    rbloom's exact in-Rust derivation once goldens exist (see module
    docstring).
    """
    d = np.asarray(digests, dtype=np.uint64)
    old = np.seterr(over="ignore")
    try:
        h2 = ((d >> _U64(33)) ^ (d << _U64(29))) | _U64(1)
        i = np.arange(num_hashes, dtype=np.uint64)
        pos = (d[:, None] + i[None, :] * h2[:, None]) % _U64(num_bits)
    finally:
        np.seterr(**old)
    return pos


def rbloom_geometry(num_items: int, fpr: float) -> tuple[int, int]:
    """(num_bits, num_hashes) the way ``Bloom(n, fpr)`` sizes itself.

    The classic optimum: ``m = -n ln p / (ln 2)^2`` bits and
    ``k = round(m/n * ln 2)`` probes (the reference model's own
    ``num_hashes=1`` attribute is metadata only — rbloom derives the
    real probe count internally, reference:
    src/xspect/models/probabilistic_single_filter_model.py:58,88).
    """
    n = max(1, int(num_items))
    m = max(64, int(math.ceil(-n * math.log(fpr) / (math.log(2.0) ** 2))))
    h = max(1, round(m / n * math.log(2.0)))
    return m, h


def _next_pow2(n: int) -> int:
    return 1 << max(0, (int(n) - 1).bit_length())


class XXH3BloomFilter:
    """Flat Bloom filter over XXH3-64 of ASCII canonical k-mers.

    Host insert + device membership count.  Words are uint32 so the
    device side tests bits with one gather per probe.
    """

    def __init__(self, num_bits: int, num_hashes: int, k: int) -> None:
        if num_bits <= 0 or num_hashes <= 0:
            raise ValueError("num_bits and num_hashes must be positive")
        if not 4 <= int(k) <= 32:
            # the vectorized XXH3 batch path covers input lengths 4..240
            # and the 2-bit packing tops out at 32 bases; fail at
            # construction with the k constraint, not at first insert
            # with an unrelated-sounding length error
            raise ValueError(
                f"XXH3BloomFilter supports 4 <= k <= 32, got k={k}"
            )
        self.num_bits = int(num_bits)
        self.num_hashes = int(num_hashes)
        self.k = int(k)
        self.words = np.zeros((self.num_bits + 31) // 32, dtype=np.uint32)
        self._device = None  # (jitted count fn, device table)

    @classmethod
    def for_items(cls, num_items: int, fpr: float, k: int) -> "XXH3BloomFilter":
        bits, hashes = rbloom_geometry(num_items, fpr)
        return cls(bits, hashes, k)

    # ------------------------------------------------------------- build
    def insert_packed(
        self, hi: np.ndarray, lo: np.ndarray, valid: np.ndarray
    ) -> None:
        """Insert packed canonical k-mers (host side; invalid rows skipped)."""
        valid = np.asarray(valid, dtype=bool)
        if not valid.any():
            return
        pos = derive_probe_positions(
            kmer_digests(hi[valid], lo[valid], self.k),
            self.num_bits,
            self.num_hashes,
        ).ravel()
        np.bitwise_or.at(
            self.words,
            (pos >> _U64(5)).astype(np.int64),
            np.uint32(1) << (pos & _U64(31)).astype(np.uint32),
        )
        self._device = None

    def insert_sequence(self, seq: str | bytes) -> None:
        hi, lo, valid = dna.canonical_kmers(dna.encode(seq), self.k)
        self.insert_packed(hi, lo, valid)

    # ------------------------------------------------------------- query
    def _positions(self, hi, lo, valid):
        pos = np.zeros((len(hi), self.num_hashes), dtype=np.uint64)
        valid = np.asarray(valid, dtype=bool)
        if valid.any():
            pos[valid] = derive_probe_positions(
                kmer_digests(hi[valid], lo[valid], self.k),
                self.num_bits,
                self.num_hashes,
            )
        return pos

    def count_hits_host(self, hi, lo, valid) -> int:
        """Number of valid k-mers whose probe bits are all set (numpy)."""
        pos = self._positions(hi, lo, valid)
        bits = (
            self.words[(pos >> _U64(5)).astype(np.int64)]
            >> (pos & _U64(31)).astype(np.uint32)
        ) & np.uint32(1)
        return int(np.sum(bits.all(axis=1) & np.asarray(valid, dtype=bool)))

    def count_hits_device(self, hi, lo, valid) -> int:
        """Same count with the bit tests on the accelerator.

        Hashing stays on host (XXH3 over ASCII bytes is a host-friendly
        byte pipeline); the device gathers filter words and AND-reduces
        the probe bits.  Pads the k-mer axis to a power of two so the
        program re-compiles O(log n) times, not per length.
        """
        import jax
        import jax.numpy as jnp

        if self._device is None:

            def count(table, pos, valid_row):
                word = table[(pos >> jnp.uint32(5)).astype(jnp.int32)]
                bit = (word >> (pos & jnp.uint32(31))) & jnp.uint32(1)
                hit = jnp.min(bit, axis=1).astype(jnp.bool_) & valid_row
                return jnp.sum(hit.astype(jnp.int32))

            self._device = (jax.jit(count), jax.device_put(self.words))
        fn, table = self._device

        pos = self._positions(hi, lo, valid).astype(np.uint32)  # bits < 2**32 in practice
        if self.num_bits > 0xFFFFFFFF:
            raise NotImplementedError("filters beyond 2^32 bits: shard first")
        n = len(pos)
        n_pad = _next_pow2(max(1, n))
        pad_pos = np.zeros((n_pad, self.num_hashes), dtype=np.uint32)
        pad_pos[:n] = pos
        pad_valid = np.zeros(n_pad, dtype=bool)
        pad_valid[:n] = np.asarray(valid, dtype=bool)
        return int(fn(table, pad_pos, pad_valid))

    def count_hits_sequence(self, seq: str | bytes, device: bool = True) -> int:
        hi, lo, valid = dna.canonical_kmers(dna.encode(seq), self.k)
        if device:
            return self.count_hits_device(hi, lo, valid)
        return self.count_hits_host(hi, lo, valid)

    # ------------------------------------------------------- persistence
    def save(self, path: Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            path,
            words=self.words,
            meta=np.frombuffer(
                json.dumps(
                    {
                        "format": "xxh3-bloom-v1",
                        "num_bits": self.num_bits,
                        "num_hashes": self.num_hashes,
                        "k": self.k,
                    }
                ).encode("utf-8"),
                dtype=np.uint8,
            ),
        )

    @classmethod
    def load(cls, path: Path) -> "XXH3BloomFilter":
        with np.load(path) as z:
            meta = json.loads(bytes(z["meta"]).decode("utf-8"))
            if meta.get("format") != "xxh3-bloom-v1":
                raise ValueError(f"not an xxh3 compat filter: {path}")
            f = cls(meta["num_bits"], meta["num_hashes"], meta["k"])
            f.words = z["words"].astype(np.uint32)
        return f
