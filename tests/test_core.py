"""Core unit tests: encoding, packing, hashing, blocked index (host path)."""

import numpy as np
import pytest

from xspect2_tpu.core import dna, hashing
from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex, cobs_signature_bits
from tests.conftest import random_dna


def _pack_str(kmer: str) -> tuple[int, int]:
    """Straightforward big-endian 2-bit packing of a k-mer string."""
    k = len(kmer)
    lo_bases = min(k, 16)
    hi_bases = k - lo_bases
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    hi = 0
    lo = 0
    for ch in kmer[:hi_bases]:
        hi = (hi << 2) | code[ch]
    for ch in kmer[hi_bases:]:
        lo = (lo << 2) | code[ch]
    return hi, lo


def test_encode_decode_roundtrip():
    seq = "ACGTacgtNNRYT"
    codes = dna.encode(seq)
    assert list(codes[:8]) == [0, 1, 2, 3, 0, 1, 2, 3]
    assert all(c == dna.INVALID for c in codes[8:11])
    assert dna.decode(codes) == "ACGTACGTNNNNT"


def test_pack_kmers_matches_string_packing(rng):
    seq = random_dna(rng, 300)
    for k in (5, 16, 21, 31, 32):
        hi, lo, valid = dna.pack_kmers(dna.encode(seq), k)
        assert valid.all()
        for i in (0, 1, 7, len(hi) - 1):
            h, l = _pack_str(seq[i : i + k])
            assert (int(hi[i]), int(lo[i])) == (h, l)


def test_pack_kmers_invalid_and_short():
    codes = dna.encode("ACGTNACGTACGTACGTACGTACGTA")
    hi, lo, valid = dna.pack_kmers(codes, 21)
    # windows covering position 4 (N) are invalid
    assert not valid[0]
    assert valid[5]
    # shorter than k
    hi, lo, valid = dna.pack_kmers(dna.encode("ACGT"), 21)
    assert len(hi) == 0


def test_canonical_kmers_match_string_min(rng):
    seq = random_dna(rng, 200)
    for k in (21, 31):
        hi, lo, valid = dna.canonical_kmers(dna.encode(seq), k)
        for i in (0, 3, 50, len(hi) - 1):
            kmer = seq[i : i + k]
            canon = min(kmer, dna.decode(dna.revcomp_codes(dna.encode(kmer))))
            assert (int(hi[i]), int(lo[i])) == _pack_str(canon)


def test_canonical_step_sampling(rng):
    seq = random_dna(rng, 500)
    h1, l1, v1 = dna.canonical_kmers(dna.encode(seq), 21, step=1)
    h5, l5, v5 = dna.canonical_kmers(dna.encode(seq), 21, step=5)
    np.testing.assert_array_equal(h5, h1[::5])
    np.testing.assert_array_equal(l5, l1[::5])


def test_hashing_numpy_jax_bit_identical(rng):
    import jax.numpy as jnp

    hi = rng.integers(0, 2**32, size=1000, dtype=np.uint32)
    lo = rng.integers(0, 2**32, size=1000, dtype=np.uint32)
    b_np, r_np = hashing.block_and_rows(hi, lo, 12345, 128, 7, xp=np)
    b_j, r_j = hashing.block_and_rows(jnp.asarray(hi), jnp.asarray(lo), 12345, 128, 7, xp=jnp)
    np.testing.assert_array_equal(b_np, np.asarray(b_j))
    np.testing.assert_array_equal(r_np, np.asarray(r_j))


def test_cobs_signature_bits():
    # fpr=0.01, h=7 => ~9.6 bits per element
    m = cobs_signature_bits(1_000_000, 0.01, 7)
    assert 9.0e6 < m < 10.5e6


def test_blocked_index_no_false_negatives_and_fpr(rng):
    k = 21
    n = 20000
    seq = random_dna(rng, n + k - 1)
    hi, lo, valid = dna.canonical_kmers(dna.encode(seq), k)
    idx = BlockedBitSlicedIndex.create(k, ["c0"], n, fpr=0.01, num_hashes=7)
    idx.insert_kmers(0, hi, lo)

    # no false negatives
    bits = idx.membership_host(hi, lo)
    assert bits.all()

    # false-positive rate within 2x nominal on disjoint random kmers
    other = random_dna(np.random.default_rng(999), 60000 + k - 1)
    ohi, olo, _ = dna.canonical_kmers(dna.encode(other), k)
    obits = idx.membership_host(ohi, olo)
    measured = obits.mean()
    assert measured < 0.02, f"measured fpr {measured}"


def test_blocked_index_multiclass_and_roundtrip(tmp_path, rng):
    k = 21
    seqs = {f"class{i}": random_dna(rng, 3000) for i in range(5)}
    names = sorted(seqs)
    idx = BlockedBitSlicedIndex.create(k, names, 3000, fpr=0.01, num_hashes=7)
    packed = {}
    for ci, name in enumerate(names):
        hi, lo, v = dna.canonical_kmers(dna.encode(seqs[name]), k)
        packed[name] = (hi, lo)
        idx.insert_kmers(ci, hi, lo)

    for ci, name in enumerate(names):
        hi, lo = packed[name]
        counts = idx.count_hits_host(hi, lo)
        assert counts[ci] == len(hi)  # own kmers all hit
        other = [counts[j] for j in range(5) if j != ci]
        assert max(other) < 0.05 * len(hi)  # cross-class hits are noise-level

    idx.save(tmp_path / "index.bbsi")
    idx2 = BlockedBitSlicedIndex.load(tmp_path / "index.bbsi")
    assert idx2.class_names == names
    np.testing.assert_array_equal(idx.table, idx2.table)
    hi, lo = packed[names[0]]
    np.testing.assert_array_equal(
        idx.count_hits_host(hi, lo), idx2.count_hits_host(hi, lo)
    )


def test_field_packed_index_fpr_and_roundtrip(tmp_path, rng):
    """Field packing (P signature rows per word for C <= 16) preserves
    the fpr contract and the on-disk roundtrip (format v2)."""
    k = 21
    n = 50000
    names = ["a", "b", "c"]
    idx = BlockedBitSlicedIndex.create(k, names, n, fpr=0.01, num_hashes=None)
    assert idx.fields_per_word == 8  # field_bits = 4 for C=3
    kept = {}
    for ci, name in enumerate(names):
        seq = random_dna(np.random.default_rng(100 + ci), n + k - 1)
        hi, lo, v = dna.canonical_kmers(dna.encode(seq), k)
        kept[name] = (hi[v], lo[v])
        idx.insert_kmers(ci, hi, lo, v)

    # no false negatives
    for ci, name in enumerate(names):
        hi, lo = kept[name]
        assert idx.membership_host(hi, lo)[:, ci].all()

    # measured fpr within nominal on disjoint random kmers
    probe = random_dna(np.random.default_rng(999), 100000 + k - 1)
    phi, plo, pv = dna.canonical_kmers(dna.encode(probe), k)
    measured = idx.membership_host(phi[pv], plo[pv]).mean()
    assert measured < 0.011, f"measured fpr {measured}"

    idx.save(tmp_path / "fp.bbsi")
    idx2 = BlockedBitSlicedIndex.load(tmp_path / "fp.bbsi")
    assert idx2.fields_per_word == 8
    hi, lo = kept["b"]
    np.testing.assert_array_equal(
        idx.membership_host(hi, lo), idx2.membership_host(hi, lo)
    )


def test_pick_num_hashes_policy():
    """Auto probe count: min passes under the fast-table budget; falls
    back toward the size-optimal h=7 when low-h tables cross the cliff."""
    from xspect2_tpu.core.blocked_index import pick_num_hashes

    # tiny index: everything fits the budget -> fewest passes (h=2)
    assert pick_num_hashes(10_000, 0.01, 8) == 2
    # headline config (4M kmers/class, 8 classes): h=2 at ~99MB fits the
    # 108MB fast budget (cliff measured between 110 and 120MB) -> h=2
    assert pick_num_hashes(4_000_000, 0.01, 8) == 2
    # 1.4x more kmers: h=2 crosses the cliff, h=3 at ~91MB fits -> h=3
    assert pick_num_hashes(5_600_000, 0.01, 8) == 3
    # huge index: nothing fits -> the least-bytes-per-element choice
    # keeps the size-cost growth smallest (h=7)
    assert pick_num_hashes(200_000_000, 0.01, 8) == 7


def test_format_v1_load_compat(tmp_path, rng):
    """Indices saved before field packing (no fields_per_word key) load
    with P=1 and identical semantics."""
    import json as _json

    k = 21
    seq = random_dna(rng, 3000)
    hi, lo, v = dna.canonical_kmers(dna.encode(seq), k)
    idx = BlockedBitSlicedIndex.create(
        k, ["x"], 3000, fpr=0.01, num_hashes=4, fields_per_word=1
    )
    idx.insert_kmers(0, hi, lo, v)
    idx.save(tmp_path / "v1.bbsi")
    meta_path = tmp_path / "v1.bbsi" / "index_meta.json"
    meta = _json.loads(meta_path.read_text())
    meta.pop("fields_per_word")
    meta["format_version"] = 1
    meta_path.write_text(_json.dumps(meta))
    idx2 = BlockedBitSlicedIndex.load(tmp_path / "v1.bbsi")
    assert idx2.fields_per_word == 1
    np.testing.assert_array_equal(
        idx.count_hits_host(hi, lo, v), idx2.count_hits_host(hi, lo, v)
    )


def test_pick_num_hashes_respects_fields_override():
    """An explicit fields_per_word=1 multiplies table bytes up to 32x;
    the picker must model the geometry actually built."""
    from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex, pick_num_hashes

    # packed: h=2 fits the budget; unpacked: every candidate is over it
    # (h=2 would be ~395MB) so the picker moves to a high-probe choice
    assert pick_num_hashes(4_000_000, 0.01, 8) == 2
    h_unpacked = pick_num_hashes(4_000_000, 0.01, 8, fields_per_word=1)
    assert h_unpacked >= 5
    idx = BlockedBitSlicedIndex.create(
        21, [f"c{i}" for i in range(8)], 4_000_000, num_hashes=None,
        fields_per_word=1,
    )
    assert idx.num_hashes == h_unpacked


def test_bench_trimmed_median_guards_outliers():
    """bench.py's CPU-baseline denominator: outlier-trimmed median."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import trimmed_median

    # one stall sample and one burst sample must not move the median
    assert trimmed_median([100.0] * 18 + [1.0, 10_000.0]) == 100.0
    assert trimmed_median([1.0, 2.0, 3.0]) == 2.0
