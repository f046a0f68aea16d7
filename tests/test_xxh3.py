"""XXH3-64 parity: our implementation vs the real C library.

The reference hashes canonical k-mer ASCII strings with
xxhash.xxh3_64_intdigest (reference:
src/xspect/models/probabilistic_single_filter_model.py:88,157); these
tests pin our scalar spec and vectorized batch implementation
bit-identical to that exact library across every XXH3 length path.
"""

import numpy as np
import pytest

xxhash = pytest.importorskip("xxhash")

from xspect2_tpu.core.xxh3 import xxh3_64, xxh3_64_batch


@pytest.mark.parametrize("length", [0, 1, 2, 3, 4, 7, 8, 9, 15, 16, 17,
                                    21, 31, 32, 63, 64, 96, 97, 128, 129,
                                    161, 239, 240])
@pytest.mark.parametrize("seed", [0, 1, 0xDEADBEEF12345678])
def test_scalar_matches_c_library(length, seed):
    rng = np.random.default_rng(length * 7 + (seed & 0xFF))
    data = bytes(rng.integers(0, 256, length, dtype=np.uint8))
    assert xxh3_64(data, seed) == xxhash.xxh3_64_intdigest(data, seed)


def test_kmer_strings_match_reference_hash():
    """ACGT k-mer strings at the reference's k=21 (species/genus) and
    k=31 (MLST) — the exact inputs the genus Bloom filter hashes."""
    rng = np.random.default_rng(3)
    for k in (21, 31):
        for _ in range(200):
            kmer = "".join(rng.choice(list("ACGT"), k))
            assert xxh3_64(kmer.encode()) == xxhash.xxh3_64_intdigest(kmer)


@pytest.mark.parametrize("length", [4, 5, 8, 9, 16, 17, 21, 31, 64, 96,
                                    128, 129, 160, 240])
def test_batch_matches_scalar_and_library(length):
    rng = np.random.default_rng(length)
    arr = rng.integers(0, 256, (64, length), dtype=np.uint8)
    got = xxh3_64_batch(arr)
    want = np.array(
        [xxhash.xxh3_64_intdigest(bytes(row)) for row in arr],
        dtype=np.uint64,
    )
    np.testing.assert_array_equal(got, want)


def test_batch_seeded():
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (16, 21), dtype=np.uint8)
    seed = 123456789
    got = xxh3_64_batch(arr, seed)
    want = np.array(
        [xxhash.xxh3_64_intdigest(bytes(row), seed) for row in arr],
        dtype=np.uint64,
    )
    np.testing.assert_array_equal(got, want)


def test_native_matches_library():
    """The C++ xs_xxh3_64 (native/src/xspect_native.cpp) agrees with the
    real library and the numpy batch across length paths and seeds."""
    from xspect2_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(21)
    for length in (4, 8, 9, 16, 21, 31, 64, 128, 129, 240):
        arr = rng.integers(0, 256, (64, length), dtype=np.uint8)
        want = np.array(
            [xxhash.xxh3_64_intdigest(bytes(r)) for r in arr], dtype=np.uint64
        )
        np.testing.assert_array_equal(native.xxh3_64_batch(arr), want)
        np.testing.assert_array_equal(xxh3_64_batch(arr), want)
    arr = rng.integers(0, 256, (16, 31), dtype=np.uint8)
    seed = 987654321
    want = np.array(
        [xxhash.xxh3_64_intdigest(bytes(r), seed) for r in arr], dtype=np.uint64
    )
    np.testing.assert_array_equal(native.xxh3_64_batch(arr, seed), want)


def test_batch_rejects_bad_shapes():
    with pytest.raises(ValueError):
        xxh3_64_batch(np.zeros(8, dtype=np.uint8))
    with pytest.raises(ValueError):
        xxh3_64_batch(np.zeros((4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        xxh3_64_batch(np.zeros((4, 241), dtype=np.uint8))
