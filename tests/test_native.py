"""Native library parity tests: C++ paths must bit-match the numpy paths."""

import numpy as np
import pytest

from xspect2_tpu import native
from xspect2_tpu.core import dna
from xspect2_tpu.core.blocked_index import BlockedBitSlicedIndex
from xspect2_tpu.io.fasta import SeqRecord, get_record_iterator, write_fasta
from tests.conftest import random_dna

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)


def test_native_canonical_kmers_match_numpy(rng):
    for k in (15, 21, 31, 32):
        seq = random_dna(rng, 3000)
        codes = dna.encode(seq)
        # sprinkle invalid bases
        codes = codes.copy()
        codes[100] = 255
        codes[2000:2003] = 255
        for step in (1, 3):
            n_hi, n_lo, n_valid = native.canonical_kmers(codes, k, step)
            p_hi, p_lo, p_valid = dna.canonical_kmers(codes, k, step)
            np.testing.assert_array_equal(n_valid, p_valid, err_msg=f"k={k}")
            np.testing.assert_array_equal(
                n_hi[n_valid], p_hi[p_valid], err_msg=f"k={k} step={step}"
            )
            np.testing.assert_array_equal(n_lo[n_valid], p_lo[p_valid])


def test_native_parse_fasta(tmp_path, rng):
    records = [
        SeqRecord(random_dna(rng, 250), id="chr1", description="chr1 first"),
        SeqRecord(random_dna(rng, 77) + "N" + random_dna(rng, 10), id="chr2"),
        SeqRecord(random_dna(rng, 5), id="tiny"),
    ]
    path = tmp_path / "t.fasta"
    write_fasta(records, path)

    codes, offsets, ids = native.parse_file(path)
    assert ids == ["chr1", "chr2", "tiny"]
    assert len(offsets) == 4
    for i, rec in enumerate(records):
        got = codes[offsets[i] : offsets[i + 1]]
        np.testing.assert_array_equal(got, dna.encode(rec.seq), err_msg=rec.id)


def test_native_parse_fastq(tmp_path, rng):
    seqs = [random_dna(rng, 150) for _ in range(5)]
    path = tmp_path / "t.fastq"
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f"@read{i} extra info\n{s}\n+\n{'I' * len(s)}\n")
    codes, offsets, ids = native.parse_file(path)
    assert ids == [f"read{i}" for i in range(5)]
    for i, s in enumerate(seqs):
        np.testing.assert_array_equal(
            codes[offsets[i] : offsets[i + 1]], dna.encode(s)
        )


def test_native_insert_and_count_match_numpy(rng):
    k = 21
    names = [f"c{i}" for i in range(5)]
    seqs = {n: random_dna(rng, 4000) for n in names}

    idx_np = BlockedBitSlicedIndex.create(k, names, 4000, fpr=0.01, num_hashes=7)
    idx_nat = BlockedBitSlicedIndex.create(k, names, 4000, fpr=0.01, num_hashes=7)
    for ci, n in enumerate(names):
        codes = dna.encode(seqs[n])
        hi, lo, v = dna.canonical_kmers(codes, k)
        idx_np.insert_kmers(ci, hi, lo, v)
        native.insert_kmers(idx_nat, ci, codes, num_threads=4)

    np.testing.assert_array_equal(idx_np.table, idx_nat.table)

    probe = dna.encode(seqs["c2"][100:800] + "N" + random_dna(rng, 200))
    for step in (1, 4):
        hi, lo, v = dna.canonical_kmers(probe, k, step=step)
        expected = idx_np.count_hits_host(hi, lo, v)
        got = native.count_hits(idx_nat, probe, step=step)
        np.testing.assert_array_equal(got, expected, err_msg=f"step={step}")


def test_native_threaded_insert_boundary(rng):
    """Thread-split window ownership must not lose or duplicate k-mers."""
    k = 31
    seq = random_dna(rng, 3_000_000)  # large enough to trigger threading
    codes = dna.encode(seq)
    idx1 = BlockedBitSlicedIndex.create(k, ["a"], len(seq), fpr=0.01, num_hashes=3)
    idx2 = BlockedBitSlicedIndex.create(k, ["a"], len(seq), fpr=0.01, num_hashes=3)
    native.insert_kmers(idx1, 0, codes, num_threads=1)
    native.insert_kmers(idx2, 0, codes, num_threads=4)
    np.testing.assert_array_equal(idx1.table, idx2.table)


def test_stale_abi_library_is_refused(tmp_path):
    """A prebuilt .so from another commit must be rejected, not miscalled.

    Signatures changed in place across commits (fields_per_word was
    inserted mid-argument-list); calling a stale binary with the new
    argtypes would silently corrupt indices.  The loader handshakes via
    xs_abi_version and refuses anything that predates or mismatches it.
    """
    import subprocess
    import sys

    src = tmp_path / "stale.cpp"
    # a library that predates the handshake entirely (no xs_abi_version)
    src.write_text('extern "C" int xs_scan_file() { return -1; }\n')
    so = tmp_path / "libstale.so"
    subprocess.run(
        ["g++", "-shared", "-fPIC", "-o", str(so), str(src)], check=True
    )
    assert native._try_open(so) is None

    # and one that reports the wrong generation
    src.write_text('extern "C" int xs_abi_version() { return -12345; }\n')
    subprocess.run(
        ["g++", "-shared", "-fPIC", "-o", str(so), str(src)], check=True
    )
    assert native._try_open(so) is None

    # the real build passes the handshake
    real = native._load()
    if real is not None:
        assert real.xs_abi_version() == native.ABI_VERSION


def test_parser_edge_case_parity(tmp_path):
    """Real-world file shapes: both parsers must agree record-for-record.

    NCBI assemblies arrive line-wrapped with soft-masked (lowercase)
    repeats; user files bring CRLF endings, blank lines, missing
    trailing newlines, and FASTQ quality lines starting with '@'.
    """
    cases = {
        "wrapped.fasta": ">chr1 desc\nACGTACGTAC\nGTACGTACGT\nACGT\n>chr2\nTTTT\n",
        "lowercase.fasta": ">c1\nacgtACGTnN\n",
        "crlf.fasta": ">c1 x\r\nACGT\r\nACGT\r\n>c2\r\nTTTT\r\n",
        "no_trailing_nl.fasta": ">c1\nACGTACGT",
        "blank_lines.fasta": ">c1\nACGT\n\nACGT\n\n>c2\nTTTT\n",
        "at_quality.fastq": "@r1\r\nACGT\r\n+\r\n@@@@\r\n@r2\r\nTTTT\r\n+\r\nIIII\r\n",
    }
    for fname, content in cases.items():
        path = tmp_path / fname
        path.write_text(content)
        py_records = [(r.id, dna.encode(r.seq)) for r in get_record_iterator(path)]
        parsed = native.parse_file(path)
        if parsed is None:  # no native build in this environment
            pytest.skip("native library unavailable")
        codes, offsets, ids = parsed
        assert ids == [rid for rid, _ in py_records], fname
        for i, (rid, py_codes) in enumerate(py_records):
            np.testing.assert_array_equal(
                codes[offsets[i] : offsets[i + 1]],
                py_codes,
                err_msg=f"{fname}:{rid}",
            )
