"""ctypes bindings for the native host library (native/libxspect.so).

Fast host paths: FASTA/FASTQ parsing into code arrays, canonical k-mer
extraction, multi-threaded index construction, and a reference CPU
query.  Every entry point has a pure-Python/numpy fallback, so the
framework works without the native build (``make -C native``); parity
between the two is pinned by tests.
"""

import ctypes
import os
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATHS = [
    _NATIVE_DIR / "build" / "libxspect.so",
    Path(__file__).resolve().parent / "libxspect.so",
]

# Exported C signatures may change between commits; the library reports
# its generation via xs_abi_version() and the loader refuses anything
# else (a stale .so called with the new argtypes would corrupt indices
# silently, not just crash).
ABI_VERSION = 3

_lib = None
_build_attempted = False


def _try_open(path: Path):
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    try:
        lib.xs_abi_version.restype = ctypes.c_int
        version = lib.xs_abi_version()
    except AttributeError:
        version = -1  # predates the handshake
    if version != ABI_VERSION:
        import logging

        logging.getLogger(__name__).warning(
            "ignoring stale native library %s (abi %d, need %d): "
            "rebuild with `make -C native`",
            path,
            version,
            ABI_VERSION,
        )
        return None
    _configure(lib)
    return lib


def _build():
    """One-shot best-effort `make -C native` (serialized across processes)."""
    global _build_attempted
    if _build_attempted:
        return
    _build_attempted = True
    if not (_NATIVE_DIR / "Makefile").exists():
        return
    import fcntl
    import subprocess

    build_dir = _NATIVE_DIR / "build"
    try:
        build_dir.mkdir(parents=True, exist_ok=True)
        with open(build_dir / ".build.lock", "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            if _try_open(_LIB_PATHS[0]) is not None:
                return  # a sibling process built it while we waited
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                capture_output=True,
                timeout=300,
                check=False,
            )
    except Exception:  # noqa: BLE001 - fallbacks cover every entry point
        pass


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("XSPECT_NO_NATIVE"):
        return None
    for attempt in range(2):
        for p in _LIB_PATHS:
            if p.exists():
                lib = _try_open(p)
                if lib is not None:
                    _lib = lib
                    return lib
        if attempt == 0:
            _build()
    return None


def _configure(lib):
    i64 = ctypes.c_int64
    i32 = ctypes.c_int
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

    lib.xs_scan_file.argtypes = [
        ctypes.c_char_p, i32,
        ctypes.POINTER(i64), ctypes.POINTER(i64), ctypes.POINTER(i64),
    ]
    lib.xs_scan_file.restype = i32

    lib.xs_parse_file.argtypes = [ctypes.c_char_p, i32, u8p, i64p, ctypes.c_char_p]
    lib.xs_parse_file.restype = i64

    lib.xs_insert_kmers.argtypes = [
        u32p, i64, i32, i32, i32, i32, i32, u8p, i64, i32, i32,
    ]
    lib.xs_insert_kmers.restype = None

    lib.xs_count_hits.argtypes = [
        u32p, i64, i32, i32, i32, i32, i32, u8p, i64, i32, i32, i64p,
    ]
    lib.xs_count_hits.restype = None

    lib.xs_canonical_kmers.argtypes = [u8p, i64, i32, i32, u32p, u32p, u8p]
    lib.xs_canonical_kmers.restype = i64

    lib.xs_pack_2bit.argtypes = [u8p, i64, i64, u8p, u8p, i32]
    lib.xs_pack_2bit.restype = None

    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    lib.xs_xxh3_64.argtypes = [u8p, i64, i64, ctypes.c_uint64, u64p]
    lib.xs_xxh3_64.restype = i32


def available() -> bool:
    return _load() is not None


def xxh3_64_batch(arr: np.ndarray, seed: int = 0):
    """XXH3-64 of every row of an [n, L] uint8 array (L <= 240), or None.

    Bit-identical to xspect2_tpu.core.xxh3 and the xxhash C library —
    the reference's genus Bloom k-mer hash. Falls back to None when the
    native library is unavailable (callers use the numpy path).
    """
    lib = _load()
    if lib is None:
        return None
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError("expected an [n, L] uint8 array")
    arr = np.ascontiguousarray(arr)
    out = np.empty(arr.shape[0], dtype=np.uint64)
    rc = lib.xs_xxh3_64(arr, arr.shape[0], arr.shape[1], seed & (2**64 - 1), out)
    if rc != 0:
        raise ValueError("row length out of the supported 0..240 range")
    return out


# ---------------------------------------------------------------- parsing


def parse_file(path: Path):
    """Parse a FASTA/FASTQ file natively.

    Returns ``(codes, offsets, ids)``: concatenated uint8 codes, int64
    record offsets (len = n_records + 1) and the list of record ids.
    Returns None when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    from xspect2_tpu.definitions import fastq_endings

    is_fastq = 1 if Path(path).suffix[1:] in fastq_endings else 0
    total_bases = ctypes.c_int64()
    num_records = ctypes.c_int64()
    id_bytes = ctypes.c_int64()
    rc = lib.xs_scan_file(
        str(path).encode(), is_fastq,
        ctypes.byref(total_bases), ctypes.byref(num_records), ctypes.byref(id_bytes),
    )
    if rc != 0:
        raise ValueError(f"cannot open {path}")

    codes = np.empty(total_bases.value, dtype=np.uint8)
    offsets = np.empty(num_records.value + 1, dtype=np.int64)
    ids_buf = ctypes.create_string_buffer(id_bytes.value + 1)
    nrec = lib.xs_parse_file(str(path).encode(), is_fastq, codes, offsets, ids_buf)
    if nrec < 0:
        raise ValueError(f"cannot parse {path}")
    ids = ids_buf.raw[: id_bytes.value].decode("utf-8", "replace").split("\0")[:nrec]
    return codes, offsets[: nrec + 1], ids


# ---------------------------------------------------------------- index build


def insert_kmers(index, class_idx: int, codes: np.ndarray, num_threads: int = 0):
    """Insert all canonical k-mers of ``codes`` into one class of the index.

    Falls back to the numpy path when the native library is missing.
    """
    lib = _load()
    if lib is None:
        from xspect2_tpu.core import dna

        hi, lo, valid = dna.canonical_kmers(codes, index.k)
        index.insert_kmers(class_idx, hi, lo, valid)
        return
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1
    lib.xs_insert_kmers(
        index.table,
        index.num_blocks,
        index.rows_per_block,
        index.class_words,
        index.num_hashes,
        index.fields_per_word,
        class_idx,
        np.ascontiguousarray(codes, dtype=np.uint8),
        len(codes),
        index.k,
        num_threads,
    )


def count_hits(index, codes: np.ndarray, step: int = 1) -> np.ndarray:
    """Native single-core reference query: per-class hit counts."""
    lib = _load()
    if lib is None:
        from xspect2_tpu.core import dna

        hi, lo, valid = dna.canonical_kmers(codes, index.k, step=step)
        return index.count_hits_host(hi, lo, valid)
    out = np.zeros(index.num_classes, dtype=np.int64)
    lib.xs_count_hits(
        index.table,
        index.num_blocks,
        index.rows_per_block,
        index.class_words,
        index.num_hashes,
        index.fields_per_word,
        index.num_classes,
        np.ascontiguousarray(codes, dtype=np.uint8),
        len(codes),
        index.k,
        step,
        out,
    )
    return out


def canonical_kmers(codes: np.ndarray, k: int, step: int = 1):
    """Native canonical k-mer packing (hi, lo, valid); numpy fallback."""
    lib = _load()
    if lib is None:
        from xspect2_tpu.core import dna

        return dna.canonical_kmers(codes, k, step=step)
    n = len(codes)
    if n < k:
        z = np.zeros(0, dtype=np.uint32)
        return z, z.copy(), np.zeros(0, dtype=bool)
    n_windows = (n - k) // step + 1
    hi = np.zeros(n_windows, dtype=np.uint32)
    lo = np.zeros(n_windows, dtype=np.uint32)
    valid = np.zeros(n_windows, dtype=np.uint8)
    lib.xs_canonical_kmers(
        np.ascontiguousarray(codes, dtype=np.uint8), n, k, step, hi, lo, valid
    )
    return hi, lo, valid.astype(bool)


def pack_2bit(reads: np.ndarray, num_threads: int = 0):
    """2-bit-pack an [n, len] uint8 code matrix for the device wire.

    Returns ``(packed [n, ceil(len/4)] uint8, bad_flags [n] uint8)``.
    Invalid codes (>3) pack as 0 and flag their read; callers ship a
    patch list of invalid positions next to the packed payload (see
    ops/query.py).  Numpy fallback when the native library is missing.
    """
    reads = np.ascontiguousarray(reads, dtype=np.uint8)
    n, length = reads.shape
    l4 = -(-length // 4)
    lib = _load()
    if lib is None:
        lp = l4 * 4
        codes = np.zeros((n, lp), dtype=np.uint8)
        codes[:, :length] = np.where(reads > 3, np.uint8(0), reads)
        packed = codes.reshape(n, l4, 4) << np.array(
            [0, 2, 4, 6], dtype=np.uint8
        )
        packed = np.bitwise_or.reduce(packed, axis=2)
        bad = (reads > 3).any(axis=1).astype(np.uint8)
        return packed, bad
    if num_threads <= 0:
        num_threads = min(8, os.cpu_count() or 1)
    packed = np.empty((n, l4), dtype=np.uint8)
    bad = np.empty(n, dtype=np.uint8)
    lib.xs_pack_2bit(reads, n, length, packed, bad, num_threads)
    return packed, bad
