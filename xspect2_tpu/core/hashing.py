"""k-mer hashing for the blocked bit-sliced index.

The same uint32 mixing pipeline is implemented twice — once over numpy
arrays (index construction on host) and once over jax arrays (query path
on TPU).  Both wrap modulo 2**32, so outputs are bit-identical; a
differential test pins this.

Design: from the packed canonical k-mer (hi, lo) we derive
  - a *block id*  in [0, num_blocks)   — selects one contiguous block
    (typically 512 B) of the bit matrix, so all ``num_hashes`` probes of
    a k-mer live in a single DMA-friendly region, and
  - ``num_hashes`` *row ids* in [0, rows_per_block) via
    Kirsch-Mitzenmacher double hashing (row_i = base + i*stride, stride
    odd, rows_per_block a power of two).

This replaces COBS's per-hash scattered XXH32 probes (reference behavior:
score = number of query k-mers whose hash positions are all set in a
document's bit column, reference: src/xspect/models/probabilistic_filter_model.py:196-235)
with a layout where one k-mer costs one contiguous memory transaction.
"""

import numpy as np

_C1 = 0x9E3779B1
_C2 = 0x85EBCA77
_C3 = 0xC2B2AE3D
_C4 = 0x27D4EB2F
_C5 = 0x165667B1
_M1 = 0x85EBCA6B
_M2 = 0xC2B2AE35


def _u32(xp, v):
    return xp.uint32(v)


def _mix32(x, xp):
    """murmur3 fmix32 finalizer (public-domain constant mixing)."""
    x = x ^ (x >> _u32(xp, 16))
    x = x * _u32(xp, _M1)
    x = x ^ (x >> _u32(xp, 13))
    x = x * _u32(xp, _M2)
    x = x ^ (x >> _u32(xp, 16))
    return x


def _rotl(x, r, xp):
    return (x << _u32(xp, r)) | (x >> _u32(xp, 32 - r))


def kmer_hash_words(hi, lo, xp=np):
    """Mix packed k-mer words into three independent uint32 hash words.

    Returns ``(a, b, c)``:
      a — block selector, b — row base, c — odd row stride.
    ``xp`` is ``numpy`` or ``jax.numpy``; inputs must be uint32 arrays.
    """
    u = _mix32(lo ^ _u32(xp, _C1), xp)
    v = _mix32(hi ^ _u32(xp, _C2), xp)
    a = _mix32(u ^ _rotl(v, 16, xp) ^ _u32(xp, _C3), xp)
    b = _mix32(v ^ _rotl(u, 13, xp) ^ _u32(xp, _C4), xp)
    c = _mix32((u + v) ^ _u32(xp, _C5), xp) | _u32(xp, 1)
    return a, b, c


def block_and_rows(hi, lo, num_blocks: int, rows_per_block: int, num_hashes: int, xp=np):
    """Block id and row ids for each packed k-mer.

    Returns ``(block, rows)`` with ``block`` shape ``[n]`` (uint32 in
    [0, num_blocks)) and ``rows`` shape ``[n, num_hashes]`` (uint32 in
    [0, rows_per_block)).  ``rows_per_block`` must be a power of two.
    """
    if rows_per_block & (rows_per_block - 1):
        raise ValueError("rows_per_block must be a power of two")
    a, b, c = kmer_hash_words(hi, lo, xp=xp)
    block = a % _u32(xp, num_blocks)
    mask = _u32(xp, rows_per_block - 1)
    i = xp.arange(num_hashes, dtype=xp.uint32)
    rows = (b[..., None] + i * c[..., None]) & mask
    return block, rows


def block_words_fieldbase(
    hi,
    lo,
    num_blocks: int,
    rows_per_block: int,
    num_hashes: int,
    fields_per_word: int = 1,
    xp=np,
):
    """Probe geometry for a field-packed index.

    With ``fields_per_word`` = P > 1, each uint32 table word stores P
    signature rows of ``32 // P`` class bits each.  Probe ``i`` of a
    k-mer lives in word ``(b + i*c) & (rows_per_block - 1)`` at field
    ``(g + i) & (P - 1)``; the hash-derived base field ``g`` makes every
    field fill uniformly even when ``num_hashes < P``.  Probes sharing a
    field (``i ≡ j (mod P)``) have distinct words because ``(i-j)*c`` is
    never 0 mod ``rows_per_block`` (c odd, |i-j| < rows_per_block's
    2-adic order bound).

    Returns ``(block [n], words [n, num_hashes], g [n])`` (all uint32);
    with P == 1, ``words`` equals :func:`block_and_rows`' rows and ``g``
    is all-zero.
    """
    if rows_per_block & (rows_per_block - 1):
        raise ValueError("rows_per_block must be a power of two")
    if fields_per_word & (fields_per_word - 1):
        raise ValueError("fields_per_word must be a power of two")
    a, b, c = kmer_hash_words(hi, lo, xp=xp)
    block = a % _u32(xp, num_blocks)
    mask = _u32(xp, rows_per_block - 1)
    i = xp.arange(num_hashes, dtype=xp.uint32)
    words = (b[..., None] + i * c[..., None]) & mask
    g = (b >> _u32(xp, 24)) & _u32(xp, fields_per_word - 1)
    return block, words, g
