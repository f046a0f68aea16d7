"""XspecT2-TPU: a TPU-native taxonomic classification framework.

A from-scratch re-design of the capabilities of XspecT2
(reference: /root/reference, Oemercetin06/XspecT2) for TPU hardware:

- k-mer extraction, canonicalization and hashing are vectorized JAX/Pallas
  ops over packed 2-bit sequence tensors,
- the probabilistic filter indices (COBS-style bit-sliced signature
  indices / Bloom filters) are re-laid-out as *blocked* dense bit-matrix
  tensors in HBM so a membership query is one contiguous 512-byte gather
  followed by in-register AND/popcount,
- the SVM species head runs as a small XLA kernel over per-filter score
  vectors,
- multi-chip scale-out uses `jax.sharding.Mesh` + collectives instead of
  process-level fan-out.
"""

__version__ = "0.1.0"
