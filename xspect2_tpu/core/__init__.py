"""Core sequence/index primitives: 2-bit packing, hashing, blocked bit-sliced index."""
