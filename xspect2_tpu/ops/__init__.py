"""Device (JAX/XLA/Pallas) compute ops for the blocked bit-sliced index."""
