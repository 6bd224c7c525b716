"""Scalar/vector function library (SURVEY §2.9): normalizers, similarity
kernels, hashing, MinHash/LSH.  Everything here is deterministic and
process-independent (no ``hash()`` builtin, no runtime RNG)."""
