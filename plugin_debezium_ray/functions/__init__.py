"""Vectorized per-batch functions: hashing, text analysis, dedup, ANN."""
