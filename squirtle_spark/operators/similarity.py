"""Similarity search over embedding columns (brute-force + LSH-bucketed)."""
