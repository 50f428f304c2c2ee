"""Deduplication operators (exact, MinHash-LSH, SimHash)."""
