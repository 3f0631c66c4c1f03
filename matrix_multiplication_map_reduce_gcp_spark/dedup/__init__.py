"""Deduplication operators for LLM training-data pipelines: exact
(hash group-by), MinHash+LSH, SimHash, n-gram Jaccard, and embedding-
cosine near-duplicate detection (north-star surface; BASELINE.json).

All hash-dependent operators use md5-based portable hashing
(functions/portable_hash.py) so their outputs are oracle-checkable
against DuckDB — and, more importantly, stable across engine versions
and cluster re-runs.
"""
