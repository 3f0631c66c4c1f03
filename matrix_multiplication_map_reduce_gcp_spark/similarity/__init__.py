"""Approximate-nearest-neighbor search over embedding columns:
brute-force cosine top-k (the correctness baseline) and random-
hyperplane LSH bucketing (the scale path) — north-star surface
(BASELINE.json)."""
