"""Distributed linear algebra on COO (coordinate-form) DataFrames.

This is the reference engine's entire capability surface — dense
matmul via MapReduce over Cloud Functions + GCS (reference
orchestrator/main.py, mapper/main.py, reducer/main.py) — re-expressed
Spark-first: the replication mapper + centralized shuffle + per-cell
reducer collapse into one ``join + groupBy().agg()`` plan (SURVEY.md
§2.2-5), which cuts shuffle volume from O(n^3) to O(n^2) while
preserving semantics exactly.
"""

from .coo import CooMatrix, validate_matmul_dims
from .dense import coo_to_dense_rows, dense_rows_to_coo, shred_json_matrix

__all__ = [
    "CooMatrix",
    "validate_matmul_dims",
    "coo_to_dense_rows",
    "dense_rows_to_coo",
    "shred_json_matrix",
]
