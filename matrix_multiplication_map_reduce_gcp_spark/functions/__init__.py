"""Scalar-function helpers: exact float aggregation and engine-portable
hashing, shared by the relational, dedup and text operators."""
