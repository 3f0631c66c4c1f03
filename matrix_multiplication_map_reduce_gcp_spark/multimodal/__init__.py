"""Multimodal (image/audio/video) column plumbing: opaque binary
columns + typed metadata, decoded / feature-extracted via Arrow-batched
mapInPandas (north-star surface; BASELINE.json).

The container has no image/audio codecs, so the decode kernels are
STUBS — a deterministic fake keyed off the blob bytes (documented and
oracle-checkable), with the real-codec path raising NotImplementedError
behind an import-try. The Spark-side plumbing — binary schema,
partitioning, UDF signatures, Arrow batch shapes — is real and tested.
"""
