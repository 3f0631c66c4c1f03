"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference MapReduce matrix-multiplication engine
(benseddikismail/matrix-multiplication-map-reduce-gcp), generalized to a
full relational + LLM-data-pipeline operator surface designed for
100 TB scale.

Layout
------
- ``session``    : tuned SparkSession bootstrap
- ``catalog``    : table loading / temp-view registration for the fixtures
- ``matrix``     : distributed linear algebra on COO DataFrames
                   (the reference's whole capability, re-expressed as
                   join+agg instead of HTTP MapReduce; SURVEY.md §2.1)
- ``operators``  : relational operator surface (scan/filter/join/agg/
                   window/setops/topk) — SURVEY.md §2.3
- ``functions``  : scalar helpers incl. engine-portable hashing and
                   exact (decimal-backed) float aggregation
- ``dedup``      : exact + MinHash-LSH + SimHash + n-gram-Jaccard +
                   embedding near-duplicate detection
- ``similarity`` : brute-force and LSH-bucketed cosine top-k search
- ``text``       : language id, quality scoring, token counting,
                   fingerprinting over document tables
- ``multimodal`` : binary-column plumbing with stubbed decoders
- ``streaming``  : Structured Streaming windows / watermark / dedup
- ``registry``   : the queries() / oracle_sql() inventory consumed by
                   ``__spark_entry__.py``
"""

__version__ = "0.1.0"
