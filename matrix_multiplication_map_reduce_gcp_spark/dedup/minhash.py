"""MinHash + banded LSH near-duplicate detection.

Pipeline: word-shingles → per-doc MinHash signature (k seeded hashes,
MIN of md5 per seed — MD5 hex strings are orderable, which is all
MinHash needs) → band the signature → docs sharing any band bucket are
candidate pairs.

Scale shape: one explode (doc → shingles), one partial-aggregatable
groupBy(doc_id) for the signature (k MIN aggregates — map-side
combine shrinks this to one row per doc per partition), one explode to
(doc, band, sig), one self-equi-join on (band, sig). The self-join's
key distribution is the bucket histogram — near-dup clusters make hot
buckets, which AQE skew-join handles; no crossJoin anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..text.analysis import shingle_rows, sql_shingle_rows

N_HASHES = 8
N_BANDS = 4  # rows-per-band = N_HASHES // N_BANDS = 2


def minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES, shingle_n: int = 3) -> DataFrame:
    """(doc_id, h0..h{k-1}) — per-seed minimum of salted md5 over the
    doc's distinct shingles."""
    sh = shingle_rows(docs, n=shingle_n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"s{s}|"), F.col("shingle")))).alias(f"h{s}")
        for s in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_bands(sig: DataFrame, n_hashes: int = N_HASHES, n_bands: int = N_BANDS) -> DataFrame:
    """Signature → (doc_id, band, sig) rows; band sig = md5 of the
    concatenated member hashes."""
    rows_per_band = n_hashes // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat(*[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)])
                ).alias("sig"),
            )
            for b in range(n_bands)
        ]
    )
    return sig.select("doc_id", F.explode(bands).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def candidate_pairs(docs: DataFrame, n_hashes: int = N_HASHES, n_bands: int = N_BANDS) -> DataFrame:
    """Distinct (doc_a, doc_b) candidate near-dup pairs (a < b)."""
    b = lsh_bands(minhash_signatures(docs, n_hashes), n_hashes, n_bands)
    left = b.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    right = b.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    return (
        left.join(right, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


# ---- DuckDB SQL mirrors ---------------------------------------------------

def sql_minhash_signatures(n_hashes: int = N_HASHES, shingle_n: int = 3) -> str:
    mins = ", ".join(
        f"MIN(md5(CONCAT('s{s}|', shingle))) AS h{s}" for s in range(n_hashes)
    )
    return f"""
    SELECT doc_id, {mins}
    FROM ({sql_shingle_rows(shingle_n)})
    GROUP BY doc_id
    """


def sql_candidate_pairs(n_hashes: int = N_HASHES, n_bands: int = N_BANDS) -> str:
    rows_per_band = n_hashes // n_bands
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5(CONCAT({', '.join(f'h{b * rows_per_band + r}' for r in range(rows_per_band))})) AS sig FROM sig"
        for b in range(n_bands)
    )
    return f"""
    WITH sig AS ({sql_minhash_signatures(n_hashes)}),
    bands AS ({band_selects})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
                             AND a.doc_id < b.doc_id
    """
