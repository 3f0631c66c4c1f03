"""MinHash + banded LSH near-duplicate detection.

Pipeline: word-shingles → per-doc MinHash signature (k-member
universal hash family) → band the signature → docs sharing any band
bucket are candidate pairs.

Hash family (engine-portable AND cheap): ONE md5 per shingle gives a
base hash h ∈ [0, p) (first 8 hex chars mod p, p = 2^31-1); member i
is the Carter-Wegman affine transform (a_i·h + b_i) mod p — pure
int64 arithmetic both engines compute identically, so one digest per
shingle instead of k (the k-md5 variant was ~40% of the whole query's
runtime at sf0.1).

Scale shape: one explode (doc → shingles), one partial-aggregatable
groupBy(doc_id) with k MIN aggregates (map-side combine shrinks this
to one row per doc per partition), one explode to (doc, band, sig),
one self-equi-join on (band, sig). The self-join's key distribution
is the bucket histogram — near-dup clusters make hot buckets, which
AQE skew-join handles; no crossJoin anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.portable_hash import hash32_unsalted, sql_hash32_unsalted
from ..text.analysis import shingle_rows, sql_shingle_rows

N_HASHES = 8
N_BANDS = 4  # rows-per-band = N_HASHES // N_BANDS = 2
MERSENNE_P = (1 << 31) - 1

# Fixed odd multipliers / offsets for the affine family (shared
# verbatim by the SQL mirrors — data constants, not engine hashes).
_A = (1103515245, 0x9E3779B1, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F, 0x165667B1, 0xD3A2646C, 0xFD7046C5)
_B = (12345, 0x811C9DC5, 0x01000193, 0x6C62272E, 0x2545F491, 0x9E3779B9, 0x7F4A7C15, 0x94D049BB)


def _base_hash_col():
    return hash32_unsalted(F.col("shingle")) % MERSENNE_P


def _sql_base_hash(expr: str = "shingle") -> str:
    return f"({sql_hash32_unsalted(expr)} % {MERSENNE_P})"


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = N_HASHES,
    shingle_n: int = 3,
    group_col: str = "doc_id",
    distinct: bool = True,
) -> DataFrame:
    """(group_col, h0..h{k-1}) — per-member minimum over the group's
    shingles. group_col="doc_id" is per-document LSH; coarser keys
    (e.g. "source") sketch whole sub-corpora with the SAME family —
    and may pass distinct=False, since MIN over duplicate shingles
    equals MIN over the set (skipping the distinct saves a shuffle)."""
    keep = () if group_col == "doc_id" else (group_col,)
    sh = shingle_rows(docs, n=shingle_n, distinct=distinct, keep_cols=keep)
    sh = sh.withColumn("bh", _base_hash_col())
    aggs = [
        F.min((F.lit(_A[s]) * F.col("bh") + F.lit(_B[s])) % MERSENNE_P).alias(f"h{s}")
        for s in range(n_hashes)
    ]
    return sh.groupBy(group_col).agg(*aggs)


def lsh_bands(sig: DataFrame, n_hashes: int = N_HASHES, n_bands: int = N_BANDS) -> DataFrame:
    """Signature → (doc_id, band, sig) rows; band sig = md5 of the
    '_'-joined member hashes."""
    rows_per_band = n_hashes // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "_",
                        *[
                            F.col(f"h{b * rows_per_band + r}").cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
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

def sql_minhash_signatures(
    n_hashes: int = N_HASHES,
    shingle_n: int = 3,
    group_col: str = "doc_id",
    distinct: bool = True,
) -> str:
    keep = () if group_col == "doc_id" else (group_col,)
    mins = ", ".join(
        f"MIN(({_A[s]} * bh + {_B[s]}) % {MERSENNE_P}) AS h{s}"
        for s in range(n_hashes)
    )
    return f"""
    SELECT {group_col}, {mins}
    FROM (SELECT {group_col}, {_sql_base_hash()} AS bh
          FROM ({sql_shingle_rows(shingle_n, distinct, keep)}))
    GROUP BY {group_col}
    """


def sql_band_selects(n_hashes: int = N_HASHES, n_bands: int = N_BANDS) -> str:
    """UNION ALL producing (doc_id, band, sig) from a CTE named
    ``sig`` — the banding step shared by the self-join and the
    incremental batch-vs-index queries."""
    rows_per_band = n_hashes // n_bands
    return " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5(CONCAT({parts})) AS sig FROM sig".format(
            b=b,
            parts=", '_', ".join(
                f"CAST(h{b * rows_per_band + r} AS VARCHAR)"
                for r in range(rows_per_band)
            ),
        )
        for b in range(n_bands)
    )


def sql_candidate_pairs(n_hashes: int = N_HASHES, n_bands: int = N_BANDS) -> str:
    return f"""
    WITH sig AS ({sql_minhash_signatures(n_hashes)}),
    bands AS ({sql_band_selects(n_hashes, n_bands)})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
                             AND a.doc_id < b.doc_id
    """
