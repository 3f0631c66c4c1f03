"""SimHash document fingerprints (60-bit).

Per token: a portable 60-bit hash; per bit position: +1 if set else
-1, summed over the doc's tokens; the fingerprint sets each bit whose
weighted sum is positive. Near-dups then differ in few bits (Hamming).

Scale shape: explode tokens → one groupBy(doc_id) with 30 packed SUM
aggregates (2 bit-lanes per bigint; partial-aggregatable — map-side
combine collapses each partition to one row per doc before the
shuffle). Everything is integer arithmetic: exactly reproducible
anywhere.

Width matters for the PAIRING step, not the fingerprint quality:
pigeonhole banding over max_dist+1 = 4 bands gives band keys of
width/4 bits, and candidate volume scales as n² / 2^band_bits. At
32 bits (8-bit bands) that is n²/256 — still quadratic in practice
(measured 20x wall at a 10x corpus). 60 bits (15-bit bands, the
widest sign-safe bigint multiple of 4) cuts candidates 128x and is
the same design point as the 64-bit fingerprints in Manku et
al., "Detecting Near-Duplicates for Web Crawling", WWW'07.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.portable_hash import hash60, sql_hash60
from ..text.analysis import sql_token_rows

N_BITS = 60

# Lane packing for the per-bit aggregation (r5 VERDICT #8): instead of
# one SUM column per bit through the groupBy, pack N_LANES bit-
# positions into each bigint accumulator (N_BITS/N_LANES SUM columns —
# N_LANES× less agg state per doc per partition in the map-side
# combine). The summed quantity per lane is the ONES-COUNT of that bit
# (nonnegative — lanes can never borrow from each other), and the
# classic +1/-1 sign test becomes 2*ones > n.
#
# Lane geometry (r7): 2 lanes at stride n_groups (= 30), i.e. the
# accumulator stride EQUALS the hash's own lane spacing. That makes
# group g's packed per-token input a SINGLE shift-and on the raw
# 60-bit hash — (hv >> g) & (1<<30 | 1) picks bit g (lane 0) and bit
# g+30 (lane 1) already at their accumulation positions — replacing
# the r6 form's per-lane slice/shift/and/cast/mul/add chain (~9 JVM
# ops per group per token → 2). The r6 claim that the floor was
# "md5 + explode" was WRONG: an r7 stage decomposition measured
# scan 0.08 / +explode 0.15 / +md5 0.41 / +1-SUM groupBy 0.48 s vs
# 3.3 s full at sf0.1 — the packed-agg expression work WAS the wall.
# Interleaved same-session A/B of this form: 2.20 s → 1.55 s median
# at sf0.1, bit-identical fingerprints (test_dedup_similarity pins
# equality vs the per-bit DuckDB oracle).
#
# Overflow contract: lane 0's count can carry into lane 1's LSB once
# a document exceeds 2^30 - 1 tokens (~ a 6 GB document; the r6
# stride-32 form allowed 2^31 - 1 — both unreachable for any real
# document, and 4×16's 2^15 cap, which a long web page CAN hit, stays
# rejected for exactly the reason r6 documented). Docs past the cap
# raise loudly (assert_true) instead of fingerprinting wrong.
N_LANES = 2
TOKEN_CAP = (1 << (N_BITS // N_LANES)) - 1


def simhash(
    docs: DataFrame, n_bits: int = N_BITS, token_cap: int = TOKEN_CAP
) -> DataFrame:
    """(doc_id, simhash) — 60-bit fingerprint as a bigint.

    ``token_cap`` exists so tests can exercise the overflow guard
    without materializing a 2^30-token document; production callers
    keep the default."""
    assert n_bits % N_LANES == 0, (
        f"simhash lane packing requires n_bits % {N_LANES} == 0; "
        f"got {n_bits} (bits past the last full group would silently "
        f"alias under shift-mod-64)"
    )
    n_groups = n_bits // N_LANES  # packed accumulators, also the stride
    assert token_cap <= (1 << n_groups) - 1, (
        f"token_cap {token_cap} would let lane 0 carry into lane 1 "
        f"(stride {n_groups})"
    )
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    h = tok.select("doc_id", hash60(F.col("tok")).alias("hv"))
    # One shift+and per group per token: bit g and bit g+n_groups land
    # at packed positions 0 and n_groups directly.
    mask = (1 << n_groups) | 1
    packed = [
        F.sum(F.shiftright("hv", g).bitwiseAND(F.lit(mask))).alias(f"p{g}")
        for g in range(n_groups)
    ]
    sums = h.groupBy("doc_id").agg(F.count("*").alias("n"), *packed)
    # Overflow guard as a once-per-row FILTER: an inline
    # when/raise_error wrapped around n would be re-inlined into all
    # 60 fingerprint terms by projection collapse (measured +0.65 s at
    # sf0.1); assert_true in a filter evaluates once and raises on the
    # first over-cap document.
    guarded = sums.filter(
        F.assert_true(
            F.col("n") <= token_cap,
            F.lit(
                f"simhash: document exceeds {token_cap} tokens — packed-lane "
                "accumulators would overflow; chunk the document first"
            ),
        ).isNull()
    )
    fingerprint = None
    for b in range(n_bits):
        g, lane = b % n_groups, b // n_groups
        ones = F.shiftright(f"p{g}", lane * n_groups).bitwiseAND(
            F.lit((1 << n_groups) - 1)
        )
        term = F.when(ones * 2 > F.col("n"), F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return guarded.select("doc_id", fingerprint.alias("simhash"))


def hamming_pairs(fp: DataFrame, max_dist: int = 3, block_bits: int = 0) -> DataFrame:
    """Near-dup pairs by Hamming distance ≤ max_dist.

    Default (block_bits=0) is EXACT: all pairs compared, the contract
    in the name holds. block_bits>0 opts into approximate blocking by
    the top bits — it misses pairs whose differing bits fall inside
    the block prefix (systematic false negatives), so it is a recall
    trade-off for scale, not a free optimization; the scalable exact
    formulation is multi-band blocking (pigeonhole over max_dist+1
    bands), a candidate for a later round. bit_count(xor) is JVM-side.
    """
    a = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    b = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    block_a = F.shiftright("sh_a", N_BITS - block_bits)
    block_b = F.shiftright("sh_b", N_BITS - block_bits)
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, (block_a == block_b) & (F.col("doc_a") < F.col("doc_b")))
        .filter(dist <= max_dist)
        .select("doc_a", "doc_b", dist.alias("hamming"))
    )


def hamming_pairs_banded(fp: DataFrame, max_dist: int = 3) -> DataFrame:
    """EXACT Hamming pairs at scale via pigeonhole banding: split the
    fingerprint into max_dist+1 bands — two fingerprints within
    max_dist bits MUST agree exactly on at least one band (at most
    max_dist bits differ, so they can't touch all bands). One
    equi-join per band, union, dedup, verify the true distance.
    Equivalent results to the all-pairs path, candidate volume
    proportional to real near-dups instead of n²."""
    n_bands = max_dist + 1
    band_bits = N_BITS // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("simhash", b * band_bits)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    banded = fp.select("doc_id", "simhash", F.explode(bands).alias("bk")).select(
        "doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "band", "key"
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "band", "key"
    )
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", dist.alias("hamming"))
        .filter(F.col("hamming") <= max_dist)
        .distinct()
    )


# ---- DuckDB SQL mirror ----------------------------------------------------

def sql_hamming_pairs(max_dist: int = 3) -> str:
    """All-pairs oracle for the banded Spark path: DuckDB's n² join is
    fine at oracle scale, and pigeonhole banding is provably equal to
    it (tests/test_dedup_similarity.py::test_banded_hamming_equals_exact)."""
    return f"""
    WITH fp AS ({sql_simhash()})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_dist}
    """


def sql_simhash(n_bits: int = N_BITS) -> str:
    bit_sums = ", ".join(
        f"SUM(CASE WHEN (hv & {1 << b}) != 0 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(n_bits)
    )
    fingerprint = " + ".join(
        f"CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(n_bits)
    )
    return f"""
    WITH tok AS ({sql_token_rows()}),
    h AS (SELECT doc_id, {sql_hash60('tok')} AS hv FROM tok),
    sums AS (SELECT doc_id, {bit_sums} FROM h GROUP BY doc_id)
    SELECT doc_id, {fingerprint} AS simhash FROM sums
    """
