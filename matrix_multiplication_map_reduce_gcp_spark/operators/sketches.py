"""Deterministic frequency/membership sketches: count-min heavy
hitters and Bloom-filter join pruning.

Unlike HLL/GK (operators/approx.py), these sketches are built from the
md5-based portable hash family (functions/portable_hash.py), so the
sketch CONTENTS are bit-identical across engines — the oracle
recomputes the whole sketch in SQL and every estimated count / bitmap
word is hash-checked, not just a tolerance boolean.

Scale shapes:
- CMS: one explode by sketch depth (D rows per input row) feeding a
  groupBy over at most D*W cells — the partial agg collapses map-side,
  so the shuffle is bounded by the sketch size, not the data. This is
  THE heavy-hitter shape at 100 TB: the exact groupBy on a hot key
  space shuffles every distinct key; the CMS shuffles 2048 cells.
- Bloom: the build side reduces to a 128-word bitmap (one bit_or
  aggregate), broadcast to the probe side — the distributed analogue
  of the runtime bloom pruning AQE injects for shuffle joins, with
  false-positive accounting made explicit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

# Count-min sketch geometry.
CMS_DEPTH = 4
CMS_WIDTH = 512
TOP_N = 20

# Bloom filter geometry: 4096 bits as 128 x 32-bit words.
BLOOM_BITS = 4096
WORD_BITS = 32
BLOOM_HASHES = 3
BLOOM_BAL = 9000  # build side: customers with c_acctbal > this


def _hash32_seed_col(key: Column, seed: Column) -> Column:
    """hash32 with the seed as a COLUMN (portable_hash.hash32 inlines a
    literal seed) — md5('s<seed>|<key>') first-8-hex as uint32."""
    salted = F.concat(
        F.lit("s"), seed.cast("string"), F.lit("|"), key.cast("string")
    )
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("bigint")


def _sql_hash32_seed(key: str, seed: str) -> str:
    return (
        "CAST(CONCAT('0x', substr(md5(CONCAT('s', CAST(" + seed + " AS VARCHAR), "
        "'|', CAST(" + key + " AS VARCHAR))), 1, 8)) AS BIGINT)"
    )


def _seeds(n: int) -> Column:
    return F.explode(F.array(*[F.lit(s) for s in range(n)])).alias("seed")


def cms_cells(df: DataFrame, key: str) -> DataFrame:
    """(seed, cell, c) — the D x W count-min table for ``df[key]``."""
    hashed = df.select(F.col(key).alias("k")).select(
        "k", _seeds(CMS_DEPTH)
    )
    cell = F.pmod(_hash32_seed_col(F.col("k"), F.col("seed")), CMS_WIDTH)
    return (
        hashed.select("seed", cell.alias("cell"))
        .groupBy("seed", "cell")
        .agg(F.count("*").alias("c"))
    )


@query(
    "cms_heavy_hitters",
    oracle=f"""
    WITH seeds AS (SELECT * FROM (VALUES (0), (1), (2), (3)) s(seed)),
    cells AS (
      SELECT s.seed,
             {_sql_hash32_seed('l.l_partkey', 's.seed')} % {CMS_WIDTH} AS cell,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem l, seeds s
      GROUP BY 1, 2),
    exact AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM lineitem GROUP BY 1),
    est AS (
      SELECT e.l_partkey, e.exact_cnt, MIN(c.c) AS cms_est
      FROM exact e CROSS JOIN seeds s
      JOIN cells c
        ON c.seed = s.seed
       AND c.cell = {_sql_hash32_seed('e.l_partkey', 's.seed')} % {CMS_WIDTH}
      GROUP BY 1, 2),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, l_partkey) AS rn
      FROM est)
    SELECT l_partkey, exact_cnt, cms_est, cms_est - exact_cnt AS overcount
    FROM ranked WHERE rn <= {TOP_N}
    """,
)
def cms_heavy_hitters(spark, sf_dir):
    """Top-{TOP_N} heavy hitters on lineitem.l_partkey with their
    count-min estimates. The 4x512 sketch is recomputed identically by
    the oracle (portable md5 hash family), so the estimated counts
    themselves are hash-checked; overcount >= 0 always (CMS never
    undercounts). The exact ranking here is the sf0.01 ground truth the
    sketch is judged against — at 100 TB only the sketch-side
    pipeline (explode -> 2048-cell partial agg) survives, which is the
    point."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = cms_cells(li, "l_partkey")
    exact = li.groupBy("l_partkey").agg(F.count("*").alias("exact_cnt"))
    probe = exact.select("l_partkey", "exact_cnt", _seeds(CMS_DEPTH))
    probe = probe.select(
        "l_partkey",
        "exact_cnt",
        "seed",
        F.pmod(
            _hash32_seed_col(F.col("l_partkey"), F.col("seed")), CMS_WIDTH
        ).alias("cell"),
    )
    est = (
        probe.join(F.broadcast(cells), ["seed", "cell"])
        .groupBy("l_partkey", "exact_cnt")
        .agg(F.min("c").alias("cms_est"))
    )
    top = est.orderBy(F.desc("exact_cnt"), "l_partkey").limit(TOP_N)
    return top.select(
        "l_partkey",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
    )


def bloom_bitmap(keys: DataFrame, key: str) -> DataFrame:
    """(word, bits) — {BLOOM_BITS}-bit Bloom bitmap of ``keys[key]``
    as {BLOOM_BITS // WORD_BITS} x 32-bit words (bit_or aggregate)."""
    pos = F.pmod(
        _hash32_seed_col(F.col("k"), F.col("seed")), BLOOM_BITS
    )
    positions = keys.select(F.col(key).alias("k")).select(
        "k", _seeds(BLOOM_HASHES)
    ).select((pos / WORD_BITS).cast("bigint").alias("word"),
             F.pmod(pos, WORD_BITS).alias("bit"))
    return positions.groupBy("word").agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)))")
        .alias("bits")
    )


@query(
    "bloom_join_prune",
    oracle=f"""
    WITH seeds AS (SELECT * FROM (VALUES (0), (1), (2)) s(seed)),
    build AS (SELECT c_custkey FROM customer WHERE c_acctbal > {BLOOM_BAL}),
    pos AS (
      SELECT {_sql_hash32_seed('b.c_custkey', 's.seed')} % {BLOOM_BITS} AS p
      FROM build b, seeds s),
    bitmap AS (
      SELECT p // {WORD_BITS} AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(p % {WORD_BITS} AS INT)) AS bits
      FROM pos GROUP BY 1),
    probe AS (
      SELECT o.o_orderkey, o.o_orderstatus, o.o_custkey, s.seed,
             {_sql_hash32_seed('o.o_custkey', 's.seed')} % {BLOOM_BITS} AS p
      FROM orders o, seeds s),
    hit AS (
      SELECT p.o_orderkey, p.o_orderstatus, p.o_custkey,
             COUNT(*) FILTER (WHERE (m.bits & (CAST(1 AS BIGINT)
                               << CAST(p.p % {WORD_BITS} AS INT))) != 0)
               AS n_set
      FROM probe p LEFT JOIN bitmap m ON m.word = p.p // {WORD_BITS}
      GROUP BY 1, 2, 3),
    verdict AS (
      SELECT o_orderkey, o_orderstatus,
             n_set = {BLOOM_HASHES} AS bloom_pass,
             o_custkey IN (SELECT c_custkey FROM build) AS exact_match
      FROM hit)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_probe,
           CAST(COUNT(*) FILTER (WHERE bloom_pass) AS BIGINT) AS n_bloom_pass,
           CAST(COUNT(*) FILTER (WHERE exact_match) AS BIGINT) AS n_exact,
           CAST(COUNT(*) FILTER (WHERE bloom_pass AND NOT exact_match)
                AS BIGINT) AS n_false_positive
    FROM verdict GROUP BY 1
    """,
)
def bloom_join_prune(spark, sf_dir):
    """Bloom-filter semi-join pruning with explicit false-positive
    accounting: build a {BLOOM_BITS}-bit bitmap over high-balance
    customers, probe every order through it, and report per-status how
    many rows the bloom pass keeps vs the exact semi join. The bitmap
    is a broadcast 128-row table; the probe is map-only against it —
    the shape AQE's runtime bloom pruning applies to shuffle joins,
    here with the filter itself hash-checked word-for-word (md5 hash
    family, so both engines build the identical bitmap). No false
    negatives are possible; false positives are counted, not hidden."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    build = c.filter(F.col("c_acctbal") > BLOOM_BAL).select("c_custkey")
    bitmap = bloom_bitmap(build, "c_custkey")

    pos = F.pmod(_hash32_seed_col(F.col("o_custkey"), F.col("seed")), BLOOM_BITS)
    probe = o.select("o_orderkey", "o_orderstatus", "o_custkey").select(
        "o_orderkey", "o_orderstatus", "o_custkey", _seeds(BLOOM_HASHES)
    ).select(
        "o_orderkey", "o_orderstatus", "o_custkey",
        (pos / WORD_BITS).cast("bigint").alias("word"),
        F.pmod(pos, WORD_BITS).alias("bit"),
    )
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
    hit = (
        probe.join(F.broadcast(bitmap), "word", "left")
        .groupBy("o_orderkey", "o_orderstatus", "o_custkey")
        .agg(
            F.sum(
                F.when(
                    F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(mask) != 0, 1
                ).otherwise(0)
            ).alias("n_set")
        )
    )
    exact = build.withColumnRenamed("c_custkey", "o_custkey").withColumn(
        "exact_match", F.lit(True)
    )
    verdict = hit.join(F.broadcast(exact), "o_custkey", "left").select(
        "o_orderstatus",
        (F.col("n_set") == BLOOM_HASHES).alias("bloom_pass"),
        F.coalesce(F.col("exact_match"), F.lit(False)).alias("exact_match"),
    )
    return verdict.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_probe"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_bloom_pass"),
        F.sum(F.when(F.col("exact_match"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_exact"),
        F.sum(
            F.when(F.col("bloom_pass") & ~F.col("exact_match"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_false_positive"),
    )
